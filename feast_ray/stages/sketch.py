"""Approximate distinct counting (HyperLogLog) per group — the A8 sketch
family's cardinality member (MinHash/SimHash/fingerprints live in
``stages.dedup`` / ``stages.text``).

Shape: per-batch PARTIAL sketches (one fixed-size register blob per group
per batch, vectorized numpy), then ONE hash shuffle merges blobs with an
elementwise max and applies the HLL estimator.  Bytes through the exchange
are ``n_groups_per_batch x 2^p`` — independent of row count, the whole
point of a sketch at 100 TB.  Exact distinct (``A7``) stays the default
for driver queries (hash-exact vs SQL); this operator is for cardinalities
too large to co-locate.

Estimator: Flajolet et al. HLL with the standard small-range linear
counting correction; relative error ~1.04/sqrt(2^p).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from feast_ray.grouped import grouped_map, hash_columns

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hll_partial(tbl: pa.Table, keys: list, col: str, p: int) -> pa.Table:
    """One register blob per key-group present in this batch."""
    m = 1 << p
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {**{k: tbl[k] for k in keys}, "__regs": pa.array([], pa.binary())}
        )
    hv = hash_columns(tbl, [col])
    gh = hash_columns(tbl, keys)
    uniq, inv = np.unique(gh, return_inverse=True)
    reg_idx = (hv & np.uint64(m - 1)).astype(np.int64)
    w = hv >> np.uint64(p)
    # rank = position of the leftmost 1-bit in the remaining 64-p bits + 1
    nbits = 64 - p
    rho = np.zeros(n, dtype=np.int64)
    nz = w != 0
    # floor(log2(w)) via float64 exponent is exact for w < 2^53; 64-p <= 52
    # requires p >= 12 — enforced by the public API
    rho[nz] = nbits - np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    rho[~nz] = nbits + 1
    flat = np.zeros((len(uniq), m), dtype=np.uint8)
    np.maximum.at(flat, (inv, reg_idx), rho.astype(np.uint8))
    first_rows = np.zeros(len(uniq), dtype=np.int64)
    first_rows[inv[::-1]] = np.arange(n - 1, -1, -1)
    cols = {k: tbl[k].take(pa.array(first_rows)) for k in keys}
    cols["__regs"] = pa.array([flat[i].tobytes() for i in range(len(uniq))], pa.binary())
    return pa.table(cols)


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.shape[-1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def approx_distinct(
    ds,
    keys: str | Sequence[str],
    col: str,
    *,
    p: int = 12,
    num_buckets: Optional[int] = None,
):
    """Approximate COUNT(DISTINCT col) per key group.

    Returns (keys..., approx_distinct: float64).  ``p`` in [12, 18]:
    2^p-byte registers per group, relative error ~1.04/sqrt(2^p) (~1.6% at
    p=12).  Exactness is pinned by the error-bound tests, not a SQL hash
    compare — use :mod:`exact distinct <feast_ray.pipelines.queries>` (A7)
    when the cardinality fits co-location.
    """
    if not (12 <= p <= 18):
        raise ValueError("p must be in [12, 18] (rank arithmetic bound)")
    keys = [keys] if isinstance(keys, str) else list(keys)

    parts = ds.map_batches(
        lambda t: _hll_partial(t, keys, col, p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    m = 1 << p

    def merge_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_groups = len(starts) - 1
        if t.num_rows == 0:
            return pa.table(
                {**{k: t[k] for k in keys},
                 "approx_distinct": pa.array([], pa.float64())}
            )
        blobs = t["__regs"].combine_chunks()
        ests = np.empty(n_groups, dtype=np.float64)
        firsts = pa.array(starts[:-1])
        for g in range(n_groups):
            lo, hi = int(starts[g]), int(starts[g + 1])
            regs = np.frombuffer(
                b"".join(blobs[i].as_py() for i in range(lo, hi)), dtype=np.uint8
            ).reshape(hi - lo, m)
            ests[g] = _hll_estimate(regs.max(axis=0))
        cols = {k: t[k].combine_chunks().take(firsts) for k in keys}
        cols["approx_distinct"] = pa.array(ests)
        return pa.table(cols)

    return grouped_map(parts, keys, merge_kernel, num_buckets=num_buckets)
