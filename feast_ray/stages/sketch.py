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


def heavy_hitters(
    ds,
    col: str,
    threshold: int,
    *,
    summary_k: int = 4096,
    num_buckets: Optional[int] = None,
):
    """EXACT frequent-items: every value of ``col`` whose global count is
    >= ``threshold``, with its exact count — without ever shuffling the
    long tail.  The two-pass Misra-Gries/SpaceSaving shape:

    Pass 1 (candidates): each batch emits its exact counts MINUS the
    batch's (k+1)-th largest count, dropping non-positive rows — a valid
    MG summary whose per-batch truncation error is <= n_batch/(k+1), so
    summed weights underestimate true counts by at most n/(k+1).  The
    exchange therefore carries <= k rows per batch instead of every
    distinct value.  Candidates = summed weight >= threshold - n/(k+1) —
    a PROVEN superset of the true heavy hitters.  If the data outgrows the
    summary (``threshold <= n/(k+1)``), pass 1 is redone once with k
    resized from the measured n (targeting err <= threshold/2) — the
    operator self-heals at any scale instead of raising.

    Pass 2 (exact recount): the candidate set (small by construction:
    <= n/(threshold - n/(k+1)) values) is broadcast via ``ray.put``; each
    batch counts ONLY candidates, one tiny exchange sums exactly, then
    ``>= threshold`` filters.  Output is exactly SQL ``GROUP BY col
    HAVING COUNT(*) >= threshold`` — the approximation affects only what
    the first pass is allowed to forget.
    """
    import pyarrow.compute as pc
    import ray

    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    k = int(summary_k)

    def make_mg_partial(k: int):
        def mg_partial(t: pa.Table) -> pa.Table:
            n = t.num_rows
            empty = pa.table(
                {
                    "value": pa.array([], t.schema.field(col).type),
                    "w": pa.array([], pa.int64()),
                    "n_part": pa.array([], pa.int64()),
                }
            )
            if n == 0:
                return empty
            arr = t[col].combine_chunks().drop_null()
            if len(arr) == 0:
                return empty
            vc = pc.value_counts(arr)
            vals, cnts = vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)
            if len(cnts) > k:
                trunc = np.partition(cnts, len(cnts) - (k + 1))[len(cnts) - (k + 1)]
            else:
                trunc = 0
            w = cnts - trunc
            keep = w > 0
            vals = vals.filter(pa.array(keep))
            w = w[keep]
            n_part = np.zeros(len(w), dtype=np.int64)
            n_part[0] = len(arr)  # batch token total rides the first summary row
            return pa.table(
                {"value": vals, "w": pa.array(w.astype(np.int64)), "n_part": pa.array(n_part)}
            )

        return mg_partial

    # Pass-1 guarantee is checkable only once total n is known; if the data
    # has outgrown summary_k (threshold <= n/(k+1)), the scale-safe move is
    # to resize k from the measured n and redo pass 1 — not to raise.  The
    # resized k targets err <= threshold/2, so one retry always restores the
    # guarantee; the second iteration of the loop exists only as a seatbelt
    # (total_n is deterministic across retries).
    for _attempt in range(3):
        partials = ds.map_batches(
            make_mg_partial(k), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        total_n = int(partials.sum("n_part") or 0)
        err = total_n // (k + 1)
        if threshold > err:
            break
        k = max(2 * k, 2 * total_n // threshold + 1)
    else:
        raise ValueError(
            f"heavy_hitters guarantee violated after resize: threshold="
            f"{threshold} <= n/(k+1)={err} at k={k}"
        )

    def sum_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"value": t["value"].combine_chunks().slice(0, 0),
                 "w": pa.array([], pa.int64())}
            )
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        firsts = starts[:-1]
        return pa.table(
            {
                "value": t["value"].combine_chunks().take(pa.array(firsts)),
                "w": pa.array(np.add.reduceat(w, firsts)),
            }
        )

    summed = grouped_map(partials, ["value"], sum_kernel, num_buckets=num_buckets)

    def cand_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["w"], threshold - err)).select(["value"])

    cand_batches = list(
        summed.map_batches(cand_filter, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    )
    cand_vals: list = []
    for b in cand_batches:
        cand_vals.extend(b["value"].to_pylist())
    cand_ref = ray.put(cand_vals)

    def exact_partial(t: pa.Table) -> pa.Table:
        cand_list = ray.get(cand_ref)
        arr = t[col].combine_chunks().drop_null()
        if cand_list and len(arr):
            cand = pa.array(cand_list, type=arr.type)
            arr = arr.filter(pc.is_in(arr, value_set=cand))
        else:
            arr = arr.slice(0, 0)
        if len(arr) == 0:
            return pa.table(
                {"value": pa.array([], t.schema.field(col).type),
                 "cnt": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(arr)
        return pa.table(
            {"value": vc.field("values"),
             "cnt": vc.field("counts").cast(pa.int64())}
        )

    exact = ds.map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True)

    def cnt_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"value": t["value"].combine_chunks().slice(0, 0),
                 "cnt": pa.array([], pa.int64())}
            )
        c = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        firsts = starts[:-1]
        return pa.table(
            {
                "value": t["value"].combine_chunks().take(pa.array(firsts)),
                "cnt": pa.array(np.add.reduceat(c, firsts)),
            }
        )

    counted = grouped_map(exact, ["value"], cnt_kernel, num_buckets=num_buckets)

    def thresh(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["cnt"], threshold))

    return counted.map_batches(thresh, batch_format="pyarrow", zero_copy_batch=True)
