"""Deterministic sampling (O4).

Upstream Feast has no core sampling operator (SURVEY §2.6 O4 —
``ds.random_sample`` would cover the nondeterministic case); at 100 TB a
REPRODUCIBLE sample matters more: re-runs, resumed partitions and
downstream audits must all see the same rows.  So the primary operator is
hash-Bernoulli: keep a row iff ``mix64(key) % den < num``.  The mixer is
the splitmix-style multiply used across the engine, chosen because it is
also expressible in ANSI SQL (HUGEINT split-multiply — see the DuckDB
twin in ``pipelines.queries``), making the sample driver-checkable.

Embarrassingly parallel: one ``map_batches`` filter, no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MIX = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """(x * MIX) mod 2^64 — uint64 wraparound multiply."""
    return x.astype(np.uint64) * MIX


def hash_sample(ds, *, key_col: str, percent: int, modulus: int = 100):
    """Deterministic ~``percent/modulus`` Bernoulli sample keyed on an
    integer column.  Same input ⇒ same sample, on any cluster shape."""
    if not (0 <= percent <= modulus):
        raise ValueError("percent must be in [0, modulus]")

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (mix64(k) % np.uint64(modulus)) < np.uint64(percent)
        return t.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
