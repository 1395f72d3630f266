"""Snapshot diff (CDC-style): compare two keyed snapshots of a table and
emit one row per key that was ADDED, REMOVED, or CHANGED.

The feature-store shape of this operator is the materialization diff —
"what changed between yesterday's and today's feature table" (upstream
Feast diffs REGISTRY objects, `diff/registry_diff.py`; it has no DATA diff,
yet incremental pipelines need exactly this to validate a backfill or build
a change feed).  One co-partitioned shuffle of both snapshots tagged by
side; the kernel resolves each key group locally:

- key only in ``new``  -> ``added``
- key only in ``old``  -> ``removed``
- key in both, any compare column differs (NULL-aware) -> ``changed``
- identical rows are omitted (the common case — output is O(changes))

Contract: ``keys`` uniquely identify a row WITHIN each snapshot (verified
per bucket — duplicate keys raise, they would make "changed" ambiguous).
Comparison is vectorized per column over the bucket (dictionary-encode for
strings, NULL-aware equality), no per-row Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map, starts_to_group_index

_SIDE = "__diff_side"


def diff_tables(
    old,
    new,
    *,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    status_col: str = "status",
    num_buckets: Optional[int] = None,
):
    """Dataset of ``(keys..., status)`` with status in added/removed/changed
    (unchanged keys omitted).  ``compare_cols`` defaults to every shared
    non-key column; both snapshots must carry keys + compare columns."""
    from feast_ray.grouped import dataset_schema

    keys = list(keys)
    os_ = dataset_schema(old)
    ns_ = dataset_schema(new)
    if compare_cols is None:
        compare_cols = [
            n for n in os_.names if n not in keys and n in set(ns_.names)
        ]
    compare_cols = list(compare_cols)

    def tag(side_val: int):
        def f(t: pa.Table) -> pa.Table:
            cols = {k: t[k] for k in keys}
            for c in compare_cols:
                cols[c] = t[c]
            cols[_SIDE] = pa.array(np.full(t.num_rows, side_val, dtype=np.int8))
            return pa.table(cols)

        return f

    both = old.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        new.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                **{k: pa.array([], t.schema.field(k).type) for k in keys},
                status_col: pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        side = t[_SIDE].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        n_old = np.bincount(gidx[side == 0], minlength=n_groups)
        n_new = np.bincount(gidx[side == 1], minlength=n_groups)
        if (n_old > 1).any() or (n_new > 1).any():
            raise ValueError(
                "diff_tables: duplicate keys within a snapshot — keys must "
                "uniquely identify a row on each side"
            )
        firsts = starts[:-1]
        # sorted by (keys, side): old row (if any) leads its group
        added = (n_old == 0) & (n_new == 1)
        removed = (n_old == 1) & (n_new == 0)
        in_both = (n_old == 1) & (n_new == 1)
        changed = np.zeros(n_groups, dtype=bool)
        if in_both.any():
            gi = np.flatnonzero(in_both)
            oi = starts[:-1][gi]      # old row index (side 0 sorts first)
            ni = oi + 1               # new row index
            diff = np.zeros(len(gi), dtype=bool)
            for c in compare_cols:
                col = t[c].combine_chunks()
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    vals = col.dictionary_encode().indices.fill_null(-1).to_numpy(
                        zero_copy_only=False
                    )
                elif pa.types.is_timestamp(col.type):
                    vals = col.cast(pa.int64()).fill_null(np.iinfo(np.int64).min).to_numpy(
                        zero_copy_only=False
                    )
                else:
                    vals = col.to_numpy(zero_copy_only=False)
                valid = col.is_valid().to_numpy(zero_copy_only=False)
                a, b = vals[oi], vals[ni]
                va, vb = valid[oi], valid[ni]
                neq = (va != vb) | (va & vb & (a != b))
                if np.issubdtype(np.asarray(a).dtype, np.floating):
                    both_nan = np.isnan(a) & np.isnan(b)
                    neq = (va != vb) | (va & vb & (a != b) & ~both_nan)
                diff |= neq
            changed[gi] = diff
        statuses = np.full(n_groups, "", dtype=object)
        statuses[added] = "added"
        statuses[removed] = "removed"
        statuses[changed] = "changed"
        emit = added | removed | changed
        if not emit.any():
            return empty
        take = pa.array(firsts[emit])
        cols = {k: pc.take(t[k].combine_chunks(), take) for k in keys}
        cols[status_col] = pa.array(list(statuses[emit]), type=pa.string())
        return pa.table(cols)

    return grouped_map(both, keys, kernel, sort_keys=[_SIDE], num_buckets=num_buckets)
