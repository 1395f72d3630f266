"""Distributed semi / anti join (SURVEY §2 J5).

Feast's offline stores express entity filtering as SQL ``WHERE EXISTS`` /
``NOT EXISTS`` subqueries pushed to the warehouse (upstream
``offline_store.py`` templating); here it is one co-partitioned hash
shuffle: both sides are tagged, unioned, bucketed by the join keys, and a
vectorized kernel keeps left rows whose key group does (semi) / does not
(anti) contain a right row.

Scale notes:
- ONE all-to-all over left + the right KEY COLUMNS only (the right side's
  payload never moves).  When the right side is known-small, prefer a
  broadcast ``ray.put`` set + ``map_batches`` filter instead — this module
  is the general path with no size assumption on either side.
- The kernel is O(rows) per bucket: group membership via one bincount,
  row filtering via one boolean mask.  No per-group Python loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from feast_ray.grouped import grouped_map, starts_to_group_index

_SIDE = "__fj_side"


def _dataset_schema(ds) -> pa.Schema:
    from feast_ray.grouped import dataset_schema

    return dataset_schema(ds)


def filter_join(
    left,
    right,
    *,
    keys: Sequence[str],
    mode: str = "semi",
    num_buckets: Optional[int] = None,
):
    """Keep left rows whose ``keys`` appear (semi) / don't appear (anti) in
    ``right``.  Duplicate right keys are fine (presence test only); left
    row multiplicity is preserved exactly (no join fan-out).

    NULL keys follow SQL ``EXISTS`` / ``NOT EXISTS`` semantics: a left row
    with any NULL key matches nothing (dropped by semi, kept by anti), and
    right rows with NULL keys assert nothing.  Those rows never enter the
    shuffle — NULL-key left rows are split off before bucketing and, for
    anti, unioned back onto the output.
    """
    import pyarrow.compute as pc

    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    keys = list(keys)
    left_schema = _dataset_schema(left)
    for k in keys:
        if k not in left_schema.names:
            raise ValueError(f"join key {k!r} not in left schema {left_schema.names}")
    union_schema = pa.schema(list(left_schema) + [pa.field(_SIDE, pa.int8())])

    def _keys_valid(t: pa.Table):
        m = None
        for k in keys:
            v = t[k].is_valid() if not isinstance(t[k], pa.ChunkedArray) else t[k].combine_chunks().is_valid()
            m = v if m is None else pc.and_(m, v)
        return m

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.filter(_keys_valid(t))  # NULL-key rows can never match
        cols = {f.name: t[f.name].cast(f.type) for f in left_schema}
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table({f.name: cols[f.name] for f in union_schema})

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(_keys_valid(t))  # NULL-key right rows assert nothing
        n = t.num_rows
        cols = {}
        for f in left_schema:
            if f.name in keys:
                cols[f.name] = t[f.name].cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, type=f.type)
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table({f.name: cols[f.name] for f in union_schema})

    both = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    want_present = mode == "semi"

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        side = t[_SIDE].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        has_right = np.bincount(gidx[side == 1], minlength=n_groups) > 0
        keep = (side == 0) & (has_right[gidx] == want_present)
        return t.filter(pa.array(keep)).drop_columns([_SIDE])

    out = grouped_map(both, keys, kernel, num_buckets=num_buckets)
    if mode == "anti":
        null_left = left.map_batches(
            lambda t: pa.table(
                {f.name: t.filter(pc.invert(_keys_valid(t)))[f.name].cast(f.type)
                 for f in left_schema}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = out.union(null_left)
    return out


def semi_join(left, right, *, keys, num_buckets=None):
    return filter_join(left, right, keys=keys, mode="semi", num_buckets=num_buckets)


def anti_join(left, right, *, keys, num_buckets=None):
    return filter_join(left, right, keys=keys, mode="anti", num_buckets=num_buckets)
