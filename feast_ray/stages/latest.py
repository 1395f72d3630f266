"""Latest-per-entity (A6) — the materialization read.

Upstream ``sdk/python/feast/infra/offline_stores/dask.py::
DaskOfflineStore.pull_latest_from_table_or_query``: filter event_ts to
``[start, end]``, then keep the single newest row per entity, newest =
max ``(event_ts, created_ts)`` (the ``ROW_NUMBER() ... = 1`` pattern in the
SQL stores).  Here: optional vectorized time filter, then one bucketed
shuffle and a per-group tail(1) — O(n) after the local sort.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map


def latest_kernel(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
    if tbl.num_rows == 0:
        return tbl
    idx = pa.array(starts[1:] - 1, type=pa.int64())
    return tbl.take(idx)


def latest_per_entity(
    ds,
    *,
    keys: str | Sequence[str],
    ts_col: str,
    created_ts_col: Optional[str] = None,
    start=None,
    end=None,
    tie_break_cols: Sequence[str] = (),
    num_buckets: Optional[int] = None,
):
    """One newest row per entity within an optional ``[start, end]`` window.

    ``tie_break_cols`` make the result deterministic when ``(ts, created_ts)``
    still ties (e.g. a unique id column).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if start is not None or end is not None:

        def _filt(tbl: pa.Table) -> pa.Table:
            m = None
            if start is not None:
                m = pc.greater_equal(tbl[ts_col], pa.scalar(start))
            if end is not None:
                m2 = pc.less_equal(tbl[ts_col], pa.scalar(end))
                m = m2 if m is None else pc.and_(m, m2)
            return tbl.filter(m)

        ds = ds.map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)

    sort_keys = [ts_col]
    if created_ts_col:
        sort_keys.append(created_ts_col)
    sort_keys += list(tie_break_cols)
    return grouped_map(ds, keys, latest_kernel, sort_keys=sort_keys, num_buckets=num_buckets)


def topk_kernel(k: int, rank_col: Optional[str] = None):
    """Per-group newest-k rows (vectorized tail-k over all groups at once);
    optionally emits a 1-based recency rank (1 = newest)."""

    def kernel(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            out = tbl
            if rank_col:
                out = out.append_column(rank_col, pa.array([], type=pa.int64()))
            return out
        sizes = np.diff(starts)
        take = np.minimum(sizes, k)
        # indices of the last `take[g]` rows of each group
        total = int(take.sum())
        rep_end = np.repeat(starts[1:], take)
        csum = np.concatenate(([0], np.cumsum(take)))
        local = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], take)
        idx = rep_end - np.repeat(take, take) + local
        out = tbl.take(pa.array(idx))
        if rank_col:
            rank = np.repeat(take, take) - local  # newest row -> rank 1
            out = out.append_column(rank_col, pa.array(rank))
        return out

    return kernel


def topk_per_entity(
    ds,
    *,
    keys: str | Sequence[str],
    ts_col: str,
    k: int,
    created_ts_col: Optional[str] = None,
    tie_break_cols: Sequence[str] = (),
    rank_col: Optional[str] = "recency_rank",
    num_buckets: Optional[int] = None,
):
    """The k newest rows per entity (A6 generalized; SQL
    ``ROW_NUMBER() OVER (... ORDER BY ts DESC) <= k``)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_keys = [ts_col]
    if created_ts_col:
        sort_keys.append(created_ts_col)
    sort_keys += list(tie_break_cols)
    return grouped_map(
        ds, keys, topk_kernel(k, rank_col), sort_keys=sort_keys, num_buckets=num_buckets
    )
