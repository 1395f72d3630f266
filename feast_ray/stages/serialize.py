"""Grouped ordered collection / serialization: collect_list and string_agg
per entity, in event-time order.

The LLM-training shape of this operator is "render each conversation's turns
into ONE training document" (the reference's transcript table is consumed
per-turn; a training pipeline needs the per-conversation serialization).
Upstream Feast has no collect/serialize aggregate at all (its
``aggregation.py::Aggregation`` set is count/sum/min/max/avg/stddev/last);
SQL's ``string_agg(col, sep ORDER BY ...)`` is the oracle semantics.

Runs on the engine's single-shuffle grouped exchange:

- the bucket arrives sorted by ``(keys, *sort_keys)``, so each group's
  elements are already contiguous and ordered;
- the join itself is ONE vectorized ``pyarrow.compute.binary_join`` over a
  ``LargeListArray`` built zero-copy from the group-boundary offsets — no
  per-group Python, no per-group string building.

Scale notes: one all-to-all, O(total bytes) kernel.  Output rows are one per
entity and can be big (a whole conversation's text); the exchange's bucket
sizing bounds per-task memory, and a pathological entity costs its byte
count, vectorized.  NULL elements follow Arrow ``binary_join`` semantics
(a NULL element nulls the group's serialization) — filter or fill NULLs
upstream when SQL ``string_agg`` parity (skip-NULLs) is required.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map


def _group_list(t: pa.Table, col: str, starts: np.ndarray) -> pa.LargeListArray:
    """Zero-copy list-per-group view of a sorted bucket's column."""
    values = t[col].combine_chunks()
    return pa.LargeListArray.from_arrays(pa.array(starts, type=pa.int64()), values)


def grouped_concat(
    ds,
    keys: Sequence[str],
    col: str,
    *,
    sep: str = "|",
    sort_keys: Sequence[str] = (),
    out_col: str = "concat",
    count_col: Optional[str] = "n_rows",
    num_buckets: Optional[int] = None,
):
    """One row per key group: elements of ``col`` joined with ``sep`` in
    ``sort_keys`` order (SQL ``string_agg(col, sep ORDER BY sort_keys)``),
    plus an optional element count."""
    keys = list(keys)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = pa.array(starts[:-1])
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), firsts) for k in keys
        }
        cols[out_col] = pc.binary_join(_group_list(t, col, starts), sep)
        if count_col is not None:
            cols[count_col] = pa.array(np.diff(starts))
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=list(sort_keys), num_buckets=num_buckets)


def grouped_collect(
    ds,
    keys: Sequence[str],
    col: str,
    *,
    sort_keys: Sequence[str] = (),
    out_col: str = "collected",
    num_buckets: Optional[int] = None,
):
    """One row per key group with ``col`` collected into a list in
    ``sort_keys`` order (SQL ``list(col ORDER BY ...)``) — the structured
    sibling of :func:`grouped_concat` for downstream batch consumers that
    want the elements, not a rendered string."""
    keys = list(keys)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = pa.array(starts[:-1])
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), firsts) for k in keys
        }
        cols[out_col] = _group_list(t, col, starts)
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=list(sort_keys), num_buckets=num_buckets)
