"""Ingest normalization: field mapping (M1), projection (M2), timestamp
normalization (M3), schema cast/validation (M5).

Mirrors upstream ``sdk/python/feast/infra/offline_stores/dask.py``'s
timestamp-normalization helpers and ``type_map.py``'s coercions, collapsed
into one vectorized Arrow ``map_batches`` stage: rename physical -> logical
columns, coerce naive timestamps to UTC (tz-aware stays, units unified to
microseconds), cast to the declared schema, fail fast on mismatch.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def normalize_timestamp(col: pa.ChunkedArray | pa.Array, tz: Optional[str] = "UTC"):
    """Naive -> assume UTC; aware -> convert; unit -> microseconds."""
    t = col.type
    if not pa.types.is_timestamp(t):
        raise TypeError(f"normalize_timestamp on non-timestamp column of type {t}")
    if t.tz is None:
        if tz is not None:
            col = pc.assume_timezone(col, "UTC")
    return col.cast(pa.timestamp("us", tz=tz))


def make_normalizer(
    *,
    field_mapping: Optional[Mapping[str, str]] = None,
    columns: Optional[Sequence[str]] = None,
    ts_cols: Sequence[str] = (),
    schema: Optional[pa.Schema] = None,
    tz: Optional[str] = "UTC",
):
    """Build a zero-copy-friendly batch fn applying rename/project/ts/cast."""

    def fn(tbl: pa.Table) -> pa.Table:
        if field_mapping:
            tbl = tbl.rename_columns(
                [field_mapping.get(n, n) for n in tbl.column_names]
            )
        if columns is not None:
            tbl = tbl.select(list(columns))
        for c in ts_cols:
            if c in tbl.column_names:
                i = tbl.column_names.index(c)
                tbl = tbl.set_column(i, c, normalize_timestamp(tbl[c], tz=tz))
        if schema is not None:
            tbl = tbl.select(schema.names).cast(schema)
        return tbl

    return fn


def normalize(
    ds,
    *,
    field_mapping: Optional[Mapping[str, str]] = None,
    columns: Optional[Sequence[str]] = None,
    ts_cols: Sequence[str] = (),
    schema: Optional[pa.Schema] = None,
    tz: Optional[str] = "UTC",
):
    fn = make_normalizer(
        field_mapping=field_mapping, columns=columns, ts_cols=ts_cols, schema=schema, tz=tz
    )
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
