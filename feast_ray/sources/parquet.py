"""Parquet ingress (S1/S3): column-pruned reads + spine ingress.

Upstream: ``infra/offline_stores/file_source.py::FileSource`` read via
``dd.read_parquet`` in ``dask.py::DaskOfflineStore.get_historical_features``;
``field_mapping`` renames applied post-read.  Here pruning happens AT the
read (``columns=`` + optional pyarrow dataset ``filter=`` for row-group
pushdown) — at 100 TB a read that loads all columns for a 2-column
transform is wrong (task brief), so callers always go through these helpers.
"""

from __future__ import annotations

from typing import Optional, Sequence

from feast_ray.specs import FeatureView, ParquetSource
from feast_ray.stages.normalize import normalize


def _strip_schema_metadata(tbl):
    """Block UDF applied INSIDE each read task: drop schema-level metadata
    (e.g. the ``b'pandas'`` blob pandas writers attach).  pyarrow schemas
    carrying that metadata are unhashable (``hash(schema)`` raises
    ``unhashable type: 'dict'``), which defeats ray's block-schema
    deduplication and spams ``Failed to hash the schemas`` warnings from
    every read worker at scale.  Zero-copy (metadata-only change)."""
    if tbl.schema.metadata:
        return tbl.replace_schema_metadata(None)
    return tbl


def read_source(
    path: str | Sequence[str],
    *,
    columns: Optional[Sequence[str]] = None,
    filter_expr=None,
    **read_kwargs,
):
    import ray.data as rd

    kw = dict(read_kwargs)
    if columns is not None:
        kw["columns"] = list(columns)
    if filter_expr is not None:
        kw["filter"] = filter_expr
    kw.setdefault("_block_udf", _strip_schema_metadata)
    return rd.read_parquet(path, **kw)


def read_pq(path: str | Sequence[str], *, columns=None, filter=None, **kw):  # noqa: A002
    """Drop-in for ``ray.data.read_parquet`` with schema-metadata stripping
    (see `_strip_schema_metadata`).  All engine pipelines read through
    this so no block schema ever carries unhashable metadata."""
    return read_source(path, columns=columns, filter_expr=filter, **kw)


def read_view_source(view: FeatureView, *, extra_columns: Sequence[str] = ()):
    """Read exactly the columns a FeatureView needs: join keys + event time
    (+ created time) + its features, with field_mapping applied."""
    src: ParquetSource = view.source
    inv = {v: k for k, v in src.field_mapping.items()}  # logical -> physical

    logical = list(view.join_keys) + [src.timestamp_field]
    if src.created_timestamp_column:
        logical.append(src.created_timestamp_column)
    if view.features is not None:
        logical += [c for c in view.features if c not in logical]
        physical = [inv.get(c, c) for c in logical]
    else:
        physical = None  # unknown until schema read; read all, rename after

    ds = read_source(src.path, columns=physical)
    ts_cols = [src.timestamp_field]
    if src.created_timestamp_column:
        ts_cols.append(src.created_timestamp_column)
    return normalize(ds, field_mapping=src.field_mapping, ts_cols=ts_cols, tz="UTC")


def spine_from(obj, *, ts_col: str = "ts"):
    """Entity-dataframe ingress (S3): accept a Dataset, pandas DataFrame,
    Arrow table, or parquet path; normalize the event-time column."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, str):
        ds = rd.read_parquet(obj)
    elif isinstance(obj, pd.DataFrame):
        ds = rd.from_pandas(obj)
    elif isinstance(obj, pa.Table):
        ds = rd.from_arrow(obj)
    else:
        ds = obj  # assume Dataset
    return normalize(ds, ts_cols=[ts_col], tz="UTC")
