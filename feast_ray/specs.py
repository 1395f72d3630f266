"""Declarative feature specs — the engine's object model.

Plays the role of Feast's registry objects (upstream
``sdk/python/feast/feature_view.py::FeatureView``,
``data_source.py::DataSource``, ``entity.py::Entity``,
``feature_service.py::FeatureService``) but as plain dataclasses declared in
code — no protobuf registry, per SURVEY.md §1.3 / §3.3.  A spec is pure
metadata; all execution happens in ``feast_ray.pipelines`` /
``feast_ray.stages`` over ``ray.data.Dataset``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta
from typing import Optional, Sequence

import pyarrow as pa


@dataclass(frozen=True)
class ParquetSource:
    """A physical Parquet table + event-time metadata.

    Mirrors upstream ``infra/offline_stores/file_source.py::FileSource``:
    ``timestamp_field`` is the event time, ``created_timestamp_column`` the
    tie-break time, ``field_mapping`` renames physical -> logical columns.
    """

    path: str
    timestamp_field: str = "ts"
    created_timestamp_column: Optional[str] = None
    field_mapping: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class FeatureView:
    """The central logical feature table (upstream
    ``feature_view.py::FeatureView``): entity join key(s), feature columns,
    source, and the TTL lookback bound for point-in-time joins.

    ``ttl=None`` means unbounded lookback (Feast's ``ttl=timedelta(0)`` /
    unset behaviour).  ``features=None`` means "all non-key, non-time
    columns of the source".
    """

    name: str
    join_keys: tuple[str, ...]
    source: ParquetSource
    ttl: Optional[timedelta] = None
    features: Optional[tuple[str, ...]] = None

    @property
    def timestamp_field(self) -> str:
        return self.source.timestamp_field

    @property
    def created_timestamp_column(self) -> Optional[str]:
        return self.source.created_timestamp_column


@dataclass(frozen=True)
class FeatureSpec:
    """A bundle of feature views + requested columns — the retrieval-time
    SELECT list (upstream ``feature_service.py::FeatureService``)."""

    name: str
    views: tuple[FeatureView, ...]
    full_feature_names: bool = False


# ---------------------------------------------------------------------------
# Canonical transcript schema (authoritative input shape, BASELINE.json:15)
# ---------------------------------------------------------------------------

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us", tz="UTC")),
    ]
)

SPINE_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("ts", pa.timestamp("us", tz="UTC")),
        pa.field("turn_idx", pa.int32()),
    ]
)
