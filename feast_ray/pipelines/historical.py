"""Historical retrieval — the engine's ``get_historical_features``.

Mirrors the reference entry point (upstream
``sdk/python/feast/feature_store.py::FeatureStore.get_historical_features`` →
``infra/offline_stores/dask.py::evaluate_historical_retrieval``): for each
FeatureView, as-of join its feature table onto the entity spine, iteratively
composing LEFT joins (J2); optional ``full_feature_names`` prefixes
(``viewname__feature``, M6); optional terminal on-demand UDF stage (M8) —
``on_demand_batch_format`` selects the UDF surface: ``"pandas"`` (upstream
``transform_dataframe``), ``"pyarrow"``, or ``"numpy"`` (dict of arrays —
the vectorized analog of upstream ``transform_dict`` native mode).

The result is the lazy Dataset itself — the RetrievalJob equivalent;
``.to_pandas()`` / ``write_parquet`` are the ``to_df`` / ``persist`` analogs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from feast_ray.specs import FeatureView
from feast_ray.sources.parquet import read_view_source, spine_from
from feast_ray.stages.asof import asof_join


def get_historical_features(
    entity_df,
    views: Sequence[FeatureView],
    *,
    spine_ts: str = "ts",
    full_feature_names: bool = False,
    on_demand_transform: Optional[Callable] = None,
    on_demand_batch_format: str = "pandas",
    num_buckets: Optional[int] = None,
):
    """Point-in-time-correct feature retrieval for every spine row.

    ``entity_df`` may be a Dataset, pandas DataFrame, Arrow table, or a
    parquet path — the entity-dataframe ingress of the reference (S3).
    ``views`` may also be a single ``FeatureSpec`` (the FeatureService
    analog — upstream ``get_historical_features(features=<service>)``):
    its view bundle and ``full_feature_names`` flag are used.
    """
    from feast_ray.specs import FeatureSpec

    if isinstance(views, FeatureSpec):
        full_feature_names = full_feature_names or views.full_feature_names
        views = views.views
    out = spine_from(entity_df, ts_col=spine_ts)
    for view in views:
        feat_ds = read_view_source(view)
        ttl_us = int(view.ttl.total_seconds() * 1_000_000) if view.ttl else None
        out = asof_join(
            out,
            feat_ds,
            key=list(view.join_keys),  # 1..n keys (Entity.join_keys)
            spine_ts=spine_ts,
            feat_ts=view.timestamp_field,
            created_ts=view.created_timestamp_column,
            ttl_us=ttl_us,
            feature_cols=list(view.features) if view.features else None,
            prefix=view.name if full_feature_names else None,
            num_buckets=num_buckets,
        )
    if on_demand_transform is not None:
        out = out.map_batches(
            on_demand_transform, batch_format=on_demand_batch_format
        )
    return out
