"""feast_ray — a Ray-Data-native feature-materialization engine.

Built from scratch (not a port) with the historical-retrieval capabilities of
the Feast feature store (reference: oneconvergence/feast, a fork of public
feast-dev/feast; see SURVEY.md for the capability mapping):

- point-in-time-correct, TTL-bounded as-of joins of entity x timestamp spines
  against feature tables (Feast ``get_historical_features`` semantics,
  upstream ``sdk/python/feast/infra/offline_stores/dask.py::
  evaluate_historical_retrieval``),
- lag/lead, rolling-window aggregates (count/sum/mean/last over per-entity
  row-count and time windows), sessionization by inactivity gaps,
- latest-per-entity materialization reads (upstream
  ``dask.py::DaskOfflineStore.pull_latest_from_table_or_query``),
- plus large-scale training-data operators: exact + MinHash-LSH + SimHash
  dedup, embedding similarity search, text analysis, multimodal plumbing.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, vectorized numpy /
pyarrow.compute kernels, ONE bucketed hash shuffle per logical co-grouping
(see ``feast_ray.grouped``), actor pools for stateful stages, partitioned
Parquet sinks with per-partition lineage manifests and checkpointed resume.

None of this package calls ``ray.init()`` — the caller owns the Ray session.
"""

from feast_ray.specs import FeatureView, FeatureSpec, ParquetSource

__all__ = [
    "FeatureView",
    "FeatureSpec",
    "ParquetSource",
]

__version__ = "0.1.0"
