"""Sources/sinks: pruned Parquet reads, spine ingress, partitioned sink."""

from feast_ray.sources.parquet import read_source, read_view_source, spine_from

__all__ = ["read_source", "read_view_source", "spine_from"]
