"""Cross-run state: per-partition lineage manifests + checkpointed resume."""
