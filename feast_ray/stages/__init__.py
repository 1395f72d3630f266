"""Operator stages: every module exposes pure kernels (numpy/Arrow in-out,
unit-testable without Ray) plus Dataset-level wrappers built on
``feast_ray.grouped.grouped_map`` / ``map_batches``."""
