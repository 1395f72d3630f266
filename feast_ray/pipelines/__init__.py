"""End-to-end pipelines: historical retrieval (get_historical_features
equivalent) and the flagship transcript backfill."""
