"""10x-events stress of the round-4 feature-engineering operators.

Tiles the sf0.1 events table 10x (~1M rows) with offset event_ids but
UNCHANGED user_ids/timestamps — every user's history grows 10x denser,
which is exactly what stresses the grouped kernels (per-group lexsorts,
rank machinery, forward-window searchsorteds) and the three-pass global
rank of rank_gauss.  Prints ONE JSON line of per-query wall seconds;
record in BASELINE.md.

Usage (from /root/repo, nothing else running):
    python tools/stress_events_10x.py [sf_dir=/root/testdata/sf0.1] [copies=10]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

QUERIES_UNDER_TEST = [
    "next_item_training_pairs",
    "rank_gauss_values",
    "label_purchase_7d",
    "spearman_value_time_user",
    "changepoint_value_user",
    "oof_target_encode_events",
    "psi_weekly_type",
    "hashed_cross_user",
    "feature_corr_matrix_user",
    "table_fingerprint_events",
]


def build(sf_dir: str, copies: int, out_dir: str) -> int:
    src = pq.read_table(f"{sf_dir}/events.parquet")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    n = src.num_rows
    parts = []
    for c in range(copies):
        parts.append(src.set_column(
            src.schema.get_field_index("event_id"), "event_id",
            pc.add(src["event_id"], c * n)))
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out_dir, "events.parquet"))
    return n * copies


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir = "/tmp/feast_ray_stress_events"
    n = build(sf_dir, copies, out_dir)

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext, Dataset

    DataContext.get_current().enable_progress_bars = False
    from feast_ray.pipelines.queries import QUERIES

    timings = {}
    rows = {}
    for name in QUERIES_UNDER_TEST:
        t0 = time.perf_counter()
        res = QUERIES[name](out_dir)
        cnt = res.count() if isinstance(res, Dataset) else res.num_rows
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = int(cnt)
    ray.shutdown()
    print(json.dumps({"metric": "stress_events_10x_sec", "n_rows": n,
                      "timings": timings, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
