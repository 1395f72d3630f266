"""Round-4 wave-23 operators vs brute-force oracles: next-item training
pairs, weekly PSI drift series, order-invariant table fingerprint."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

MIN30 = 1800 * 1_000_000
WEEK = 604_800_000_000


def _write_events(tmp_path, ts_us, user_id, event_type, value):
    n = len(ts_us)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(list(event_type), pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def test_next_item_lags_respect_session_boundary(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_next_item_training_pairs

    # user 0: a,b,c in session 0, then a gap > 30min, then d,e in session 1
    ts = [0, 1_000_000, 2_000_000,
          2_000_000 + MIN30 + 1, 2_000_000 + MIN30 + 1_000_001]
    types = ["a", "b", "c", "d", "e"]
    _write_events(tmp_path, ts, [0] * 5, types, [None] * 5)
    out = (q_next_item_training_pairs(str(tmp_path)).to_pandas()
           .set_index("event_id").sort_index())
    assert out.loc[2, ["prev1", "prev2", "prev3"]].tolist() == ["b", "a", None]
    assert out.loc[2, "label_type"] == "c"
    # first event of session 1 must NOT see session 0
    assert out.loc[3, ["prev1", "prev2", "prev3"]].isna().all()
    assert out.loc[4, "prev1"] == "d" and pd.isna(out.loc[4, "prev2"])
    assert out.loc[3, "session_id"] == 1 and out.loc[0, "session_id"] == 0


def test_psi_weekly_baseline_is_zero_and_drift_rises(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_psi_weekly_type

    # week 0: values near 1.0; week 1: identical; week 2: shifted to 100.0
    ts = ([i * 1000 for i in range(20)]
          + [WEEK + i * 1000 for i in range(20)]
          + [2 * WEEK + i * 1000 for i in range(20)])
    vals = [1.0] * 40 + [100.0] * 20
    _write_events(tmp_path, ts, [0] * 60, ["a"] * 60, vals)
    out = (q_psi_weekly_type(str(tmp_path)).to_pandas()
           .set_index("week").sort_index())
    assert out.loc[0, "psi"] == 0.0          # baseline vs itself
    assert out.loc[1, "psi"] == 0.0          # identical distribution
    assert out.loc[2, "psi"] > 1.0           # full shift = severe drift
    assert (out["n_week"] == 20).all()


def test_fingerprint_order_invariant_and_sensitive(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_table_fingerprint_events

    rng = np.random.default_rng(2)
    n = 200
    ts = rng.integers(0, 10**12, n)
    users = rng.integers(0, 20, n)
    types = rng.choice(["a", "b"], n)
    vals = [None if i % 7 == 0 else float(i) for i in range(n)]
    _write_events(tmp_path, ts, users, types, vals)
    fp1 = q_table_fingerprint_events(str(tmp_path)).to_pandas()

    # same rows, shuffled order -> same fingerprint
    perm = rng.permutation(n)
    tmp2 = tmp_path / "shuf"
    tmp2.mkdir()
    tbl = pq.read_table(tmp_path / "events.parquet")
    pq.write_table(tbl.take(pa.array(perm)), tmp2 / "events.parquet")
    fp2 = q_table_fingerprint_events(str(tmp2)).to_pandas()
    assert fp1["fingerprint"][0] == fp2["fingerprint"][0]
    assert fp1["n_rows"][0] == fp2["n_rows"][0] == n

    # one flipped value -> different fingerprint
    tmp3 = tmp_path / "mut"
    tmp3.mkdir()
    vals3 = list(vals)
    vals3[5] = (vals3[5] or 0.0) + 0.01
    _write_events(tmp3, ts, users, types, vals3)
    fp3 = q_table_fingerprint_events(str(tmp3)).to_pandas()
    assert fp3["fingerprint"][0] != fp1["fingerprint"][0]
