"""Round-4 wave-25 operators vs brute-force oracles: per-entity change-point
localization, cohort LTV curve."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

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


def test_changepoint_finds_planted_shift(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_changepoint_value_user

    # user 0: 10 values at 1.0 then 10 at 50.0 -> split at k=10
    # user 1: constant -> any split equal score, ties -> k=1
    # user 2: single observation -> no split (k=0, score null)
    vals = [1.0] * 10 + [50.0] * 10 + [7.0] * 5 + [3.0]
    users = [0] * 20 + [1] * 5 + [2]
    ts = list(range(20)) + list(range(5)) + [0]
    _write_events(tmp_path, np.array(ts) * 1_000_000, users,
                  ["e"] * 26, vals)
    out = (q_changepoint_value_user(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    assert out.loc[0, "split_k"] == 10
    assert out.loc[1, "split_k"] == 1  # all splits tie, smallest k wins
    assert out.loc[2, "split_k"] == 0 and np.isnan(out.loc[2, "score"])
    # brute force user 0's score at k=10
    c = np.round(np.array(vals[:20]) * 100).astype(np.int64)
    sl, sr = c[:10].sum(), c[10:].sum()
    want = float(sl) * float(sl) / 10.0 + float(sr) * float(sr) / 10.0
    assert out.loc[0, "score"] == pytest.approx(want, rel=0, abs=0)

    # brute-force argmax across ALL users with >= 2 obs
    df = pd.DataFrame({"u": users, "c": np.round(np.array(vals) * 100)})
    for u, grp in df.groupby("u"):
        cc = grp["c"].to_numpy()
        if len(cc) < 2:
            continue
        best_k, best_s = 0, -np.inf
        for k in range(1, len(cc)):
            s = cc[:k].sum() ** 2 / k + cc[k:].sum() ** 2 / (len(cc) - k)
            if s > best_s:
                best_k, best_s = k, s
        assert out.loc[u, "split_k"] == best_k


def test_cohort_ltv_cumulative_and_assignment(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_cohort_ltv

    # user 0 first seen week 0, purchases in weeks 0,1,2 (10, 20, 30)
    # user 1 first seen week 1 (non-purchase), purchases week 2 (5)
    ts = [0, WEEK, 2 * WEEK, WEEK + 5, 2 * WEEK + 5]
    users = [0, 0, 0, 1, 1]
    types = ["purchase", "purchase", "purchase", "view", "purchase"]
    vals = [0.10, 0.20, 0.30, None, 0.05]
    _write_events(tmp_path, ts, users, types, vals)
    out = (q_cohort_ltv(str(tmp_path)).to_pandas()
           .set_index(["cohort", "age"]).sort_index())
    w0 = 0  # epoch week of ts=0
    assert out.loc[(w0, 0), "rev"] == 10
    assert out.loc[(w0, 1), "rev"] == 20
    assert out.loc[(w0, 2), "rev"] == 30
    assert out.loc[(w0, 2), "cum_rev"] == 60
    # user 1's cohort is week 1; its purchase lands at age 1
    assert out.loc[(w0 + 1, 0), "rev"] == 0  # the view event row
    assert out.loc[(w0 + 1, 1), "rev"] == 5
    assert out.loc[(w0 + 1, 1), "cum_rev"] == 5
