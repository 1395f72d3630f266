"""Round-4 wave-22 operators vs brute-force oracles: 7-day purchase label
generation with class weights, univariate feature AUC."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY = 86_400_000_000


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


def test_label_window_boundaries_and_weights(ray_session, tmp_path):
    """Half-open (t, t+7d]: a purchase AT t does not label t; one exactly
    7d later does; 7d + 1us later does not.  Weights are N/(2*N_class)."""
    from feast_ray.pipelines.queries_ml import q_label_purchase_7d

    ts = [0,              # event 0: purchase at 7d -> label 1
          10 * DAY,       # event 1: purchase at +7d+1us -> label 0
          20 * DAY,       # event 2: simultaneous purchase only -> label 0
          7 * DAY,        # event 3: the purchase row itself (user 0)
          17 * DAY + 1,   # event 4: purchase for user 1 (too late)
          20 * DAY]       # event 5: purchase for user 2 (same instant)
    users = [0, 1, 2, 0, 1, 2]
    types = ["view", "view", "view", "purchase", "purchase", "purchase"]
    _write_events(tmp_path, ts, users, types, [None] * 6)
    out = (q_label_purchase_7d(str(tmp_path)).to_pandas()
           .set_index("event_id").sort_index())
    assert out.loc[0, "label"] == 1
    assert out.loc[1, "label"] == 0
    assert out.loc[2, "label"] == 0
    # purchase events label themselves only if ANOTHER purchase follows
    assert out.loc[3, "label"] == 0
    n, n1 = 6, int(out["label"].sum())
    for i in range(6):
        cls = out.loc[i, "label"]
        want = n / (2.0 * (n1 if cls == 1 else n - n1))
        assert out.loc[i, "sample_weight"] == pytest.approx(want, abs=1e-12)


def test_feature_auc_matches_sklearn_free_oracle(ray_session, tmp_path):
    """AUC equals the tie-aware rank-sum oracle; perfectly separating
    feature gives 1.0."""
    from feast_ray.pipelines.queries_ml import q_feature_auc_conversion

    rng = np.random.default_rng(9)
    rows_ts, rows_u, rows_t, rows_v = [], [], [], []
    eid = 0
    # 30 users: converters spend uniformly more, with deliberate feat ties
    for u in range(30):
        conv = u % 3 == 0
        spend = (u // 3) * 10 + (100 if conv else 0)  # ties within classes
        rows_ts.append(eid * 1000)
        rows_u.append(u)
        rows_t.append("purchase" if conv else "view")
        rows_v.append(float(spend) / 100.0)
        eid += 1
    _write_events(tmp_path, rows_ts, rows_u, rows_t, rows_v)
    out = q_feature_auc_conversion(str(tmp_path)).to_pandas()
    # brute force: tie-aware AUC over per-user (feat, label)
    df = pd.DataFrame({
        "u": rows_u,
        "feat": np.round(np.array(rows_v) * 100).astype(np.int64),
        "label": [1 if t == "purchase" else 0 for t in rows_t]})
    g = df.groupby("u").agg(feat=("feat", "sum"), label=("label", "max"))
    ranks = g["feat"].rank(method="average")
    n1 = int(g["label"].sum())
    n0 = len(g) - n1
    u_stat = ranks[g["label"] == 1].sum() - n1 * (n1 + 1) / 2
    want = u_stat / (n1 * n0)
    assert out["n_pos"][0] == n1 and out["n_neg"][0] == n0
    assert out["auc"][0] == pytest.approx(want, abs=1e-12)

    # perfectly separated corpus -> AUC exactly 1
    tmp2 = tmp_path / "sep"
    tmp2.mkdir()
    ts2, u2, t2, v2 = [], [], [], []
    for u in range(10):
        conv = u < 5
        ts2.append(u * 1000)
        u2.append(u)
        t2.append("purchase" if conv else "view")
        v2.append(1000.0 + u if conv else 1.0 + u)
    _write_events(tmp2, ts2, u2, t2, v2)
    out2 = q_feature_auc_conversion(str(tmp2)).to_pandas()
    assert out2["auc"][0] == 1.0
