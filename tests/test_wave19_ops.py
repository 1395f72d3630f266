"""Round-4 wave-19 operators vs brute-force oracles: PSI drift, WOE/IV,
hashed cross features, mutual information, last-k sequences, Cramer's V."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


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


def test_psi_zero_band_smoothing(ray_session, tmp_path):
    """A band empty in one half must still contribute a smoothed term
    (zero cells change PSI under Laplace smoothing — they must be counted,
    not dropped)."""
    from feast_ray.pipelines.queries_ml import q_psi_value_type

    # half 1 (ts<=med): values near min; half 2: values near max only
    ts = np.arange(40, dtype=np.int64) * 1_000_000
    vals = [1.0] * 20 + [100.0] * 20
    _write_events(tmp_path, ts, np.zeros(40), ["a"] * 40, vals)
    out = q_psi_value_type(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["n_first"][0] == 20 and out["n_second"][0] == 20
    # brute force: cents 100 x20 in band 0 half1; cents 10000 x20 band 9 half2
    n1 = np.zeros(10); n1[0] = 20
    n2 = np.zeros(10); n2[9] = 20
    p_a = (n1 + 1) / 30.0
    p_b = (n2 + 1) / 30.0
    tm = np.round((p_a - p_b) * np.log(p_a / p_b) * 1e6)
    assert out["psi"][0] == pytest.approx(tm.sum() / 1e6, abs=1e-9)
    assert out["psi"][0] > 1.0  # full separation = severe drift


def test_woe_iv_one_sided_type(ray_session, tmp_path):
    """A type with zero positives must get a finite smoothed WOE, and the
    label threshold is STRICTLY above the exact global mean."""
    from feast_ray.pipelines.queries_ml import q_woe_iv_types

    # mean cents = (4*100 + 4*300)/8 = 200; y = c > 200
    vals = [1.0, 1.0, 1.0, 1.0, 3.0, 3.0, 3.0, 3.0]
    types = ["lo"] * 4 + ["hi"] * 4
    _write_events(tmp_path, np.arange(8) * 1_000_000, np.zeros(8), types, vals)
    out = (q_woe_iv_types(str(tmp_path)).to_pandas()
           .set_index("event_type"))
    assert out.loc["lo", "n_pos"] == 0 and out.loc["lo", "n_neg"] == 4
    assert out.loc["hi", "n_pos"] == 4 and out.loc["hi", "n_neg"] == 0
    # brute: P=4, Q=4, k=2 -> smoothed odds
    woe_lo = math.log((0.5 / 5.0) / (4.5 / 5.0))
    assert out.loc["lo", "woe"] == pytest.approx(
        round(woe_lo * 1e6) / 1e6, abs=1e-9)
    assert np.isfinite(out["woe"]).all()
    # IV terms of a perfectly separating feature are all positive
    assert (out["iv_term"] > 0).all()


def test_mean_threshold_exact_boundary(ray_session, tmp_path):
    """cents exactly equal to the integer global mean must be labeled 0
    (strict >) — the floor-division equivalence c > S // N."""
    from feast_ray.pipelines.queries_ml import q_mutual_info_type_label

    # cents: 100, 200, 300 -> mean exactly 200; y = (0, 0, 1)
    _write_events(tmp_path, np.arange(3) * 1_000_000, np.zeros(3),
                  ["a", "a", "b"], [1.0, 2.0, 3.0])
    out = q_mutual_info_type_label(str(tmp_path)).to_pandas()
    assert out["n"][0] == 3
    # brute MI over cells {(a,0):2, (b,1):1}, ct={a:2,b:1}, cy={0:2,1:1}
    cells = [(2, 2, 2), (1, 1, 1)]
    tm = sum(round((c / 3.0) * math.log((c * 3) / (ct * cy)) * 1e6)
             for c, ct, cy in cells)
    assert out["mi_nats"][0] == pytest.approx(tm / 1e6, abs=1e-9)


def test_hashed_cross_matches_hashlib(ray_session, tmp_path):
    """Engine buckets must equal a direct per-row hashlib.md5 recompute
    (the per-batch distinct-value shortcut is a pure optimization)."""
    from feast_ray.pipelines.queries_ml import q_hashed_cross_user

    rng = np.random.default_rng(7)
    n = 500
    ts = rng.integers(0, 10**12, n)
    users = rng.integers(0, 9, n)
    types = rng.choice(["click", "view", "buy"], n)
    _write_events(tmp_path, ts, users, types, [None] * n)
    out = q_hashed_cross_user(str(tmp_path)).to_pandas()
    hours = (ts // 3_600_000_000) % 24
    bucket = np.array([
        int(hashlib.md5(f"{t}_{h}".encode()).hexdigest()[:8], 16) % 16
        for t, h in zip(types, hours)
    ])
    want = (pd.DataFrame({"user_id": users, "bucket": bucket})
            .groupby(["user_id", "bucket"]).size().rename("n").reset_index())
    got = out.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["bucket"].tolist() == want["bucket"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_last_k_short_groups_and_order(ray_session, tmp_path):
    """Users with < 5 events emit their full reversed sequence; ties on ts
    break by event_id DESC (newest id first)."""
    from feast_ray.pipelines.queries_ml import q_last_k_types_user

    # user 0: 7 events a..g -> last5 = g>f>e>d>c ; user 1: 2 events, tied ts
    ts = list(range(7)) + [100, 100]
    users = [0] * 7 + [1, 1]
    types = list("abcdefg") + ["x", "y"]
    _write_events(tmp_path, np.array(ts) * 1_000_000, users, types,
                  [None] * 9)
    out = (q_last_k_types_user(str(tmp_path)).to_pandas()
           .set_index("user_id"))
    assert out.loc[0, "last5"] == "g>f>e>d>c"
    assert out.loc[0, "n_events"] == 7
    assert out.loc[1, "last5"] == "y>x"  # event_id 8 ('y') is newer on tie


def test_cramers_v_independence_and_determinism(ray_session, tmp_path):
    """A perfectly balanced (type x hour) table gives chi2 = 0, V = 0;
    a fully separated one gives V = 1 (up to micro quantization)."""
    from feast_ray.pipelines.queries_ml import q_cramers_v_type_hour

    h = 3_600_000_000
    # balanced: each of 2 types x 2 hours appears 5x
    ts, types = [], []
    for hour in (0, 1):
        for t in ("a", "b"):
            ts += [hour * h + i for i in range(5)]
            types += [t] * 5
    _write_events(tmp_path, ts, np.zeros(len(ts)), types, [None] * len(ts))
    out = q_cramers_v_type_hour(str(tmp_path)).to_pandas()
    assert out["chi2"][0] == 0.0 and out["cramers_v"][0] == 0.0

    # separated: type a only hour 0, type b only hour 1
    tmp2 = tmp_path / "sep"
    tmp2.mkdir()
    ts2 = [0 * h + i for i in range(5)] + [1 * h + i for i in range(5)]
    _write_events(tmp2, ts2, np.zeros(10), ["a"] * 5 + ["b"] * 5, [None] * 10)
    out2 = q_cramers_v_type_hour(str(tmp2)).to_pandas()
    assert out2["cramers_v"][0] == pytest.approx(1.0, abs=1e-5)
