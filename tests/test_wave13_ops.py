"""Round-4 wave-13 operators vs brute-force oracles: embedding covariance,
transition entropy, Wilson intervals."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.stats import list_col_covariance


def test_list_col_covariance_matches_numpy(ray_session):
    import pyarrow as pa

    rng = np.random.default_rng(31)
    m, d = 400, 6
    vecs = rng.normal(0, 2, (m, d)).astype(np.float32)
    tbl = pa.table(
        {"embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))}
    )
    out = (
        list_col_covariance(rd.from_arrow(tbl), "embedding")
        .to_pandas()
        .set_index(["dim_a", "dim_b"])
        .sort_index()
    )
    micro = np.round(vecs.astype(np.float64) * 1e6)
    want = np.cov(micro, rowvar=False, bias=True) / 1e12
    assert len(out) == d * (d + 1) // 2
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            assert out.loc[(i, j), "cov"] == pytest.approx(
                want[i - 1, j - 1], rel=1e-9, abs=1e-12
            ), (i, j)
    assert (out["n"] == m).all()


def test_transition_entropy_matches_naive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_transition_entropy_user

    rng = np.random.default_rng(8)
    n = 1200
    tbl = pa.table({
        "event_id": pa.array(np.arange(n)),
        "ts": pa.array(
            pd.to_datetime(np.sort(rng.integers(0, 10**7, n)) * 1_000_000,
                           unit="us")
        ).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 25, n)),
        "event_type": pa.array(rng.choice(["x", "y", "z"], n)),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        q_transition_entropy_user(str(tmp_path))
        .to_pandas().set_index("user_id").sort_index()
    )
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    for uid, g in df.groupby("user_id"):
        pairs = [f"{a}>{b}" for a, b in zip(g["event_type"], g["event_type"][1:])]
        if not pairs:
            assert uid not in out.index
            continue
        counts = pd.Series(pairs).value_counts().to_list()
        nn = sum(counts)
        ts = sum(round(c * math.log2(c) * 1_000_000) for c in counts)
        want = math.log2(nn) - (ts / 1_000_000.0) / nn
        assert out.loc[uid, "n_transitions"] == nn
        assert out.loc[uid, "entropy_bits"] == pytest.approx(want, abs=1e-12)


def test_wilson_interval_properties(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_wilson_ci_types

    rng = np.random.default_rng(6)
    n = 800
    vals = np.where(rng.random(n) < 0.25, 150.0, 5.0)  # 25% "big" (>=100.00)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n)),
        "ts": pa.array(pd.to_datetime(np.arange(n) * 10**6, unit="us")).cast(
            pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 9, n)),
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_wilson_ci_types(str(tmp_path)).to_pandas().set_index("event_type")
    for et, r in out.iterrows():
        k, nn = int(r["k"]), int(r["n"])
        ph = k / nn
        z, z2 = 1.96, 3.8416
        denom = 1 + z2 / nn
        center = (ph + z2 / (2 * nn)) / denom
        half = z * math.sqrt(ph * (1 - ph) / nn + z2 / (4 * nn * nn)) / denom
        assert r["rate"] == pytest.approx(ph, abs=1e-12)
        assert r["wilson_lo"] == pytest.approx(center - half, abs=1e-9)
        assert r["wilson_hi"] == pytest.approx(center + half, abs=1e-9)
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
