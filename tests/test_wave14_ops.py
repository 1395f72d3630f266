"""Round-4 wave-14 operators vs brute-force oracles: circular time stats,
PCA projection, exponential decay counts."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.stats import grouped_circular_time, pca_project


def test_circular_time_matches_naive(ray_session):
    rng = np.random.default_rng(41)
    n = 2000
    us = rng.integers(0, 10**13, n) * 7  # arbitrary epoch microseconds
    df = pd.DataFrame({"k": rng.integers(0, 17, n),
                       "ts": pd.to_datetime(us, unit="us")})
    out = (
        grouped_circular_time(rd.from_pandas(df), "k", "ts")
        .to_pandas().set_index("k").sort_index()
    )
    period = 86_400_000_000
    for k, g in df.groupby("k"):
        u = g["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        theta = (u % period).astype(float) * 6.283185307179586 / period
        s = sum(round(math.sin(t) * 1e6) for t in theta) / 1e6
        c = sum(round(math.cos(t) * 1e6) for t in theta) / 1e6
        nn = len(u)
        assert out.loc[k, "n"] == nn
        assert out.loc[k, "resultant_r"] == pytest.approx(
            math.sqrt(s * s + c * c) / nn, abs=1e-9
        )
        assert out.loc[k, "mean_angle"] == pytest.approx(
            math.atan2(s, c), abs=1e-9
        )
    # concentration bound
    assert ((out["resultant_r"] >= 0) & (out["resultant_r"] <= 1 + 1e-12)).all()


def test_circular_concentrated_entity(ray_session):
    # an entity always active at exactly the same time of day -> R == 1
    us = (np.arange(30) * 86_400_000_000 + 3_600_000_000).astype(np.int64)
    df = pd.DataFrame({"k": np.zeros(30, np.int64),
                       "ts": pd.to_datetime(us, unit="us")})
    out = grouped_circular_time(rd.from_pandas(df), "k", "ts").to_pandas()
    assert out["resultant_r"][0] == pytest.approx(1.0, abs=1e-6)


def test_pca_project_matches_numpy(ray_session):
    import pyarrow as pa

    rng = np.random.default_rng(12)
    m, d = 500, 6
    # anisotropic cloud with a known dominant direction
    base = rng.normal(0, 1, (m, 2)) @ np.array([[5.0, 0, 0, 0, 0, 0],
                                                [0, 2.0, 0, 0, 0, 0]])
    x = (base + rng.normal(0, 0.1, (m, d))).astype(np.float32)
    tbl = pa.table({
        "vid": pa.array(np.arange(m)),
        "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float32())),
    })
    out_ds, evr = pca_project(rd.from_arrow(tbl), "embedding", id_col="vid",
                              n_components=2)
    out = out_ds.to_pandas().set_index("vid").sort_index()
    # numpy twin on the SAME fixed-point covariance grid
    micro = np.round(x.astype(np.float64) * 1e6)
    cov = np.cov(micro, rowvar=False, bias=True) / 1e12
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    comps = v[:, order]
    for c in range(2):
        if comps[np.argmax(np.abs(comps[:, c])), c] < 0:
            comps[:, c] = -comps[:, c]
    want = x.astype(np.float64) @ comps
    np.testing.assert_allclose(
        out[["pc1", "pc2"]].to_numpy(), want, rtol=1e-7, atol=1e-7
    )
    # the dominant axis explains most variance
    assert evr[0] > 0.5 and evr[0] >= evr[1] >= 0


def test_decayed_count_matches_naive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_decayed_count_user

    rng = np.random.default_rng(33)
    n = 900
    us = rng.integers(0, 40 * 86_400_000_000, n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n)),
        "ts": pa.array(pd.to_datetime(us, unit="us")).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 12, n)),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_decayed_count_user(str(tmp_path)).to_pandas().set_index("user_id")
    ref = us.max()
    df = pd.DataFrame({"u": tbl["user_id"].to_numpy(), "us": us})
    lam = 0.0990210257942779
    for uid, g in df.groupby("u"):
        w = sum(
            round(math.exp(-((ref - t) / 86_400_000_000.0) * lam) * 1e6)
            for t in g["us"]
        ) / 1e6
        assert out.loc[uid, "n"] == len(g)
        assert out.loc[uid, "decayed_count"] == pytest.approx(w, abs=1e-9)
        # decayed count never exceeds raw count, never below ~0
        assert 0 <= out.loc[uid, "decayed_count"] <= len(g)
