"""Round-4 wave-12 operators vs brute-force oracles: calendar features,
grouped geometric mean, kNN density score."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.normalize import calendar_features
from feast_ray.stages.stats import grouped_geomean


def test_calendar_features_matches_datetime(ray_session):
    rng = np.random.default_rng(17)
    us = rng.integers(0, 2_000_000_000, 800).astype(np.int64) * 100_000
    df = pd.DataFrame({"rid": np.arange(len(us)),
                       "ts": pd.to_datetime(us, unit="us")})
    out = (
        calendar_features(rd.from_pandas(df), ts_col="ts")
        .to_pandas().set_index("rid").sort_index()
    )
    for rid, u in enumerate(us):
        d = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=int(u))
        assert out.loc[rid, "year"] == d.year
        assert out.loc[rid, "month"] == d.month
        # python weekday(): Monday=0; SQL DOW: Sunday=0
        assert out.loc[rid, "dow"] == (d.weekday() + 1) % 7
        assert out.loc[rid, "hour"] == d.hour
        assert out.loc[rid, "is_weekend"] == int(d.weekday() >= 5)


def test_grouped_geomean_matches_naive(ray_session):
    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 31, n),
        "c": rng.integers(1, 100_000, n),
    })
    out = (
        grouped_geomean(rd.from_pandas(df), "k", "c")
        .to_pandas().set_index("k").sort_index()
    )
    for k, g in df.groupby("k"):
        terms = sum(round(math.log(c) * 1_000_000) for c in g["c"])
        want = math.exp((terms / 1_000_000.0) / len(g))
        assert out.loc[k, "n"] == len(g)
        assert out.loc[k, "geomean"] == pytest.approx(want, rel=1e-12)
        # sanity: geomean within [min, max] and <= arithmetic mean
        assert g["c"].min() <= out.loc[k, "geomean"] <= g["c"].mean() + 1e-9


def test_knn_density_is_rank3_of_graph(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_knn_density_embeddings

    rng = np.random.default_rng(2)
    m, d = 60, 8
    vecs = rng.normal(0, 1, (m, d)).astype(np.float32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(m)),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(m, np.int32)),
        }),
        tmp_path / "embeddings.parquet",
    )
    out = q_knn_density_embeddings(str(tmp_path)).to_pandas().set_index("vec_id")
    # naive: cosine matrix, 3rd highest off-diagonal (rounded to 6dp first,
    # ties by neighbor id — ranking by (-cos, nbr) like the kernel)
    x = vecs.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = np.round(x @ x.T, 6)
    for i in range(m):
        cands = sorted(
            ((-cos[i, j], j) for j in range(m) if j != i)
        )
        want = -cands[2][0]
        assert out.loc[i, "kth_cos"] == pytest.approx(want, abs=2e-6), i
    assert len(out) == m
