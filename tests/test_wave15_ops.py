"""Round-4 wave-15 operators vs brute-force oracles: cross-series
correlation, overdispersion index, FK orphan audit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, n=1500, seed=19, types=("click", "purchase", "view")):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    us = rng.integers(0, 30 * 3_600_000_000, n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n)),
        "ts": pa.array(pd.to_datetime(us, unit="us")).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 15, n)),
        "event_type": pa.array(rng.choice(list(types), n)),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    return tbl.to_pandas()


def test_type_corr_hourly_matches_naive(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_type_corr_hourly

    df = _write_events(tmp_path)
    out = q_type_corr_hourly(str(tmp_path)).to_pandas()
    sub = df[df["event_type"].isin(["click", "purchase"])].copy()
    sub["hr"] = (
        sub["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
    )
    g = sub.pivot_table(index="hr", columns="event_type", values="event_id",
                        aggfunc="count", fill_value=0)
    x = g.get("click", pd.Series(0, index=g.index)).to_numpy(float)
    y = g.get("purchase", pd.Series(0, index=g.index)).to_numpy(float)
    want = np.corrcoef(x, y)[0, 1]
    assert out["n_hours"][0] == len(g)
    assert out["corr_xy"][0] == pytest.approx(want, abs=1e-9)


def test_overdispersion_matches_naive(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_overdispersion_type

    df = _write_events(tmp_path, seed=29)
    out = (
        q_overdispersion_type(str(tmp_path))
        .to_pandas().set_index("event_type").sort_index()
    )
    for et, g in df.groupby("event_type"):
        c = g.groupby("user_id").size().to_numpy(float)
        mean, var = c.mean(), c.var()  # population variance
        assert out.loc[et, "n_users"] == len(c)
        assert out.loc[et, "mean_c"] == pytest.approx(mean, abs=1e-9)
        assert out.loc[et, "dispersion"] == pytest.approx(var / mean, abs=1e-9)


def test_fk_orphans_detects_breaks(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_fk_orphans_audit

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
            "o_custkey": pa.array([1, 2, 99, 3], pa.int64()),  # one orphan
        }),
        tmp_path / "orders.parquet")
    pq.write_table(
        pa.table({"l_orderkey": pa.array([10, 10, 77, 13, 88], pa.int64())}),
        tmp_path / "lineitem.parquet")  # two orphans
    out = q_fk_orphans_audit(str(tmp_path)).to_pandas().set_index("fk")
    assert out.loc["orders->customer", "n_orphans"] == 1
    assert out.loc["orders->customer", "n_rows"] == 4
    assert out.loc["lineitem->orders", "n_orphans"] == 2
    assert out.loc["lineitem->orders", "n_rows"] == 5
