"""Adversarial boundary tests for the round-3 temporal operators: every
half-open / inclusive bound and tie rule pinned with hand-built rows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ds(rows, schema=None):
    return rd.from_arrow(pa.table(rows) if schema is None else pa.table(rows, schema=schema))


def test_conversion_window_half_open_bounds(ray_session):
    from feast_ray.stages.asof import range_agg_forward

    spine = _ds({"k": [1], "ts": pa.array([1000], pa.int64()), "sid": [0]})
    # events at exactly t (excluded), t+1 (in), t+W (included), t+W+1 (out)
    ev = _ds({"k": [1, 1, 1, 1], "ts": pa.array([1000, 1001, 1100, 1101], pa.int64()),
              "v": pa.array([1, 10, 100, 1000], pa.int64())})
    out = range_agg_forward(spine, ev, key="k", window_us=100, val_col="v").to_pandas()
    assert out.iloc[0]["n_window"] == 2
    assert out.iloc[0]["sum_window"] == 110


def test_nearest_asof_tolerance_boundary_and_tie(ray_session):
    from feast_ray.stages.asof import asof_join_nearest

    spine = _ds({"k": [1, 1], "ts": pa.array([1000, 5000], pa.int64()), "sid": [0, 1]})
    feats = _ds({"k": [1, 1, 1], "ts": pa.array([900, 1100, 5100], pa.int64()),
                 "fid": pa.array([1, 2, 3], pa.int64()),
                 "x": pa.array([9.0, 11.0, 51.0], pa.float64())})
    # sid 0: both at distance 100 -> backward (x=9); sid 1: distance exactly
    # == tolerance -> included
    out = (
        asof_join_nearest(spine, feats, key="k", tie_col="fid",
                          tolerance_us=100, feature_cols=["x"])
        .to_pandas().sort_values("sid").reset_index(drop=True)
    )
    assert out.iloc[0]["x"] == 9.0
    assert out.iloc[1]["x"] == 51.0


def test_asof_last_n_ttl_inclusive_and_order(ray_session):
    from feast_ray.stages.asof import asof_join_last_n

    spine = _ds({"k": [1], "ts": pa.array([1000], pa.int64()), "sid": [0]})
    feats = _ds({"k": [1, 1, 1], "ts": pa.array([800, 900, 1000], pa.int64()),
                 "fid": pa.array([1, 2, 3], pa.int64()),
                 "x": pa.array([8.0, 9.0, 10.0], pa.float64())})
    out = asof_join_last_n(
        spine, feats, key="k", n_last=3, tie_col="fid",
        ttl_us=200, feature_cols=["x"],
    ).to_pandas()
    r = out.iloc[0]
    # slot 1 = most recent (ts==t included); ttl bound t-200 == 800 INCLUDED
    assert (r["x_1"], r["x_2"], r["x_3"]) == (10.0, 9.0, 8.0)


def test_asof_last_n_equal_ts_tie_order(ray_session):
    from feast_ray.stages.asof import asof_join_last_n

    spine = _ds({"k": [1], "ts": pa.array([1000], pa.int64()), "sid": [0]})
    feats = _ds({"k": [1, 1], "ts": pa.array([1000, 1000], pa.int64()),
                 "fid": pa.array([5, 9], pa.int64()),
                 "x": pa.array([5.0, 9.0], pa.float64())})
    out = asof_join_last_n(
        spine, feats, key="k", n_last=2, tie_col="fid", feature_cols=["x"]
    ).to_pandas()
    r = out.iloc[0]
    # equal ts: slot 1 takes the LARGEST tie, slot 2 the next
    assert (r["x_1"], r["x_2"]) == (9.0, 5.0)


def test_funnel_strictly_after(ray_session):
    from feast_ray.stages.windows import funnel_steps

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 2],
            "ts": np.array([100, 100, 200, 100, 150, 150], dtype=np.int64),
            "et": ["A", "B", "C", "A", "B", "C"],
        }
    )
    out = (
        funnel_steps(rd.from_pandas(df), "k", "ts", "et", ["A", "B", "C"])
        .to_pandas().set_index("k").sort_index()
    )
    # k=1: B at ts==A's ts does NOT count (strictly after) -> stalls at A
    assert out.loc[1, "t_step_1"] == 100 and pd.isna(out.loc[1, "t_step_2"])
    assert not out.loc[1, "converted"]
    # k=2: B at 150 ok, but C also at 150 is NOT strictly after B -> stalls
    assert out.loc[2, "t_step_2"] == 150 and pd.isna(out.loc[2, "t_step_3"])
    assert not out.loc[2, "converted"]


def test_densify_negative_free_span_and_total(ray_session):
    from feast_ray.stages.windows import densify_calendar

    df = pd.DataFrame({"k": [1, 1, 1], "day": np.array([5, 5, 8], dtype=np.int64)})
    out = (
        densify_calendar(rd.from_pandas(df), "k", "day", count_name="n")
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    assert out["day"].tolist() == [5, 6, 7, 8]
    assert out["n"].tolist() == [2, 0, 0, 1]
