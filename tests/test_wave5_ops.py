"""Round-4 wave-5 operators vs brute-force pandas/python oracles:
time-weighted average, time-since recency, expanding percentile rank,
and the declarative expectation suite (stages/validate.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.stats import (
    add_group_expanding_rank,
    add_group_time_since,
    grouped_time_weighted_avg,
)
from feast_ray.stages.validate import Expectation, validate


@pytest.fixture()
def series(ray_session):
    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 23, n),
            "ts": rng.integers(0, 10**9, n) * 1000,  # us, ms-aligned not guaranteed
            "rid": np.arange(n),
            "v": np.round(rng.uniform(0, 500, n), 2),
            "flag": rng.random(n) < 0.15,
        }
    )
    # null values + single-row entity + all-flagless entity
    df.loc[rng.choice(n, 60, replace=False), "v"] = np.nan
    df.loc[df["k"] == 5, "flag"] = False
    df = df[~((df["k"] == 7) & (df.index > df[df["k"] == 7].index.min()))]
    df["ts_dt"] = pd.to_datetime(df["ts"], unit="us")
    return df.reset_index(drop=True)


def test_time_weighted_avg_matches_bruteforce(series):
    got = (
        grouped_time_weighted_avg(
            rd.from_pandas(series[["k", "ts_dt", "rid", "v"]]),
            ["k"],
            "v",
            "ts_dt",
            order_cols=["ts_dt", "rid"],
            out_col="twa",
            num_buckets=3,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        g = series[series["k"] == row["k"]].sort_values(["ts", "rid"])
        cents = np.round(g["v"].to_numpy() * 100)
        ts = g["ts"].to_numpy()
        gaps = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            gaps[:-1] = (ts[1:] - ts[:-1]) // 1000
        ok = ~np.isnan(g["v"].to_numpy())
        denom = int(gaps[ok].sum())
        assert row["n_events"] == len(g)
        if denom == 0:
            assert pd.isna(row["twa"])
        else:
            numer = int((cents[ok] * gaps[ok]).sum())
            assert row["twa"] == (numer / denom) / 100


def test_time_since_matches_bruteforce(series):
    got = (
        add_group_time_since(
            rd.from_pandas(series[["k", "ts_dt", "rid", "flag"]]),
            "k",
            "ts_dt",
            "flag",
            order_cols=["ts_dt", "rid"],
            out_col="since",
            num_buckets=3,
        )
        .to_pandas()
        .sort_values(["k", "ts_dt", "rid"])
        .reset_index(drop=True)
    )
    want = []
    for k, g in series.sort_values(["k", "ts", "rid"]).groupby("k"):
        last = None
        for _, r in g.iterrows():
            want.append(None if last is None else r["ts"] - last)
            if r["flag"]:
                last = r["ts"]
    w = pd.Series(want, dtype="float64")
    g = got["since"].astype("float64")
    assert ((g.isna() == w.isna()) & ((g == w) | w.isna())).all()
    # entity 5 has no flagged rows at all -> all NULL
    assert got.loc[got["k"] == 5, "since"].isna().all()


def test_expanding_rank_matches_bruteforce(series):
    got = (
        add_group_expanding_rank(
            rd.from_pandas(series[["k", "ts_dt", "rid", "v"]]),
            "k",
            "v",
            order_cols=["ts_dt", "rid"],
            num_buckets=3,
        )
        .to_pandas()
        .sort_values(["k", "ts_dt", "rid"])
        .reset_index(drop=True)
    )
    srt = series.sort_values(["k", "ts", "rid"]).reset_index(drop=True)
    for k, g in srt.groupby("k"):
        sub = got[got["k"] == k].reset_index(drop=True)
        hist: list[float] = []
        for i, (_, r) in enumerate(g.iterrows()):
            if np.isnan(r["v"]):
                assert pd.isna(sub.loc[i, "n_prior"])
                assert pd.isna(sub.loc[i, "n_less"])
                assert pd.isna(sub.loc[i, "pct_rank"])
                continue
            n_prior = len(hist)
            n_less = sum(1 for h in hist if h < r["v"])
            assert sub.loc[i, "n_prior"] == n_prior
            assert sub.loc[i, "n_less"] == n_less
            if n_prior == 0:
                assert pd.isna(sub.loc[i, "pct_rank"])
            else:
                assert sub.loc[i, "pct_rank"] == n_less / n_prior
            hist.append(r["v"])


def test_validate_suite_counts(ray_session):
    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 5],  # one duplicate pair
            "cat": ["a", "b", "zz", None, "a", "a"],
            "x": [1.0, -3.0, 50.0, None, 120.0, 7.0],
            "s": ["{j}", "nope", None, "{k}", "{m}", "{n}"],
        }
    )
    out = validate(
        rd.from_pandas(df).repartition(3),
        [
            Expectation("x_not_null", "x", "not_null"),
            Expectation("x_range", "x", "between", lo=0.0, hi=100.0),
            Expectation("cat_known", "cat", "in_set", allowed=("a", "b")),
            Expectation("id_unique", "id", "unique"),
            Expectation("s_brace", "s", "matches", pattern=r"^\{"),
        ],
        num_buckets=2,
    ).to_pandas().set_index("expectation")
    assert (out["n_rows"] == 6).all()
    assert out.loc["x_not_null", "n_violations"] == 1
    assert out.loc["x_range", "n_violations"] == 2  # -3 and 120; NULL passes
    assert out.loc["cat_known", "n_violations"] == 1  # zz; NULL passes
    assert out.loc["id_unique", "n_violations"] == 1
    assert out.loc["s_brace", "n_violations"] == 1  # 'nope'; NULL passes
    assert not out["passed"].any()


def test_validate_all_green(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    out = validate(
        rd.from_pandas(df),
        [
            Expectation("x_not_null", "x", "not_null"),
            Expectation("id_unique", "id", "unique"),
        ],
        num_buckets=2,
    ).to_pandas()
    assert out["passed"].all()
    assert (out["n_violations"] == 0).all()


def test_expectation_validation_errors():
    with pytest.raises(ValueError):
        Expectation("e", "c", "bogus")
    with pytest.raises(ValueError):
        Expectation("e", "c", "between")
    with pytest.raises(ValueError):
        Expectation("e", "c", "in_set")
    with pytest.raises(ValueError):
        validate(None, [Expectation("a", "c", "not_null"),
                        Expectation("a", "d", "not_null")])


def _km_bruteforce(durations, events):
    """Textbook KM over (duration, event) pairs; returns rows per event day."""
    import collections

    ev = collections.Counter()
    cen = collections.Counter()
    for d, e in zip(durations, events):
        (ev if e else cen)[d] += 1
    days = sorted(set(ev) | set(cen))
    total = len(durations)
    out, at_risk, s = [], total, 1.0
    for d in days:
        if ev[d] > 0:
            h = ev[d] / at_risk
            s = s * (1.0 - h)
            out.append((d, at_risk, ev[d], cen[d], h, s))
        at_risk -= ev[d] + cen[d]
    return out


def test_survival_km_matches_bruteforce(ray_session, tmp_path):
    # synthetic event log: signup then maybe purchase, plus noise events
    rng = np.random.default_rng(5)
    rows = []
    eid = 0
    day_us = 86_400_000_000
    for u in range(120):
        t0 = int(rng.integers(0, 30)) * day_us
        rows.append((u, eid, t0, "signup", 1.0)); eid += 1
        # a decoy purchase BEFORE signup must not count
        if u % 10 == 0:
            rows.append((u, eid, t0 - 2 * day_us, "purchase", 5.0)); eid += 1
        horizon = int(rng.integers(1, 40))
        if rng.random() < 0.6:
            rows.append((u, eid, t0 + horizon * day_us, "purchase", 9.0)); eid += 1
        else:
            rows.append((u, eid, t0 + horizon * day_us, "view", 0.0)); eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    p = tmp_path / "events.parquet"
    df.to_parquet(p)

    from feast_ray.pipelines.queries_ml import q_survival_km_signup

    got = q_survival_km_signup(str(tmp_path))
    durations, events = [], []
    for u, g in df.groupby("user_id"):
        s = g[g["event_type"] == "signup"]["ts"].min()
        pur = g[(g["event_type"] == "purchase") & (g["ts"] >= s)]["ts"]
        last = g["ts"].max()
        if len(pur):
            durations.append((pur.min() - s).value // (day_us * 1000))
            events.append(1)
        else:
            durations.append((last - s).value // (day_us * 1000))
            events.append(0)
    want = _km_bruteforce(durations, events)
    assert len(got) == len(want)
    for (_, r), w in zip(got.iterrows(), want):
        assert (r["day"], r["n_risk"], r["n_events"], r["n_censored"]) == w[:4]
        assert r["hazard"] == w[4] and r["survival"] == w[5]


def test_attribution_linear_credit_conserved(ray_session):
    """Every purchase's credit rows sum exactly to its cents (linear
    attribution conserves revenue), and types never include 'purchase'."""
    from feast_ray.pipelines.queries_ml import q_attribution_linear

    got = q_attribution_linear("/root/testdata/sf0.001").to_pandas()
    assert (got["touch_type"] != "purchase").all()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    pur = ev[ev["event_type"] == "purchase"].set_index("event_id")
    per = got.groupby("event_id")["credit_cents"].sum()
    for eid, tot in per.items():
        cents = round(float(pur.loc[eid, "value"]) * 100)
        assert abs(tot - cents) < 1e-6, (eid, tot, cents)
    # fractional rows: n_of_type <= n_touches, credit matches the formula
    frac = got[got["touch_type"] != "none"]
    assert (frac["n_of_type"] <= frac["n_touches"]).all()


def test_cusum_matches_recursion(ray_session):
    rng = np.random.default_rng(9)
    n = 800
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 11, n),
            "rid": np.arange(n),
            "x": rng.integers(-500, 520, n),
        }
    )
    from feast_ray.stages.stats import add_group_cusum

    got = (
        add_group_cusum(
            rd.from_pandas(df), "k", "x", order_cols=["rid"], drift=7,
            out_col="s", num_buckets=3,
        )
        .to_pandas()
        .sort_values(["k", "rid"])
        .reset_index(drop=True)
    )
    want = []
    for k, g in df.sort_values(["k", "rid"]).groupby("k"):
        s = 0
        for x in g["x"]:
            s = max(0, s + int(x) - 7)
            want.append(s)
    assert (got["s"].to_numpy() == np.array(want)).all()
    assert (got["s"] >= 0).all()


def test_context_window_join_matches_bruteforce(ray_session):
    from feast_ray.pipelines.queries import q_context_window_join

    got = (
        q_context_window_join("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["anchor_id", "ctx_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    tol = 24 * 3600 * 1_000_000
    rows = []
    for u, g in ev.groupby("user_id"):
        p = g[g["event_type"] == "purchase"]
        for _, a in p.iterrows():
            near = g[(g["event_id"] != a["event_id"])
                     & ((g["us"] - a["us"]).abs() <= tol)]
            for _, c in near.iterrows():
                rows.append((u, a["event_id"], c["event_id"],
                             c["event_type"], c["us"] - a["us"]))
    want = pd.DataFrame(
        rows, columns=["user_id", "anchor_id", "ctx_id", "ctx_type", "dt_us"]
    ).sort_values(["anchor_id", "ctx_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_gini_matches_bruteforce(ray_session):
    from feast_ray.pipelines.queries import q_gini_value_user

    got = (
        q_gini_value_user("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    pur = ev[ev["event_type"] == "purchase"]
    for u, g in pur.groupby("user_id"):
        x = np.sort(np.round(g["value"].to_numpy() * 100).astype(np.int64))
        n, s = len(x), int(x.sum())
        sw = int((np.arange(1, n + 1) * x).sum())
        want = (2 * sw) / (n * s) - (n + 1) / n
        assert got.loc[u, "n_purchases"] == n
        assert got.loc[u, "gini_value"] == want
        assert -1e-9 <= got.loc[u, "gini_value"] <= 1.0


def test_next_type_pred_matches_bruteforce(ray_session):
    from feast_ray.pipelines.queries import q_next_type_pred_user

    got = (
        q_next_type_pred_user("/root/testdata/sf0.001")
        .to_pandas()
        .set_index(["user_id", "cur"])
        .sort_index()
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    import collections

    want: dict = {}
    for u, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        cnt: dict = collections.defaultdict(collections.Counter)
        for a, b in zip(types, types[1:]):
            cnt[a][b] += 1
        for cur, c in cnt.items():
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            want[(u, cur)] = best
    assert len(got) == len(want)
    for (u, cur), (nxt, n) in want.items():
        assert got.loc[(u, cur), "pred_next"] == nxt, (u, cur)
        assert got.loc[(u, cur), "n_obs"] == n
