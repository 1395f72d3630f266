"""Grouped quantiles / z-score / pivot counts vs pandas-numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa
import ray.data as rd

from feast_ray.stages.stats import add_group_zscore, grouped_quantile, pivot_counts


@pytest.fixture()
def ev(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    return pd.DataFrame(
        {
            "k": rng.integers(0, 37, n),
            "c": rng.integers(-500, 10_000, n),
            "cat": rng.choice(["a", "b", "c", "zz"], n),
        }
    )


def _disc(vals, q):
    v = np.sort(vals)
    return v[max(int(np.ceil(q * len(v))), 1) - 1]


def _cont(vals, q):
    v = np.sort(vals)
    pos = q * (len(v) - 1)
    lo = int(np.floor(pos))
    hi = min(lo + 1, len(v) - 1)
    return v[lo] + (v[hi] - v[lo]) * (pos - lo)


def test_grouped_quantile_matches_numpy(ev):
    got = (
        grouped_quantile(
            rd.from_pandas(ev[["k", "c"]]),
            ["k"],
            "c",
            {"med": (0.5, "cont"), "p90": (0.9, "disc"), "p0": (0.0, "disc"),
             "p100": (1.0, "disc")},
            num_buckets=4,
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for k, grp in ev.groupby("k"):
        assert got.loc[k, "med"] == _cont(grp["c"].to_numpy(), 0.5)
        assert got.loc[k, "p90"] == _disc(grp["c"].to_numpy(), 0.9)
        assert got.loc[k, "p0"] == grp["c"].min()
        assert got.loc[k, "p100"] == grp["c"].max()


def test_grouped_quantile_nulls_excluded(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1, 2, 2], "c": [5.0, np.nan, 1.0, np.nan, np.nan]})
    tbl = rd.from_pandas(df)
    got = (
        grouped_quantile(tbl, ["k"], "c", {"med": (0.5, "cont")})
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert got.loc[1, "med"] == 3.0  # mean of 1 and 5
    assert np.isnan(got.loc[2, "med"])  # all-null group


def test_zscore_matches_pandas(ev):
    got = (
        add_group_zscore(rd.from_pandas(ev[["k", "c"]]), "k", "c", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "c"])
        .reset_index(drop=True)
    )
    want = ev[["k", "c"]].copy()
    g = want.groupby("k")["c"]
    want["z"] = (want["c"] - g.transform("mean")) / g.transform(lambda s: s.std(ddof=0))
    want = want.sort_values(["k", "c"]).reset_index(drop=True)
    assert np.allclose(got["zscore"], want["z"], atol=1e-9)


def test_zscore_degenerate_groups_null(ray_session):
    df = pd.DataFrame({"k": [1, 2, 2, 3, 3], "c": [7, 4, 4, 1, 2]})
    got = add_group_zscore(rd.from_pandas(df), "k", "c").to_pandas()
    by_k = got.groupby("k")["zscore"]
    assert by_k.apply(lambda s: s.isna().all())[1]  # n=1
    assert by_k.apply(lambda s: s.isna().all())[2]  # zero variance
    assert by_k.apply(lambda s: s.notna().all())[3]


def test_pivot_counts_matches_crosstab(ev):
    cats = ["a", "b", "c"]  # 'zz' deliberately excluded -> ignored
    got = (
        pivot_counts(rd.from_pandas(ev[["k", "cat"]]), ["k"], "cat", cats, num_buckets=4)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    want = pd.crosstab(ev["k"], ev["cat"]).reindex(columns=cats, fill_value=0)
    for c in cats:
        assert (got[f"n_{c}"] == want[c].reindex(got.index)).all()


def test_pivot_composite_key(ray_session):
    df = pd.DataFrame(
        {
            "k1": ["x", "x", "y", "y", "y"],
            "k2": [1, 1, 1, 2, 2],
            "cat": ["a", "b", "a", "a", "a"],
        }
    )
    got = (
        pivot_counts(rd.from_pandas(df), ["k1", "k2"], "cat", ["a", "b"])
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert got[["n_a", "n_b"]].to_numpy().tolist() == [[1, 1], [1, 0], [2, 0]]


def test_rank_family_matches_pandas(ev):
    from feast_ray.stages.stats import add_group_rank

    df = ev[["k", "c"]].copy()
    df["tb"] = np.arange(len(df))  # unique tiebreak for ntile
    got = (
        add_group_rank(rd.from_pandas(df), "k", "c", tiebreak=["tb"], ntile=3,
                       num_buckets=4)
        .to_pandas()
        .sort_values(["k", "tb"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "tb"]).reset_index(drop=True)
    g = want.groupby("k")["c"]
    assert (got["rank"] == g.rank(method="min").astype(int)).all()
    assert (got["dense_rank"] == g.rank(method="dense").astype(int)).all()
    n_g = want.groupby("k")["c"].transform("size")
    pr = np.where(n_g > 1, (got["rank"] - 1) / np.maximum(n_g - 1, 1), 0.0)
    assert np.array_equal(got["percent_rank"].to_numpy(), pr)
    # ntile: per group, tile sizes differ by at most 1 and are ordered
    for _, grp in got.sort_values(["k", "c", "tb"]).groupby("k"):
        tiles = grp["ntile_3"].to_numpy()
        assert (np.diff(tiles) >= 0).all()
        sizes = np.bincount(tiles)[1:]
        sizes = sizes[sizes > 0]
        assert sizes.max() - sizes.min() <= 1
        assert (sorted(sizes, reverse=True) == list(sizes)).__bool__()


def test_fixed_histogram_matches_numpy(ev):
    from feast_ray.stages.stats import fixed_histogram

    got = (
        fixed_histogram(rd.from_pandas(ev[["c"]]), "c", lo=0, hi=10_000, n_bins=10,
                        num_buckets=3)
        .to_pandas()
        .set_index("bin")["cnt"]
        .sort_index()
    )
    x = ev["c"].to_numpy()
    x = x[(x >= 0) & (x < 10_000)]  # negatives dropped
    want = np.bincount(x * 10 // 10_000, minlength=10)
    for b in range(10):
        assert got.get(b, 0) == want[b]
    assert got.sum() == len(x) < len(ev)  # out-of-range rows were dropped


def test_stratified_sample_matches_pandas(ev):
    from feast_ray.stages.sampling import mix64, stratified_sample

    df = ev.reset_index().rename(columns={"index": "rid"})
    out = (
        stratified_sample(
            rd.from_pandas(df), group_keys="k", key_col="rid", k=7
        )
        .to_pandas()
        .sort_values(["k", "sample_rank"])
        .reset_index(drop=True)
    )
    df2 = df.copy()
    df2["hv"] = mix64(df2["rid"].to_numpy())
    want = (
        df2.sort_values("hv", ascending=False)
        .groupby("k")
        .head(7)
        .sort_values(["k", "hv"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    assert (out["rid"].to_numpy() == want["rid"].to_numpy()).all()
    # rank 1 = largest hash, dense 1..k per group
    assert (
        out.groupby("k")["sample_rank"].apply(lambda s: list(s) == list(range(1, len(s) + 1))).all()
    )


def test_expanding_distinct_matches_pandas(ev):
    from feast_ray.stages.stats import add_group_expanding_distinct

    df = ev.reset_index().rename(columns={"index": "rid"})
    out = (
        add_group_expanding_distinct(
            rd.from_pandas(df), "k", "cat", order_cols=["c", "rid"], out_col="nd"
        )
        .to_pandas()
        .sort_values(["k", "c", "rid"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "c", "rid"])
        .groupby("k")["cat"]
        .transform(lambda s: (~s.duplicated()).cumsum())
        .to_numpy()
    )
    ordered = df.sort_values(["k", "c", "rid"]).reset_index(drop=True)
    assert (out["rid"].to_numpy() == ordered["rid"].to_numpy()).all()
    assert (out["nd"].to_numpy() == want).all()


def test_grouped_corr_matches_numpy(ev):
    from feast_ray.stages.stats import grouped_corr

    df = ev.copy()
    rng = np.random.default_rng(5)
    df["y"] = df["c"] // 3 + rng.integers(0, 50, len(df))
    out = (
        grouped_corr(rd.from_pandas(df), "k", "c", "y", out_col="r", count_col="n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        g = df[df["k"] == row["k"]]
        assert row["n"] == len(g)
        if len(g) < 2 or g["c"].nunique() == 1 or g["y"].nunique() == 1:
            assert pd.isna(row["r"])
        else:
            want = np.corrcoef(g["c"], g["y"])[0, 1]
            assert abs(row["r"] - want) < 1e-9


def test_grouped_corr_degenerate_groups(ray_session):
    from feast_ray.stages.stats import grouped_corr

    df = pd.DataFrame(
        {"k": [1, 2, 2, 3, 3, 3], "x": [5, 1, 1, 1, 2, 3], "y": [7, 4, 9, 1, 1, 1]}
    )
    out = (
        grouped_corr(rd.from_pandas(df), "k", "x", "y", out_col="r")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert pd.isna(out["r"]).tolist() == [True, True, True]  # n<2, vx=0, vy=0


def test_approx_group_quantile_matches_binned_oracle(ev):
    from feast_ray.stages.stats import approx_group_quantile

    lo, hi, n_bins = -500, 10_000, 70  # width 150
    out = (
        approx_group_quantile(
            rd.from_pandas(ev[["k", "c"]]),
            "k",
            "c",
            {"p50": 0.5, "p90": 0.9},
            lo=lo,
            hi=hi,
            n_bins=n_bins,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    width = (hi - lo) // n_bins
    for _, row in out.iterrows():
        vals = ev.loc[ev["k"] == row["k"], "c"].to_numpy()
        floored = lo + np.clip((vals - lo) * n_bins // (hi - lo), 0, n_bins - 1) * width
        for col, q in (("p50", 0.5), ("p90", 0.9)):
            assert row[col] == _disc(floored, q)
            # error bound: within one bin width of the exact quantile
            assert abs(row[col] - _disc(vals, q)) <= width


def test_approx_group_quantile_rejects_bad_bins(ev):
    from feast_ray.stages.stats import approx_group_quantile

    with pytest.raises(ValueError):
        approx_group_quantile(
            rd.from_pandas(ev[["k", "c"]]), "k", "c", {"p": 0.5},
            lo=0, hi=1000, n_bins=7,
        )


def test_daily_rollup_query_matches_pandas(ray_session):
    import ray.data as _rd

    from feast_ray.pipelines.queries import q_daily_user_events

    sf = "/root/testdata/sf0.001"
    out = q_daily_user_events(sf).to_pandas()
    ev2 = _rd.read_parquet(f"{sf}/events.parquet").to_pandas()
    ev2["day"] = (ev2["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000)
    ev2["c"] = (ev2["value"] * 100).round().astype("int64")
    want = (
        ev2.groupby(["user_id", "day"])
        .agg(n_events=("c", "size"), sum_cents=("c", "sum"), n_types=("event_type", "nunique"))
        .reset_index()
    )
    got = out.sort_values(["user_id", "day"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "day"]).reset_index(drop=True)
    assert got[["user_id", "day", "n_events", "sum_cents", "n_types"]].equals(
        want[["user_id", "day", "n_events", "sum_cents", "n_types"]]
    )


def test_weighted_mix_sample_matches_python(ev):
    from feast_ray.stages.sampling import mix64, weighted_mix_sample

    df = ev.reset_index().rename(columns={"index": "rid"})
    out = weighted_mix_sample(
        rd.from_pandas(df),
        group_col="cat",
        key_col="rid",
        percents={"a": 90, "zz": 0},
        default_percent=25,
    ).to_pandas()
    hv = mix64(df["rid"].to_numpy()) % np.uint64(100)
    thr = df["cat"].map({"a": 90, "zz": 0}).fillna(25).to_numpy(dtype=np.uint64)
    want = df[hv < thr]
    assert sorted(out["rid"]) == sorted(want["rid"])
    assert (out["cat"] != "zz").all()


def test_minmax_scale_matches_numpy(ev):
    from feast_ray.stages.stats import add_group_minmax_scale

    df = ev.reset_index().rename(columns={"index": "rid"})
    out = (
        add_group_minmax_scale(rd.from_pandas(df[["k", "rid", "c"]]), "k", "c")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    src = df.sort_values("rid").reset_index(drop=True)
    gmin = src.groupby("k")["c"].transform("min")
    gmax = src.groupby("k")["c"].transform("max")
    want = (src["c"] - gmin) / (gmax - gmin)
    got = out["scaled"].to_numpy()
    w = want.to_numpy()
    const = (gmax == gmin).to_numpy()
    assert np.isnan(got[const]).all() if const.any() else True
    ok = ~const
    assert (got[ok] == w[ok]).all()


def test_melt_matches_pandas(ev):
    from feast_ray.stages.stats import melt, pivot_counts

    wide = pivot_counts(rd.from_pandas(ev), ["k"], "cat", ["a", "b", "c", "zz"])
    out = (
        melt(wide, ["k"], ["n_a", "n_b", "n_c", "n_zz"], var_col="m", value_col="n")
        .to_pandas()
        .sort_values(["k", "m"])
        .reset_index(drop=True)
    )
    wide_pd = (
        ev.groupby(["k", "cat"]).size().unstack(fill_value=0)
        .reindex(columns=["a", "b", "c", "zz"], fill_value=0)
        .rename(columns=lambda c: f"n_{c}")
        .reset_index()
    )
    want = (
        wide_pd.melt(id_vars="k", var_name="m", value_name="n")
        .sort_values(["k", "m"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    for c in ["k", "m", "n"]:
        assert (out[c].to_numpy() == want[c].to_numpy()).all(), c


def test_approx_quantile_clamps_out_of_range(ray_session):
    from feast_ray.stages.stats import approx_group_quantile

    df = pd.DataFrame(
        {
            "k": [1] * 6 + [2] * 3,
            "c": [-999, 0, 50, 99, 100, 10_000, 42, 42, 42],  # out-of-range both sides
        }
    )
    out = (
        approx_group_quantile(
            rd.from_pandas(df), "k", "c", {"p50": 0.5, "p100": 1.0},
            lo=0, hi=100, n_bins=10,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    width = 10
    for _, row in out.iterrows():
        vals = df.loc[df["k"] == row["k"], "c"].to_numpy()
        floored = 0 + np.clip((vals - 0) * 10 // 100, 0, 9) * width
        assert row["p50"] == _disc(floored, 0.5)
        assert row["p100"] == _disc(floored, 1.0)
    # constant group maps to its single bin
    assert out.loc[out["k"] == 2, "p50"].iloc[0] == 40


def test_group_ewma_matches_pandas_ewm(ev):
    from feast_ray.stages.stats import add_group_ewma

    rng = np.random.default_rng(11)
    df = ev.reset_index().rename(columns={"index": "rid"})
    df["x"] = rng.normal(0, 100, len(df))
    out = (
        add_group_ewma(
            rd.from_pandas(df), "k", "x", alpha=0.25,
            order_cols=["c", "rid"], out_col="y",
        )
        .to_pandas()
        .sort_values(["k", "c", "rid"])
        .reset_index(drop=True)
    )
    ordered = df.sort_values(["k", "c", "rid"]).reset_index(drop=True)
    want = (
        ordered.groupby("k")["x"].transform(lambda s: s.ewm(alpha=0.25, adjust=False).mean())
    ).to_numpy()
    assert (out["rid"].to_numpy() == ordered["rid"].to_numpy()).all()
    np.testing.assert_allclose(out["y"].to_numpy(), want, rtol=1e-12)


def test_group_ewma_rejects_nulls_and_bad_alpha(ev):
    from feast_ray.stages.stats import add_group_ewma

    df = ev.head(50).copy()
    df["x"] = np.where(df["c"] % 7 == 0, np.nan, 1.0)
    df["x"] = df["x"].astype(object).where(df["x"].notna(), None)
    with pytest.raises(Exception, match="nulls"):
        add_group_ewma(
            rd.from_pandas(df.assign(x=pd.array(df["x"], dtype="Float64"))),
            "k", "x", alpha=0.25, order_cols=["c"],
        ).materialize()
    with pytest.raises(ValueError, match="alpha"):
        add_group_ewma(rd.from_pandas(df[["k", "c"]].assign(x=1.0)), "k", "x",
                       alpha=0.0, order_cols=["c"])


def test_rollup_agg_matches_pandas(ev):
    from feast_ray.stages.stats import rollup_agg

    df = ev.copy()
    out = (
        rollup_agg(rd.from_pandas(df), ["cat", "k"], "c", count_name="n", sum_name="s")
        .to_pandas()
    )
    fin = df.groupby(["cat", "k"]).agg(n=("c", "size"), s=("c", "sum")).reset_index()
    lv1 = df.groupby("cat").agg(n=("c", "size"), s=("c", "sum")).reset_index()
    assert len(out) == len(fin) + len(lv1) + 1
    o_fin = out[out["k"].notna()].sort_values(["cat", "k"]).reset_index(drop=True)
    assert (o_fin["n"].to_numpy() == fin.sort_values(["cat", "k"])["n"].to_numpy()).all()
    assert (o_fin["s"].to_numpy() == fin.sort_values(["cat", "k"])["s"].to_numpy()).all()
    o_lv1 = out[out["k"].isna() & out["cat"].notna()].sort_values("cat").reset_index(drop=True)
    assert (o_lv1["s"].to_numpy() == lv1.sort_values("cat")["s"].to_numpy()).all()
    o_tot = out[out["cat"].isna()]
    assert len(o_tot) == 1
    assert int(o_tot["n"].iloc[0]) == len(df) and int(o_tot["s"].iloc[0]) == int(df["c"].sum())
    with pytest.raises(ValueError, match="keys"):
        rollup_agg(rd.from_pandas(df), [], "c")


def test_group_ffill_matches_pandas(ev):
    from feast_ray.stages.stats import add_group_ffill

    rng = np.random.default_rng(19)
    df = ev.reset_index().rename(columns={"index": "rid"})
    x = rng.normal(size=len(df))
    x[rng.random(len(df)) < 0.6] = np.nan
    df["x"] = x
    out = (
        add_group_ffill(
            rd.from_pandas(df), "k", ["x"], order_cols=["c", "rid"]
        )
        .to_pandas()
        .sort_values(["k", "c", "rid"])
        .reset_index(drop=True)
    )
    ordered = df.sort_values(["k", "c", "rid"]).reset_index(drop=True)
    want = ordered.groupby("k")["x"].ffill().to_numpy()
    got = out["x_ffill"].to_numpy()
    assert (out["rid"].to_numpy() == ordered["rid"].to_numpy()).all()
    assert ((np.isnan(got) & np.isnan(want)) | (got == want)).all()
    # leading rows of some group stay NaN (no cross-group carry)
    heads = out.groupby("k").head(1)
    assert heads["x_ffill"].isna().any() or ordered.groupby("k")["x"].apply(
        lambda s: s.notna().iloc[0]
    ).all()


def test_grouped_mode_matches_pandas(ev):
    from feast_ray.stages.stats import grouped_mode

    df = ev.copy()
    df.loc[df.index % 13 == 0, "cat"] = None  # nulls ignored
    out = (
        grouped_mode(rd.from_pandas(df), "k", "cat", value_name="m", count_name="mn")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = {}
    for k, g in df.groupby("k"):
        vc = g["cat"].dropna().value_counts()
        if len(vc) == 0:
            want[k] = (None, 0)
        else:
            best = vc[vc == vc.max()].index.min()
            want[k] = (best, int(vc.max()))
    assert len(out) == len(want)
    for _, r in out.iterrows():
        wm, wn = want[r["k"]]
        assert (r["m"] == wm or (wm is None and pd.isna(r["m"]))) and r["mn"] == wn


def test_grouped_mode_all_null_group(ray_session):
    from feast_ray.stages.stats import grouped_mode

    df = pd.DataFrame({"k": [1, 1, 2], "cat": [None, None, "x"]})
    out = grouped_mode(rd.from_pandas(df), "k", "cat").to_pandas().sort_values("k")
    assert pd.isna(out.iloc[0]["mode"]) and out.iloc[0]["mode_n"] == 0
    assert out.iloc[1]["mode"] == "x" and out.iloc[1]["mode_n"] == 1


def test_grouped_ols_matches_numpy(ev):
    from feast_ray.stages.stats import grouped_ols

    rng = np.random.default_rng(23)
    df = ev.copy()
    df["x"] = rng.integers(0, 1000, len(df))
    out = (
        grouped_ols(rd.from_pandas(df), "k", "x", "c",
                    slope_name="b", intercept_name="a", count_col="n")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    for _, r in out.iterrows():
        g = df[df["k"] == r["k"]]
        assert r["n"] == len(g)
        b, a = np.polyfit(g["x"].to_numpy(float), g["c"].to_numpy(float), 1)
        np.testing.assert_allclose(r["b"], b, rtol=1e-9)
        np.testing.assert_allclose(r["a"], a, rtol=1e-9)
    # degenerate groups: single row and zero x-variance -> NULL
    dd = pd.DataFrame({"k": [1, 2, 2], "x": [5, 7, 7], "c": [1, 2, 3]})
    out2 = grouped_ols(rd.from_pandas(dd), "k", "x", "c",
                       slope_name="b", intercept_name="a").to_pandas()
    assert out2["b"].isna().all() and out2["a"].isna().all()


def test_epoch_shuffle_index_is_reproducible_permutation(ray_session):
    from feast_ray.stages.sampling import epoch_shuffle_index, mix64

    rng = np.random.default_rng(3)
    ids = rng.permutation(5000).astype(np.int64)
    df = pd.DataFrame({"eid": ids, "x": rng.normal(size=len(ids))})

    def run(nb):
        return (
            epoch_shuffle_index(
                rd.from_pandas(df).repartition(7), key_col="eid",
                keep_cols=["eid"], num_buckets=nb,
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )

    out = run(4)
    # exact permutation of 0..n-1
    assert sorted(out["shuffle_pos"]) == list(range(len(df)))
    # order matches unsigned mix64 order
    order = np.argsort(mix64(out["eid"].to_numpy(np.int64)), kind="stable")
    got_sorted = out["shuffle_pos"].to_numpy()[order]
    assert (got_sorted == np.arange(len(df))).all()
    # identical on a different cluster shape
    out2 = run(11)
    assert (out2["shuffle_pos"].to_numpy() == out["shuffle_pos"].to_numpy()).all()


def test_kanon_filter_keep_drop_partition(ev):
    from feast_ray.stages.sampling import kanon_filter

    df = ev.reset_index().rename(columns={"index": "rid"})
    K = 15
    keep = kanon_filter(rd.from_pandas(df), ["k", "cat"], K).to_pandas()
    drop = kanon_filter(rd.from_pandas(df), ["k", "cat"], K, mode="drop").to_pandas()
    sizes = df.groupby(["k", "cat"]).size()
    for _, r in keep.iterrows():
        assert sizes.loc[(r["k"], r["cat"])] >= K
    for _, r in drop.iterrows():
        assert sizes.loc[(r["k"], r["cat"])] < K
    assert len(keep) + len(drop) == len(df)
    assert set(keep["rid"]) | set(drop["rid"]) == set(df["rid"])
    with pytest.raises(ValueError):
        kanon_filter(rd.from_pandas(df), ["k"], 0)


def test_global_order_index_matches_pandas(ray_session):
    from feast_ray.stages.stats import global_order_index

    rng = np.random.default_rng(31)
    n = 4003  # not divisible by the tile count -> uneven NTILE sizes
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            # heavy ties + negatives + a hot value to stress one range
            "v": np.concatenate(
                [rng.integers(-50, 50, n - 500), np.full(500, 7, dtype=np.int64)]
            ),
        }
    )
    out = (
        global_order_index(
            rd.from_pandas(df).repartition(6), "v", tiebreak="rid",
            ntile=7, ntile_name="t7", bucket_bits=4, num_buckets=3,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ordered = df.sort_values(["v", "rid"]).reset_index(drop=True)
    want_rank = pd.Series(np.arange(n), index=ordered["rid"]).sort_index().to_numpy()
    assert (out["global_rank"].to_numpy() == want_rank).all()
    # SQL NTILE: first n%k tiles one row larger
    base, extra = n // 7, n % 7
    r = out["global_rank"].to_numpy()
    want_tile = np.where(
        r < extra * (base + 1), r // (base + 1) + 1,
        extra + (r - extra * (base + 1)) // base + 1,
    )
    assert (out["t7"].to_numpy() == want_tile).all()
    sizes = out.groupby("t7").size()
    assert sizes.max() - sizes.min() <= 1 and len(sizes) == 7


def test_group_mean_impute_matches_pandas(ev):
    from feast_ray.stages.stats import add_group_mean_impute

    df = ev.reset_index().rename(columns={"index": "rid"}).copy()
    df["x"] = df["c"].where(df["c"] % 3 != 0, other=pd.NA).astype("Int64")
    df.loc[df["k"] == 5, "x"] = pd.NA  # an all-NULL group
    out = (
        add_group_mean_impute(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            "k", "x", out_col="f",
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    means = df.groupby("k")["x"].mean()
    want = df["x"].astype("Float64").to_numpy(dtype=float, na_value=np.nan)
    fill = df["k"].map(means).astype(float).to_numpy()
    want = np.where(np.isnan(want), fill, want)
    got = out.sort_values("rid")["f"].to_numpy(dtype=float, na_value=np.nan)
    assert ((np.isnan(got) & np.isnan(want)) | np.isclose(got, want, rtol=1e-12, equal_nan=False)).all()
    assert out[out["k"] == 5]["f"].isna().all()


def test_grouped_interarrival_matches_pandas(ray_session):
    from feast_ray.stages.stats import grouped_interarrival

    rng = np.random.default_rng(41)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 23, n),
            "us": rng.integers(0, 10**9, n).astype(np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    # a single-row entity and a zero-span entity
    df = pd.concat(
        [df, pd.DataFrame({"k": [50, 51, 51], "us": [5, 9, 9], "v": [3, 4, 6],
                           "rid": [n, n + 1, n + 2]})],
        ignore_index=True,
    )
    out = (
        grouped_interarrival(
            rd.from_pandas(df), "k", "us", val_col="v",
            order_tiebreak="rid", twa_name="twa",
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    for _, r in out.iterrows():
        g = df[df["k"] == r["k"]].sort_values(["us", "rid"])
        assert r["n"] == len(g)
        if len(g) < 2:
            assert pd.isna(r["mean_gap_s"]) and pd.isna(r["max_gap_s"]) and pd.isna(r["twa"])
            continue
        gaps = (g["us"].to_numpy()[1:] - g["us"].to_numpy()[:-1]) // 1_000_000
        np.testing.assert_allclose(r["mean_gap_s"], gaps.sum() / len(gaps), rtol=1e-12)
        assert r["max_gap_s"] == gaps.max()
        w = gaps.sum()
        if w > 0:
            want = (g["v"].to_numpy()[:-1] * gaps).sum() / w
            np.testing.assert_allclose(r["twa"], want, rtol=1e-12)
        else:
            assert pd.isna(r["twa"])
    k51 = out[out["k"] == 51].iloc[0]
    assert k51["max_gap_s"] == 0 and pd.isna(k51["twa"])  # zero span


def test_upsample_mix_matches_python(ray_session):
    from feast_ray.stages.sampling import mix64, upsample_mix

    df = pd.DataFrame(
        {
            "g": ["a", "b", "a", "c", "b", "a"] * 50,
            "kid": np.arange(300, dtype=np.int64),
        }
    )
    out = (
        upsample_mix(
            rd.from_pandas(df), group_col="g", key_col="kid",
            factors={"a": 100, "b": 250, "c": 0}, default_times100=100,
        )
        .to_pandas()
        .sort_values(["kid", "copy_idx"])
        .reset_index(drop=True)
    )
    want = []
    f = {"a": 100, "b": 250, "c": 0}
    for _, r in df.sort_values("kid").iterrows():
        t100 = f[r["g"]]
        # int() BEFORE the modulo: a uint64 scalar % python-int promotes to
        # float64 and rounds the 64-bit hash
        rep = t100 // 100 + (int(mix64(np.array([r["kid"]]))[0]) % 100 < t100 % 100)
        for c in range(rep):
            want.append((r["g"], r["kid"], c))
    assert list(map(tuple, out[["g", "kid", "copy_idx"]].itertuples(index=False))) == want
    # x2.5 group averages ~2.5 copies; x0 group vanishes
    assert (out["g"] != "c").all()
    b = out[out["g"] == "b"].groupby("kid").size()
    assert set(b.unique()) <= {2, 3} and 2.0 < b.mean() < 3.0


def test_new_stages_handle_empty_input(ray_session):
    """0-row (schema-ful) input -> 0-row output with the declared columns,
    for every round-3 stage (empty-block schema hygiene)."""
    import pyarrow as pa

    from feast_ray.stages.asof import range_agg_forward
    from feast_ray.stages.sampling import kanon_filter, upsample_mix
    from feast_ray.stages.stats import (
        add_group_ewma,
        add_group_ffill,
        add_group_mean_impute,
        grouped_interarrival,
        grouped_mode,
    )
    from feast_ray.stages.text import chunk_texts
    from feast_ray.stages.windows import densify_calendar

    empty = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "ts": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "c": pa.array([], pa.int64()),
            "g": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
        }
    )
    eds = rd.from_arrow(empty)
    checks = [
        (add_group_ewma(eds, "k", "x", alpha=0.25, order_cols=["ts"]), "ewma"),
        (add_group_ffill(eds, "k", ["x"], order_cols=["ts"]), "x_ffill"),
        (add_group_mean_impute(eds, "k", "c", out_col="f"), "f"),
        (grouped_mode(eds, "k", "g"), "mode"),
        (grouped_interarrival(eds, "k", "ts", val_col="c"), "mean_gap_s"),
        (kanon_filter(eds, ["k", "g"], 3), "k"),
        (upsample_mix(eds, group_col="g", key_col="k", factors={}), "copy_idx"),
        (chunk_texts(eds.select_columns(["doc_id", "text"])), "chunk_text"),
        (densify_calendar(eds.select_columns(["k", "ts"]), "k", "ts"), "n"),
        (
            range_agg_forward(
                eds.select_columns(["k", "ts"]),
                eds.select_columns(["k", "ts", "c"]),
                key="k", window_us=10, val_col="c",
            ),
            "n_window",
        ),
    ]
    for ds, col in checks:
        out = ds.to_pandas()
        assert len(out) == 0, col
        # grouped stages lose the schema on zero-TOTAL-row inputs (ray 2.49
        # from_arrow_refs drops empty-block schemas — documented in
        # grouped.py); map-only stages keep it
        if len(out.columns):
            assert col in out.columns, (col, list(out.columns))


def test_partial_count_sum_matches_pandas(ev):
    from feast_ray.stages.stats import partial_count_sum

    df = ev.copy()
    df["v"] = df["c"] * 3
    df.loc[df.index % 11 == 0, "v"] = pd.NA
    df["v"] = df["v"].astype("Int64")
    tbl = pa.Table.from_pandas(df[["k", "cat", "v"]], preserve_index=False)
    out = (
        partial_count_sum(
            rd.from_arrow(tbl).repartition(5), ["k", "cat"], "v",
            count_name="n", sum_name="s",
        )
        .to_pandas().sort_values(["k", "cat"]).reset_index(drop=True)
    )
    want = (
        df.groupby(["k", "cat"])
        .agg(n=("v", "size"), s=("v", lambda x: int(x.fillna(0).sum())))
        .reset_index()
        .sort_values(["k", "cat"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    assert (out["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (out["s"].to_numpy() == want["s"].to_numpy()).all()


def test_rolling_corr_matches_pandas(ev):
    from feast_ray.stages.stats import add_group_rolling_corr

    rng = np.random.default_rng(77)
    df = ev.reset_index().rename(columns={"index": "rid"}).copy()
    df["x"] = rng.integers(-50, 50, len(df))
    df["y"] = df["x"] * 2 + rng.integers(-30, 30, len(df))
    K = 8
    out = (
        add_group_rolling_corr(
            rd.from_pandas(df), "k", "x", "y", k=K,
            order_cols=["c", "rid"], out_col="rc",
        )
        .to_pandas().sort_values(["k", "c", "rid"]).reset_index(drop=True)
    )
    ordered = df.sort_values(["k", "c", "rid"]).reset_index(drop=True)
    want = (
        ordered.groupby("k")
        .apply(lambda g: g["x"].rolling(K, min_periods=1).corr(g["y"]))
        .reset_index(drop=True)
        .to_numpy()
    )
    got = out["rc"].to_numpy()
    # pandas emits NaN where we emit null; zero-variance windows also NaN
    both_nan = np.isnan(got) & (np.isnan(want) | np.isinf(want))
    assert (both_nan | np.isclose(got, want, rtol=1e-9, equal_nan=False)).all()
    # single-row windows are NULL (n < 2)
    heads = out.groupby("k").head(1)
    assert heads["rc"].isna().all()


def test_rolling_zscore_matches_pandas(ev):
    from feast_ray.stages.stats import add_group_rolling_zscore

    df = ev.reset_index().rename(columns={"index": "rid"})
    K = 6
    out = (
        add_group_rolling_zscore(
            rd.from_pandas(df[["k", "c", "rid"]]), "k", "c", k=K,
            order_cols=["rid"], out_col="z",
        )
        .to_pandas().sort_values(["k", "rid"]).reset_index(drop=True)
    )
    ordered = df.sort_values(["k", "rid"]).reset_index(drop=True)
    g = ordered.groupby("k")["c"]
    mean = g.transform(lambda s: s.rolling(K, min_periods=1).mean())
    std = g.transform(lambda s: s.rolling(K, min_periods=1).std(ddof=0))
    want = ((ordered["c"] - mean) / std).to_numpy()
    got = out["z"].to_numpy()
    both_nan = np.isnan(got) & (np.isnan(want) | np.isinf(want))
    assert (both_nan | np.isclose(got, want, rtol=1e-9, equal_nan=False)).all()
    assert out.groupby("k").head(1)["z"].isna().all()  # n=1 windows NULL
