"""As-of join (J1/J4) vs the pandas oracle: TTL bounds, created_ts
tie-breaks, duplicate spine rows, misses => nulls, zero temporal leakage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from feast_ray.stages.asof import asof_join, asof_join_broadcast
from tests.oracle import oracle_asof
from tests.util import assert_frames_match

TTL_US = 3600 * 1_000_000
ROWKEY = ["conv_id", "ts", "turn_idx"]
FEATS = ["msg_len", "value"]


def _spine_sample(spine_tbl: pa.Table, n: int = 400) -> pa.Table:
    idx = np.random.default_rng(5).choice(spine_tbl.num_rows, size=n, replace=False)
    return spine_tbl.take(pa.array(np.sort(idx)))


@pytest.fixture(scope="module")
def small_spine(spine_tbl):
    return _spine_sample(spine_tbl)


@pytest.fixture(scope="module")
def oracle_no_ttl(small_spine, features_tbl):
    return oracle_asof(
        small_spine.to_pandas(),
        features_tbl.to_pandas(),
        key="conv_id",
        created_ts="created_ts",
        ttl_us=None,
        feature_cols=FEATS,
    )


@pytest.fixture(scope="module")
def oracle_ttl(small_spine, features_tbl):
    return oracle_asof(
        small_spine.to_pandas(),
        features_tbl.to_pandas(),
        key="conv_id",
        created_ts="created_ts",
        ttl_us=TTL_US,
        feature_cols=FEATS,
    )


def test_asof_no_ttl(ray_session, small_spine, features_tbl, oracle_no_ttl):
    import ray.data as rd

    got = asof_join(
        rd.from_arrow(small_spine),
        rd.from_arrow(features_tbl),
        key="conv_id",
        created_ts="created_ts",
        ttl_us=None,
        matched_ts_name="__matched_ts",
        num_buckets=6,
    ).to_pandas()
    assert_frames_match(got, oracle_no_ttl, row_key=ROWKEY, cols=FEATS + ["__matched_ts"])


def test_asof_with_ttl(ray_session, small_spine, features_tbl, oracle_ttl):
    import ray.data as rd

    got = asof_join(
        rd.from_arrow(small_spine),
        rd.from_arrow(features_tbl),
        key="conv_id",
        created_ts="created_ts",
        ttl_us=TTL_US,
        matched_ts_name="__matched_ts",
        num_buckets=6,
    ).to_pandas()
    assert_frames_match(got, oracle_ttl, row_key=ROWKEY, cols=FEATS + ["__matched_ts"])
    # zero temporal leakage: matched feature ts never exceeds entity ts
    m = got["__matched_ts"].notna()
    assert (got.loc[m, "__matched_ts"] <= got.loc[m, "ts"]).all()
    # TTL honored
    assert (
        got.loc[m, "ts"].astype("int64") - got.loc[m, "__matched_ts"].astype("int64") <= TTL_US
    ).all()


def test_asof_preserves_spine_multiplicity(ray_session, small_spine, features_tbl):
    import ray.data as rd

    doubled = pa.concat_tables([small_spine, small_spine])
    got = asof_join(
        rd.from_arrow(doubled),
        rd.from_arrow(features_tbl),
        key="conv_id",
        created_ts="created_ts",
        ttl_us=TTL_US,
        num_buckets=4,
    )
    assert got.count() == doubled.num_rows


def test_asof_tie_break_created_ts(ray_session):
    """Two feature rows at the same event ts: the larger created_ts wins."""
    import ray.data as rd

    ts = pa.array([1_000_000], type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    spine = pa.table({"conv_id": ["a"], "ts": ts})
    fts = pa.array([1_000_000, 1_000_000], type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    cts = pa.array([5, 9], type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    feats = pa.table({"conv_id": ["a", "a"], "ts": fts, "created_ts": cts, "v": [1.0, 2.0]})
    got = asof_join(
        rd.from_arrow(spine),
        rd.from_arrow(feats),
        key="conv_id",
        created_ts="created_ts",
        num_buckets=2,
    ).to_pandas()
    assert got["v"].tolist() == [2.0]


def test_asof_miss_yields_nulls(ray_session):
    import ray.data as rd

    ts = pa.array([10], type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    spine = pa.table({"conv_id": ["zzz"], "ts": ts})
    fts = pa.array([5], type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    feats = pa.table({"conv_id": ["other"], "ts": fts, "v": [1.0]})
    got = asof_join(
        rd.from_arrow(spine), rd.from_arrow(feats), key="conv_id", num_buckets=2
    ).to_pandas()
    assert len(got) == 1 and got["v"].isna().all()


def test_asof_prefix_naming(ray_session, small_spine, features_tbl):
    import ray.data as rd

    got = asof_join(
        rd.from_arrow(small_spine.take(pa.array(range(20)))),
        rd.from_arrow(features_tbl),
        key="conv_id",
        created_ts="created_ts",
        prefix="convfeat",
        num_buckets=2,
    )
    names = got.schema().names
    assert "convfeat__msg_len" in names and "convfeat__value" in names


def test_asof_broadcast_matches_shuffle(ray_session, small_spine, features_tbl, oracle_ttl):
    import ray.data as rd

    got = asof_join_broadcast(
        rd.from_arrow(small_spine),
        features_tbl,
        key="conv_id",
        created_ts="created_ts",
        ttl_us=TTL_US,
        concurrency=2,
        batch_size=128,
    ).to_pandas()
    assert_frames_match(got, oracle_ttl, row_key=ROWKEY, cols=FEATS)


def test_multi_view_equals_iterative(ray_session, small_spine, features_tbl):
    """asof_join_multi (one co-shuffle) must equal view-by-view asof_join
    composition, including created_ts tie-breaks and matched ts."""
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.asof import AsofView, asof_join, asof_join_multi

    spine_ds = rd.from_arrow(small_spine)
    feat_ds = rd.from_arrow(features_tbl)
    it = asof_join(
        spine_ds, feat_ds, key="conv_id", created_ts="created_ts",
        ttl_us=3600 * 1_000_000, feature_cols=["msg_len", "value"],
        prefix="fv", matched_ts_name="m_ts",
    ).to_pandas()
    multi = asof_join_multi(
        spine_ds,
        [AsofView(feat_ds, created_ts="created_ts", ttl_us=3600 * 1_000_000,
                  feature_cols=["msg_len", "value"], prefix="fv",
                  matched_ts_name="m_ts")],
        key="conv_id",
    ).to_pandas()
    key = ["conv_id", "ts", "turn_idx"]
    it = it.sort_values(key, kind="stable").reset_index(drop=True)
    multi = multi.sort_values(key, kind="stable").reset_index(drop=True)
    assert len(it) == len(multi)
    for c in ["fv__msg_len", "fv__value", "m_ts"]:
        gv, wv = multi[c], it[c]
        if pd.api.types.is_float_dtype(wv):
            ga, wa = gv.to_numpy(dtype=float), wv.to_numpy(dtype=float)
            assert ((np.isnan(ga) & np.isnan(wa)) | np.isclose(ga, wa, equal_nan=True)).all(), c
        else:
            assert gv.where(gv.notna(), None).tolist() == wv.where(wv.notna(), None).tolist(), c


def test_multi_view_all_null_agg_segment_yields_null(ray_session):
    """Regression: an all-null (key, ts) tie segment must join as NULL, not
    -inf / +inf / 0.0 (SQL aggregate-over-nulls semantics)."""
    import ray.data as rd

    from feast_ray.stages.asof import AsofView, asof_join_multi

    spine = rd.from_arrow(
        pa.table({"k": ["a"], "ts": pa.array([1000], type=pa.int64())})
    )
    feats = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a"],
                "ts": pa.array([500, 500], type=pa.int64()),
                "value": pa.array([None, None], type=pa.float64()),
            }
        )
    )
    out = asof_join_multi(
        spine,
        [
            AsofView(
                feats,
                agg={
                    "v_max": ("max", "value"),
                    "v_min": ("min", "value"),
                    "v_sum": ("sum", "value"),
                    "v_mean": ("mean", "value"),
                    "n": ("count", None),
                },
            )
        ],
        key="k",
        spine_ts="ts",
        num_buckets=2,
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    for c in ("v_max", "v_min", "v_sum", "v_mean"):
        assert row[c] is None or (isinstance(row[c], float) and np.isnan(row[c])), (c, row[c])
    assert row["n"] == 2  # the match itself exists: count(*) = 2


def test_asof_composite_keys(ray_session):
    """Two-join-key as-of (Entity.join_keys of length 2) vs pandas
    merge_asof(by=[k1, k2])."""
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(3)
    n_f, n_s = 400, 150
    feats = pd.DataFrame(
        {
            "k1": rng.integers(0, 5, n_f),
            "k2": rng.integers(0, 3, n_f),
            "ts": rng.integers(0, 10_000, n_f).astype("int64"),
            "fv": rng.normal(size=n_f),
        }
    ).drop_duplicates(subset=["k1", "k2", "ts"]).sort_values("ts")
    spine = pd.DataFrame(
        {
            "k1": rng.integers(0, 5, n_s),
            "k2": rng.integers(0, 3, n_s),
            "ts": rng.integers(0, 10_000, n_s).astype("int64"),
            "sid": np.arange(n_s, dtype="int64"),
        }
    ).sort_values("ts")
    got = (
        asof_join(
            rd.from_pandas(spine),
            rd.from_pandas(feats),
            key=["k1", "k2"],
            ttl_us=2_000,
            feature_cols=["fv"],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        spine, feats, on="ts", by=["k1", "k2"], tolerance=2_000, direction="backward"
    ).sort_values("sid").reset_index(drop=True)
    assert len(got) == len(want)
    gv, wv = got["fv"].to_numpy(), want["fv"].to_numpy()
    assert ((np.isnan(gv) & np.isnan(wv)) | np.isclose(gv, wv, equal_nan=True)).all()


def test_interval_join_matches_pandas(ray_session):
    """Validity-window join vs a pandas oracle on SCD-2 style intervals."""
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.asof import interval_join

    rng = np.random.default_rng(9)
    rows = []
    for k in range(8):
        t = 0
        for ver in range(rng.integers(1, 6)):
            start = t + int(rng.integers(1, 50))
            end = start + int(rng.integers(1, 40))
            rows.append((k, start, end, float(ver)))
            t = end + int(rng.integers(0, 30))  # gaps between intervals
    iv = pd.DataFrame(rows, columns=["k", "valid_from", "valid_to", "ver"])
    # last interval of key 0 open-ended
    iv.loc[iv[iv.k == 0].index[-1], "valid_to"] = np.nan
    iv["valid_from"] = iv["valid_from"].astype("int64")
    spine = pd.DataFrame(
        {
            "k": rng.integers(0, 8, 200),
            "ts": rng.integers(0, 300, 200).astype("int64"),
            "sid": np.arange(200, dtype="int64"),
        }
    )
    got = (
        interval_join(
            rd.from_pandas(spine),
            rd.from_pandas(iv),
            key="k",
            spine_ts="ts",
            feature_cols=["ver"],
            matched_start_name="vf",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )

    def oracle(row):
        m = iv[(iv.k == row.k) & (iv.valid_from <= row.ts)
               & (iv.valid_to.isna() | (row.ts < iv.valid_to))]
        return m["ver"].iloc[-1] if len(m) else np.nan

    want = spine.sort_values("sid").reset_index(drop=True)
    want_ver = want.apply(oracle, axis=1)
    gv, wv = got["ver"].to_numpy(), want_ver.to_numpy()
    assert ((np.isnan(gv) & np.isnan(wv)) | np.isclose(gv, wv, equal_nan=True)).all()
    # matched start only present when matched
    assert (got["vf"].notna() == got["ver"].notna()).all()


def test_asof_forward_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(21)
    n_s, n_f = 800, 600
    spine = pd.DataFrame(
        {
            "k": rng.integers(0, 17, n_s),
            "ts": rng.integers(0, 100_000, n_s).astype("datetime64[us]"),
            "sid": np.arange(n_s),
        }
    )
    feats = pd.DataFrame(
        {
            "k": rng.integers(0, 17, n_f),
            "ts": rng.integers(0, 100_000, n_f).astype("datetime64[us]"),
            "fid": np.arange(n_f),
            "x": rng.normal(size=n_f),
        }
    )
    from feast_ray.stages.asof import asof_join_forward

    look = 20_000
    out = (
        asof_join_forward(
            rd.from_pandas(spine),
            rd.from_pandas(feats),
            key="k",
            tie_col="fid",
            lookahead_us=look,
            feature_cols=["x"],
            matched_ts_name="m_ts",
        )
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    # oracle: earliest feature with ts >= spine ts (<= ts+look), min fid tie
    f_sorted = feats.sort_values(["k", "ts", "fid"])
    want_x, want_m = [], []
    for _, row in spine.sort_values("sid").iterrows():
        cand = f_sorted[
            (f_sorted["k"] == row["k"])
            & (f_sorted["ts"] >= row["ts"])
            & (f_sorted["ts"] <= row["ts"] + pd.Timedelta(microseconds=look))
        ]
        if len(cand):
            want_x.append(cand.iloc[0]["x"])
            want_m.append(cand.iloc[0]["ts"])
        else:
            want_x.append(np.nan)
            want_m.append(pd.NaT)
    assert len(out) == n_s
    got_x = out["x"].to_numpy()
    wx = np.array(want_x)
    assert ((np.isnan(got_x) & np.isnan(wx)) | (got_x == wx)).all()
    assert (
        out["m_ts"].astype("datetime64[us]").fillna(pd.Timestamp(0)).to_numpy()
        == pd.Series(want_m).astype("datetime64[us]").fillna(pd.Timestamp(0)).to_numpy()
    ).all()


def test_asof_nearest_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(33)
    n_s, n_f = 700, 500
    spine = pd.DataFrame(
        {
            "k": rng.integers(0, 13, n_s),
            "ts": rng.integers(0, 80_000, n_s).astype("datetime64[us]"),
            "sid": np.arange(n_s),
        }
    )
    feats = pd.DataFrame(
        {
            "k": rng.integers(0, 13, n_f),
            "ts": rng.integers(0, 80_000, n_f).astype("datetime64[us]"),
            "fid": np.arange(n_f),
            "x": rng.normal(size=n_f),
        }
    )
    from feast_ray.stages.asof import asof_join_nearest

    tol = 90
    out = (
        asof_join_nearest(
            rd.from_pandas(spine),
            rd.from_pandas(feats),
            key="k",
            tie_col="fid",
            tolerance_us=tol,
            feature_cols=["x"],
            matched_ts_name="m_ts",
        )
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    # brute-force oracle of the documented rule: min |dt| within tol;
    # equal distance -> backward; equal ts behind -> max fid; ahead -> min fid
    want_x = []
    for _, row in spine.sort_values("sid").iterrows():
        cand = feats[feats["k"] == row["k"]].copy()
        cand["dt"] = (cand["ts"] - row["ts"]).dt.total_seconds() * 1e6
        cand = cand[cand["dt"].abs() <= tol]
        if len(cand):
            cand = cand.assign(
                adist=cand["dt"].abs(),
                ahead=cand["dt"] > 0,
                tie=np.where(cand["dt"] <= 0, -cand["fid"], cand["fid"]),
            ).sort_values(["adist", "ahead", "tie"])
            want_x.append(cand.iloc[0]["x"])
        else:
            want_x.append(np.nan)
    got_x = out["x"].to_numpy()
    wx = np.array(want_x)
    assert len(out) == n_s
    assert ((np.isnan(got_x) & np.isnan(wx)) | (got_x == wx)).all()
    # some hits and some misses exercised
    assert np.isnan(got_x).any() and (~np.isnan(got_x)).any()


def test_range_agg_forward_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.asof import range_agg_forward

    rng = np.random.default_rng(44)
    n_s, n_e = 600, 800
    spine = pd.DataFrame(
        {
            "k": rng.integers(0, 11, n_s),
            "ts": rng.integers(0, 50_000, n_s).astype("datetime64[us]"),
            "sid": np.arange(n_s),
        }
    )
    ev = pd.DataFrame(
        {
            "k": rng.integers(0, 11, n_e),
            "ts": rng.integers(0, 50_000, n_e).astype("datetime64[us]"),
            "v": rng.integers(-50, 50, n_e),
        }
    )
    # nulls in the value column: count, but add 0
    ev["v"] = ev["v"].astype("Int64")
    ev.loc[ev.index % 9 == 0, "v"] = pd.NA
    # one key whose spine rows all precede its events (exercises the
    # window-before-first-event lower clip)
    spine.loc[spine["k"] == 3, "ts"] = np.datetime64(0, "us")
    ev.loc[ev["k"] == 3, "ts"] = np.datetime64(40_000, "us")

    W = 4_000
    out = (
        range_agg_forward(
            rd.from_pandas(spine),
            rd.from_pandas(ev),
            key="k",
            window_us=W,
            val_col="v",
            count_name="n_w",
            sum_name="s_w",
        )
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    assert len(out) == n_s
    for _, row in spine.iterrows():
        m = ev[
            (ev["k"] == row["k"])
            & (ev["ts"] > row["ts"])
            & (ev["ts"] <= row["ts"] + pd.Timedelta(microseconds=W))
        ]
        got = out[out["sid"] == row["sid"]].iloc[0]
        assert got["n_w"] == len(m), (row["sid"], got["n_w"], len(m))
        assert got["s_w"] == int(m["v"].fillna(0).sum()), row["sid"]
    # the clipped key produced all-zero windows
    assert (out[out["k"] == 3]["n_w"] == 0).all()


def test_asof_last_n_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.asof import asof_join_last_n

    rng = np.random.default_rng(55)
    n_s, n_f = 500, 400
    spine = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n_s),
            "ts": rng.integers(0, 60_000, n_s).astype("datetime64[us]"),
            "sid": np.arange(n_s),
        }
    )
    feats = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n_f),
            "ts": rng.integers(0, 60_000, n_f).astype("datetime64[us]"),
            "fid": np.arange(n_f),
            "x": rng.normal(size=n_f),
        }
    )
    ttl = 9_000
    out = (
        asof_join_last_n(
            rd.from_pandas(spine), rd.from_pandas(feats),
            key="k", n_last=3, tie_col="fid", ttl_us=ttl, feature_cols=["x"],
        )
        .to_pandas().sort_values("sid").reset_index(drop=True)
    )
    assert len(out) == n_s
    f_sorted = feats.sort_values(["ts", "fid"], ascending=[False, False])
    for _, row in spine.iterrows():
        cand = f_sorted[
            (f_sorted["k"] == row["k"])
            & (f_sorted["ts"] <= row["ts"])
            & (f_sorted["ts"] >= row["ts"] - pd.Timedelta(microseconds=ttl))
        ]
        got = out[out["sid"] == row["sid"]].iloc[0]
        for s in range(1, 4):
            want = cand.iloc[s - 1]["x"] if len(cand) >= s else np.nan
            g = got[f"x_{s}"]
            assert (np.isnan(g) and np.isnan(want)) or g == want, (row["sid"], s)
    # slots fill left to right: a null slot s implies null s+1
    for s in (1, 2):
        assert not ((out[f"x_{s}"].isna()) & (out[f"x_{s+1}"].notna())).any()
