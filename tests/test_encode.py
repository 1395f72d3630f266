"""Feature-encoding stages (encode.py), cube_agg, grouped_autocorr and
rolling_distinct vs pandas / brute-force oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa
import ray.data as rd

from feast_ray.stages.encode import (
    group_ntile,
    negative_samples,
    share_of_entity,
    target_encode,
)
from feast_ray.stages.sampling import mix64


@pytest.fixture()
def ev(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "user": rng.integers(0, 41, n),
            "cat": rng.choice(["a", "b", "c", "dd", "e"], n),
            "cents": rng.integers(-200, 9_000, n).astype(np.int64),
        }
    )
    # a singleton category and some NULL targets
    df.loc[0, "cat"] = "only_once"
    cents = df["cents"].astype("Int64")
    cents.iloc[5:25] = pd.NA
    df["cents"] = cents
    return df


def _ds(df):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_target_encode_matches_pandas(ev):
    out = (
        target_encode(_ds(ev), key_col="cat", cents_col="cents")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    g = ev.groupby("cat")["cents"]
    na = ev.groupby("cat").size()
    nv = g.count()
    s = g.sum()
    exp_freq = ev["cat"].map(na).astype(np.int64)
    assert (out["freq"].to_numpy() == exp_freq.to_numpy()).all()
    for i in range(len(ev)):
        cat = ev.loc[i, "cat"]
        c = ev.loc[i, "cents"]
        if pd.isna(c):
            exp = float(s[cat]) / float(nv[cat]) if nv[cat] > 0 else None
        elif nv[cat] <= 1:
            exp = None
        else:
            exp = (float(s[cat]) - float(c)) / float(nv[cat] - 1)
        got = out.loc[i, "loo_mean_cents"]
        if exp is None:
            assert pd.isna(got)
        else:
            assert got == exp  # single float division of exact ints


def test_target_encode_singleton_category_null(ev):
    out = target_encode(_ds(ev), key_col="cat", cents_col="cents").to_pandas()
    row = out[out["cat"] == "only_once"]
    assert len(row) == 1
    assert row["freq"].iloc[0] == 1
    assert row["loo_mean_cents"].isna().all()


def _sql_ntile(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    q, r = divmod(n, k)
    out = np.empty(len(rank), dtype=np.int64)
    for i, rk in enumerate(rank):
        if rk < r * (q + 1):
            out[i] = rk // (q + 1) + 1
        else:
            out[i] = r + (rk - r * (q + 1)) // q + 1
    return out


def test_group_ntile_matches_sql_rule(ev):
    df = ev.dropna(subset=["cents"]).copy()
    df["cents"] = df["cents"].astype(np.int64)
    out = (
        group_ntile(
            _ds(df), keys="user", val_col="cents", k=4,
            tie_cols=["id"], tile_name="tile",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = {}
    for _, grp in df.sort_values(["cents", "id"]).groupby("user"):
        n = len(grp)
        tiles = _sql_ntile(np.arange(n), n, 4)
        for row_id, t in zip(grp["id"].to_numpy(), tiles):
            exp[row_id] = t
    got = dict(zip(out["id"].to_numpy(), out["tile"].to_numpy()))
    assert got == exp


def test_group_ntile_group_smaller_than_k(ray_session):
    df = pd.DataFrame({"user": [1, 1, 2], "v": [5, 3, 9], "id": [0, 1, 2]})
    out = (
        group_ntile(_ds(df), keys="user", val_col="v", k=4, tie_cols=["id"])
        .to_pandas()
        .sort_values(["user", "v"])
    )
    # n < k: each row gets its own tile 1..n
    assert out[out["user"] == 1]["ntile"].tolist() == [1, 2]
    assert out[out["user"] == 2]["ntile"].tolist() == [1]


def test_share_of_entity_partition(ev):
    out = share_of_entity(_ds(ev), key="user", sub_key="cat").to_pandas()
    exp = ev.groupby(["user", "cat"]).size().rename("n").reset_index()
    m = out.merge(exp, on=["user", "cat"], suffixes=("", "_exp"), how="outer")
    assert not m.isna().any().any()
    assert (m["n"] == m["n_exp"]).all()
    tot = out.groupby("user")["share"].sum()
    assert np.allclose(tot.to_numpy(), 1.0)
    # share is the one-division value
    totals = ev.groupby("user").size()
    exp_share = m["n"].to_numpy().astype(np.float64) / m["user"].map(totals).to_numpy()
    assert (m["share"].to_numpy() == exp_share).all()


def test_negative_samples_bruteforce(ray_session):
    df = pd.DataFrame(
        {
            "user": [1, 1, 1, 2, 2, 3, 3, 3, 3],
            "item": ["a", "b", "a", "c", "a", "a", "b", "c", "d"],
        }
    )
    out = (
        negative_samples(_ds(df), user_col="user", item_col="item", k=2)
        .to_pandas()
        .sort_values(["user", "neg_rank"])
        .reset_index(drop=True)
    )
    vocab = sorted(df["item"].unique())
    rows = []
    for u, grp in df.groupby("user"):
        missing = [(i, it) for i, it in enumerate(vocab) if it not in set(grp["item"])]
        ranked = sorted(
            missing, key=lambda p: (int(mix64(np.array([u * 64 + p[0]]))[0]), p[0])
        )
        for r, (_, it) in enumerate(ranked[:2], start=1):
            rows.append((u, it, r))
    exp = pd.DataFrame(rows, columns=["user", "item", "neg_rank"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # user 3 saw everything -> no rows
    assert (out["user"] != 3).all()


def test_negative_samples_multiword_vocab(ray_session):
    """Vocabulary above 64 items exercises the multi-word bitset path;
    brute-force parity incl. a user who saw everything (no rows) and a
    user whose observations span several mask words."""
    items = [f"i{j:03d}" for j in range(150)]
    rows = [(0, it) for it in items]               # user 0 saw everything
    rows += [(1, items[j]) for j in range(0, 150, 7)]   # spans all words
    rows += [(2, items[64]), (2, items[128])]      # only high words
    df = pd.DataFrame(rows, columns=["user", "item"])
    out = (
        negative_samples(_ds(df), user_col="user", item_col="item", k=3)
        .to_pandas()
        .sort_values(["user", "neg_rank"])
        .reset_index(drop=True)
    )
    vocab = sorted(set(items))
    exp_rows = []
    for u, grp in df.groupby("user"):
        seen = set(grp["item"])
        missing = [(i, it) for i, it in enumerate(vocab) if it not in seen]
        ranked = sorted(
            missing, key=lambda p: (int(mix64(np.array([u * 64 + p[0]]))[0]), p[0])
        )
        for r, (_, it) in enumerate(ranked[:3], start=1):
            exp_rows.append((u, it, r))
    exp = pd.DataFrame(exp_rows, columns=["user", "item", "neg_rank"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert (out["user"] != 0).all()


def test_negative_samples_vocab_ceiling(ray_session):
    df = pd.DataFrame(
        {
            "user": np.zeros(16_385, np.int64),
            "item": [f"i{j:05d}" for j in range(16_385)],
        }
    )
    with pytest.raises(ValueError, match="max_vocab"):
        negative_samples(_ds(df), user_col="user", item_col="item", k=1)


def test_grouped_autocorr_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    n = 1500
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 25, n),
            "ord": np.arange(n, dtype=np.int64),
            "c": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    # a size-1 group (no pairs) and a constant group (zero variance)
    df.loc[df["user"] == 0, "user"] = 1
    df = pd.concat(
        [df, pd.DataFrame({"user": [0, 99, 99, 99], "ord": [-1, -3, -2, -1],
                           "c": [5, 7, 7, 7]})],
        ignore_index=True,
    )
    from feast_ray.stages.stats import grouped_autocorr

    out = (
        grouped_autocorr(_ds(df), "user", "c", order_cols=["ord"])
        .to_pandas()
        .set_index("user")
    )
    assert 0 not in out.index  # single row -> no pairs -> no output row
    assert out.loc[99, "n_pairs"] == 2 and pd.isna(out.loc[99, "autocorr1"])
    for u, grp in df.sort_values("ord").groupby("user"):
        v = grp["c"].to_numpy()
        if len(v) < 2:
            continue
        x, y = v[:-1].astype(np.float64), v[1:].astype(np.float64)
        if len(x) >= 2 and np.std(x) > 0 and np.std(y) > 0:
            exp = np.corrcoef(x, y)[0, 1]
            assert abs(out.loc[u, "autocorr1"] - exp) < 1e-9


def test_rolling_distinct_matches_bruteforce(ray_session):
    from feast_ray.stages.windows import rolling_distinct

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 17, n),
            "ord": np.arange(n, dtype=np.int64),
            "cat": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    # NULL categories never count as distinct but still get output rows
    cat = df["cat"].astype(object)
    cat.iloc[rng.choice(n, 60, replace=False)] = None
    df["cat"] = cat
    w = 7
    out = (
        rolling_distinct(
            _ds(df), key="user", cat_col="cat", window=w,
            order_cols=["ord"], out_name="nd",
        )
        .to_pandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    exp = {}
    for _, grp in df.sort_values("ord").groupby("user"):
        cats = grp["cat"].tolist()
        ords = grp["ord"].tolist()
        for i in range(len(cats)):
            win = [c for c in cats[max(0, i - w + 1): i + 1] if c is not None]
            exp[ords[i]] = len(set(win))
    got = dict(zip(out["ord"].to_numpy(), out["nd"].to_numpy()))
    assert got == exp


def test_cube_agg_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "k1": rng.choice(["x", "y", "z"], n),
            "k2": rng.integers(0, 9, n).astype(np.int64),
            "c": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    from feast_ray.stages.stats import cube_agg

    out = (
        cube_agg(_ds(df), ["k1", "k2"], "c", count_name="n", sum_name="s")
        .to_pandas()
        .sort_values(["k1", "k2", "n"], na_position="first")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            "SELECT k1, k2, CAST(COUNT(*) AS BIGINT) n, CAST(SUM(c) AS BIGINT) s "
            "FROM df GROUP BY CUBE(k1, k2)"
        )
        .df()
        .sort_values(["k1", "k2", "n"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_rolling_distinct_time_with_peers(ray_session):
    """RANGE-window distinct: equal-ts rows are peers (all included in
    each other's window); brute force over a tie-heavy series with NULL
    categories."""
    from feast_ray.stages.windows import rolling_distinct_time

    rng = np.random.default_rng(31)
    n = 1200
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 11, n),
            "id": np.arange(n, dtype=np.int64),
            # coarse ts grid -> many exact ties
            "ts_us": rng.integers(0, 50, n).astype(np.int64) * 1_000_000,
            "cat": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    cat = df["cat"].astype(object)
    cat.iloc[rng.choice(n, 40, replace=False)] = None
    df["cat"] = cat
    w_us = 10_000_000  # 10 s window over a 50 s span
    tbl = pa.table(
        {
            "user": pa.array(df["user"].to_numpy()),
            "id": pa.array(df["id"].to_numpy()),
            "ts": pa.array(df["ts_us"].to_numpy()).cast(pa.timestamp("us")),
            "cat": pa.array(df["cat"].tolist(), pa.string()),
        }
    )
    out = (
        rolling_distinct_time(
            rd.from_arrow(tbl), key="user", cat_col="cat", ts_col="ts",
            delta_us=w_us, order_cols=["ts", "id"], out_name="nd",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = {}
    for _, grp in df.groupby("user"):
        ts = grp["ts_us"].to_numpy()
        cats = grp["cat"].tolist()
        ids = grp["id"].to_numpy()
        for i in range(len(grp)):
            win = [
                cats[j]
                for j in range(len(grp))
                if ts[i] - w_us <= ts[j] <= ts[i] and cats[j] is not None
            ]
            exp[ids[i]] = len(set(win))
    got = dict(zip(out["id"].to_numpy(), out["nd"].to_numpy()))
    assert got == exp


def test_target_encode_smoothing(ev):
    out = (
        target_encode(
            _ds(ev), key_col="cat", cents_col="cents", smoothing_m=20.0
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    g = ev.groupby("cat")["cents"]
    nv = g.count()
    s = g.sum()
    prior = float(s.sum()) / float(nv.sum())
    for cat in ev["cat"].unique():
        exp = (float(s[cat]) + 20.0 * prior) / (float(nv[cat]) + 20.0)
        got = out.loc[out["cat"] == cat, "smooth_mean_cents"].unique()
        assert len(got) == 1 and got[0] == exp
    # singleton category pulled strongly toward the prior
    row = out[out["cat"] == "only_once"]["smooth_mean_cents"].iloc[0]
    assert abs(row - prior) < abs(float(ev["cents"].dropna().iloc[0]) - prior) + 1e-9


def test_rolling_distinct_hypothesis(ray_session):
    """Property: both distinct-window kernels (ROWS and RANGE) match brute
    force across random group shapes, window sizes, tie densities and
    null rates."""
    from feast_ray.stages.windows import rolling_distinct, rolling_distinct_time

    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(50, 800))
        w = int(rng.integers(1, 12))
        n_users = int(rng.integers(1, 9))
        ts_grid = int(rng.integers(1, 30))
        df = pd.DataFrame(
            {
                "user": rng.integers(0, n_users, n),
                "ord": np.arange(n, dtype=np.int64),
                "ts_us": rng.integers(0, ts_grid, n).astype(np.int64) * 1_000_000,
                "cat": rng.choice(["a", "b", "c"], n),
            }
        )
        cat = df["cat"].astype(object)
        null_idx = rng.choice(n, int(0.1 * n), replace=False)
        cat.iloc[null_idx] = None
        df["cat"] = cat
        tbl = pa.table(
            {
                "user": pa.array(df["user"].to_numpy()),
                "ord": pa.array(df["ord"].to_numpy()),
                "ts": pa.array(df["ts_us"].to_numpy()).cast(pa.timestamp("us")),
                "cat": pa.array(df["cat"].tolist(), pa.string()),
            }
        )
        # ROWS window
        out = (
            rolling_distinct(
                rd.from_arrow(tbl), key="user", cat_col="cat", window=w,
                order_cols=["ord"], out_name="nd",
            ).to_pandas().set_index("ord")["nd"]
        )
        for _, grp in df.groupby("user"):
            cats = grp["cat"].tolist()
            for i in range(len(cats)):
                win = [c for c in cats[max(0, i - w + 1): i + 1] if c is not None]
                assert out[grp["ord"].iloc[i]] == len(set(win)), (seed, "rows")
        # RANGE window
        w_us = w * 1_000_000
        out_t = (
            rolling_distinct_time(
                rd.from_arrow(tbl), key="user", cat_col="cat", ts_col="ts",
                delta_us=w_us, order_cols=["ts", "ord"], out_name="nd",
            ).to_pandas().set_index("ord")["nd"]
        )
        for _, grp in df.sort_values(["ts_us", "ord"]).groupby("user"):
            ts = grp["ts_us"].to_numpy()
            cats = grp["cat"].tolist()
            ords = grp["ord"].to_numpy()
            for i in range(len(grp)):
                win = {
                    cats[j]
                    for j in range(len(grp))
                    if ts[i] - w_us <= ts[j] <= ts[i] and cats[j] is not None
                }
                assert out_t[ords[i]] == len(win), (seed, "range")


def test_round3_new_stages_empty_input(ray_session):
    """0 rows in -> 0 rows out, correct schema, no crash — for every stage
    family added this round (the grouped exchange's zero-input sentinel
    must hold through each kernel's empty branch)."""
    import pyarrow as _pa

    from feast_ray.stages.editdist import editdist_pairs
    from feast_ray.stages.similarity import knn_graph, knn_graph_lsh
    from feast_ray.stages.stats import cube_agg, grouped_autocorr
    from feast_ray.stages.windows import rolling_distinct, rolling_distinct_time

    empty_ev = rd.from_arrow(
        _pa.table(
            {
                "user": _pa.array([], _pa.int64()),
                "ord": _pa.array([], _pa.int64()),
                "ts": _pa.array([], _pa.timestamp("us")),
                "cat": _pa.array([], _pa.string()),
                "c": _pa.array([], _pa.int64()),
            }
        )
    )
    empty_docs = rd.from_arrow(
        _pa.table(
            {"doc_id": _pa.array([], _pa.int64()),
             "text": _pa.array([], _pa.string())}
        )
    )
    empty_vec = rd.from_arrow(
        _pa.table(
            {
                "vec_id": _pa.array([], _pa.int64()),
                "embedding": _pa.array([], _pa.list_(_pa.float32())),
            }
        )
    )

    assert target_encode(empty_ev, key_col="cat", cents_col="c").count() == 0
    assert group_ntile(empty_ev, keys="user", val_col="c", k=4).count() == 0
    assert share_of_entity(empty_ev, key="user", sub_key="cat").count() == 0
    assert negative_samples(empty_ev, user_col="user", item_col="cat", k=2).count() == 0
    assert grouped_autocorr(empty_ev, "user", "c", order_cols=["ord"]).count() == 0
    assert cube_agg(empty_ev.select_columns(["cat", "ord", "c"]),
                    ["cat", "ord"], "c").count() == 1  # the grand-total row
    assert rolling_distinct(
        empty_ev, key="user", cat_col="cat", window=3, order_cols=["ord"]
    ).count() == 0
    assert rolling_distinct_time(
        empty_ev, key="user", cat_col="cat", ts_col="ts", delta_us=1,
        order_cols=["ts", "ord"],
    ).count() == 0
    assert editdist_pairs(empty_docs, id_col="doc_id", text_col="text").count() == 0
    assert knn_graph(empty_vec, k=3).count() == 0
    assert knn_graph_lsh(empty_vec, k=3).count() == 0


def test_seq_pairs_bruteforce_ties(ray_session):
    """Horizon pair mining vs brute force on a tie-dense series (many
    equal timestamps — strictly-later semantics must exclude peers)."""
    from feast_ray.pipelines.queries_ml import q_seq_pairs_1h  # noqa: F401
    from feast_ray.grouped import grouped_map  # noqa: F401
    import itertools

    import feast_ray.pipelines.queries_ml as qm

    rng = np.random.default_rng(71)
    n = 600
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 7, n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts_us": rng.integers(0, 40, n).astype(np.int64) * 600_000_000,
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    tbl = pa.table(
        {
            "user_id": pa.array(df["user_id"].to_numpy()),
            "event_id": pa.array(df["event_id"].to_numpy()),
            "ts": pa.array(df["ts_us"].to_numpy()).cast(pa.timestamp("us")),
            "event_type": pa.array(df["event_type"].tolist()),
        }
    )
    ds = rd.from_arrow(tbl)
    orig = qm._events
    qm._events = lambda sf_dir, columns=None: (
        ds.select_columns(list(columns)) if columns else ds
    )
    try:
        out = qm.q_seq_pairs_1h("ignored").to_pandas()
    finally:
        qm._events = orig
    got = {(r.type_a, r.type_b): r.n_pairs for r in out.itertuples()}
    H = 3600 * 1_000_000
    exp: dict = {}
    for _, g in df.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        tys = g["event_type"].to_numpy()
        for i, j in itertools.permutations(range(len(g)), 2):
            if ts[j] > ts[i] and ts[j] - ts[i] <= H:
                k = (tys[i], tys[j])
                exp[k] = exp.get(k, 0) + 1
    assert got == exp


def _run_events_query(qfn, df):
    """Drive a queries_ml events query against an in-memory frame."""
    import feast_ray.pipelines.queries_ml as qm

    tbl = pa.table(
        {
            "user_id": pa.array(df["user_id"].to_numpy()),
            "event_id": pa.array(df["event_id"].to_numpy()),
            "ts": pa.array(df["ts_us"].to_numpy()).cast(pa.timestamp("us")),
            "event_type": pa.array(df["event_type"].tolist()),
            "value": pa.array(df.get("value", pd.Series(np.ones(len(df)))).to_numpy()),
        }
    )
    ds = rd.from_arrow(tbl)
    orig = qm._events
    qm._events = lambda sf_dir, columns=None: (
        ds.select_columns(list(columns)) if columns else ds
    )
    try:
        return qfn("ignored").to_pandas()
    finally:
        qm._events = orig


def test_dau_wau_bruteforce(ray_session):
    """Calendar-axis interval-contribution WAU vs per-day brute force,
    with multi-day gaps and users returning exactly at the 7-day edge."""
    from feast_ray.pipelines.queries_ml import q_dau_wau_daily

    rng = np.random.default_rng(83)
    rows = []
    eid = 0
    for u in range(12):
        days = sorted(rng.choice(60, size=rng.integers(1, 12), replace=False))
        for d in days:
            rows.append((u, eid, int(d) * 86_400_000_000 + 1000, "view"))
            eid += 1
    # a user active ONLY on days exactly 7 apart (boundary: day d counts
    # toward WAU(d..d+6), NOT d+7)
    rows += [(99, eid, 0 * 86_400_000_000, "view"),
             (99, eid + 1, 7 * 86_400_000_000, "view")]
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us", "event_type"])
    out = _run_events_query(q_dau_wau_daily, df).set_index("day")
    pairs = df.assign(day=df["ts_us"] // 86_400_000_000)[
        ["user_id", "day"]
    ].drop_duplicates()
    for d in sorted(pairs["day"].unique()):
        dau = pairs[pairs["day"] == d]["user_id"].nunique()
        wau = pairs[(pairs["day"] >= d - 6) & (pairs["day"] <= d)][
            "user_id"
        ].nunique()
        assert out.loc[d, "dau"] == dau, d
        assert out.loc[d, "wau"] == wau, d


def test_conversion_path_bruteforce(ray_session):
    """First-view -> first-subsequent-purchase anchors vs brute force,
    incl. a purchase BEFORE any view (must not match), a user with views
    only, and an immediate view->purchase adjacency (0 between)."""
    from feast_ray.pipelines.queries_ml import q_conversion_path_length

    M = 1_000_000
    rows = [
        # u1: purchase BEFORE the first view, then view, 2 events, purchase
        (1, 0, 1 * M, "purchase"), (1, 1, 2 * M, "view"),
        (1, 2, 3 * M, "click"), (1, 3, 4 * M, "click"),
        (1, 4, 5 * M, "purchase"),
        # u2: views only -> no row
        (2, 5, 1 * M, "view"), (2, 6, 2 * M, "view"),
        # u3: view immediately followed by purchase -> 0 between
        (3, 7, 9 * M, "view"), (3, 8, 10 * M, "purchase"),
        # u4: purchases only -> no row
        (4, 9, 1 * M, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us", "event_type"])
    out = _run_events_query(q_conversion_path_length, df).set_index("user_id")
    assert set(out.index) == {1, 3}
    assert out.loc[1, "n_between"] == 2 and out.loc[1, "elapsed_us"] == 3 * M
    assert out.loc[3, "n_between"] == 0 and out.loc[3, "elapsed_us"] == 1 * M
