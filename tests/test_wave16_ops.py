"""Round-4 wave-16 operators vs brute-force oracles: split-leak audit,
rare-category collapsing, multi-horizon activity snapshot."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_split_leak_counts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_docs import q_split_leak_docs
    from feast_ray.stages.sampling import mix64

    # craft duplicates straddling the mix64 80/20 doc_id split
    n = 400
    rng = np.random.default_rng(44)
    texts = [f"doc body {i % 120}" for i in range(n)]  # ~120 distinct, dup'd
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    out = q_split_leak_docs(str(tmp_path)).to_pandas()
    tr = (mix64(np.arange(n, dtype=np.int64)) % np.uint64(100)) < np.uint64(80)
    df = pd.DataFrame({"text": texts, "tr": tr})
    g = df.groupby("text")["tr"].agg(["max", "min", "count"])
    leaky = g[(g["max"]) & (~g["min"].astype(bool))]
    assert out["n_texts"][0] == len(g)
    assert out["n_leaky_texts"][0] == len(leaky)
    assert out["n_leaky_docs"][0] == int(leaky["count"].sum())
    assert out["n_leaky_texts"][0] > 0  # fixture actually exercises leaks


def test_collapse_rare_types(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import RARE_TYPE_MIN, q_collapse_rare_types

    n_common = RARE_TYPE_MIN + 50
    types = ["big"] * n_common + ["tiny"] * 7 + ["mini"] * 3
    n = len(types)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n)),
            "ts": pa.array(pd.to_datetime(np.arange(n) * 10**6, unit="us")).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array(types),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }),
        tmp_path / "events.parquet",
    )
    out = (
        q_collapse_rare_types(str(tmp_path))
        .to_pandas().set_index("event_type_c")["n"]
    )
    assert out.loc["big"] == n_common
    assert out.loc["other"] == 10
    assert set(out.index) == {"big", "other"}


def test_activity_windows_matches_naive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_activity_windows_user

    rng = np.random.default_rng(55)
    n = 1000
    day = 86_400_000_000
    us = rng.integers(0, 45 * day, n)
    vals = np.round(rng.uniform(0, 50, n), 2)
    vals[::17] = np.nan
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n)),
            "ts": pa.array(pd.to_datetime(us, unit="us")).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 10, n)),
            "event_type": pa.array(["e"] * n),
            "value": pa.array(pd.Series(vals)),
            "props": pa.array(["{}"] * n),
        }),
        tmp_path / "events.parquet",
    )
    out = (
        q_activity_windows_user(str(tmp_path))
        .to_pandas().set_index("user_id").sort_index()
    )
    ref = us.max()
    cents = np.where(np.isnan(vals), 0, np.round(vals * 100)).astype(np.int64)
    df = pd.DataFrame({"u": pq.read_table(tmp_path / "events.parquet")["user_id"],
                       "us": us, "c": cents})
    for uid, g in df.groupby("u"):
        for name, k in (("1d", 1), ("7d", 7), ("30d", 30)):
            inw = g["us"] > ref - k * day
            assert out.loc[uid, f"n_{name}"] == int(inw.sum()), (uid, name)
            assert out.loc[uid, f"cents_{name}"] == int(g["c"][inw].sum())
    # windows nest
    assert (out["n_1d"] <= out["n_7d"]).all() and (out["n_7d"] <= out["n_30d"]).all()


def test_user_overlap_types_matches_naive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_user_overlap_types

    rng = np.random.default_rng(66)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
    })
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n)),
            "ts": pa.array(pd.to_datetime(np.arange(n) * 10**6, unit="us")).cast(
                pa.timestamp("us")),
            "user_id": pa.array(df["user_id"]),
            "event_type": pa.array(df["event_type"]),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }),
        tmp_path / "events.parquet",
    )
    out = (
        q_user_overlap_types(str(tmp_path))
        .to_pandas().set_index(["ta", "tb"]).sort_index()
    )
    sets = {t: set(g["user_id"]) for t, g in df.groupby("event_type")}
    types = sorted(sets)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in out.index
                continue
            r = out.loc[(a, b)]
            assert r["inter"] == inter
            assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
            assert r["jaccard"] == pytest.approx(
                inter / len(sets[a] | sets[b]), abs=1e-12)
