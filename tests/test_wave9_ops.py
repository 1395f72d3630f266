"""Round-4 wave-9 operators vs brute-force pandas/python oracles:
grouped categorical entropy, per-doc token entropy, centered moving
average, purged time split, and per-dimension list-column moments."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.sampling import time_split
from feast_ray.stages.stats import grouped_entropy, list_col_moments
from feast_ray.stages.text import token_entropy
from feast_ray.stages.windows import add_group_centered_mean


def _naive_entropy(counts):
    n = sum(counts)
    # the kernel's fixed-point identity, reproduced naively
    ts = sum(round(c * math.log2(c) * 1_000_000) for c in counts)
    return math.log2(n) - (ts / 1_000_000.0) / n


def test_grouped_entropy_matches_naive(ray_session):
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {"k": rng.integers(0, 37, n), "cat": rng.choice(list("abcdefg"), n)}
    )
    # single-row entity and single-category entity
    df.loc[df["k"] == 3, "cat"] = "z"
    df = df[~((df["k"] == 9) & (df.index > df[df["k"] == 9].index.min()))]
    out = (
        grouped_entropy(rd.from_pandas(df), "k", "cat")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for k, g in df.groupby("k"):
        counts = g["cat"].value_counts().to_list()
        row = out.loc[k]
        assert row["n"] == len(g)
        assert row["n_types"] == len(counts)
        assert row["entropy_bits"] == pytest.approx(
            _naive_entropy(counts), abs=1e-12
        )
    # single-category entity: entropy exactly ~0
    assert abs(out.loc[3, "entropy_bits"]) < 1e-9


def test_token_entropy_matches_naive(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat the cat THE dog",
                "aaa",
                "x y z x Y-z,x",
                "!!! ...",  # zero tokens -> absent
            ],
        }
    )
    out = (
        token_entropy(rd.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    for did in (1, 2, 3):
        toks = [t for t in re.split(r"[^a-z0-9]+", docs.loc[did - 1, "text"].lower()) if t]
        counts = pd.Series(toks).value_counts().to_list()
        row = out.loc[did]
        assert row["n_tokens"] == len(toks)
        assert row["n_types"] == len(counts)
        assert row["entropy_bits"] == pytest.approx(
            _naive_entropy(counts), abs=1e-12
        )


def test_centered_mean_matches_pandas(ray_session):
    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 29, n),
            "ts": rng.integers(0, 10**8, n),
            "rid": np.arange(n),
            "c": rng.integers(-500, 500, n),
        }
    )
    out = (
        add_group_centered_mean(
            rd.from_pandas(df), "k", "c", order_cols=["ts", "rid"],
            before=2, after=2,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "ts", "rid"])
        .groupby("k")["c"]
        .rolling(5, center=True, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    got = out.set_index("rid")["c_ma"]
    for rid in df["rid"]:
        assert got.loc[rid] == pytest.approx(want.loc[rid], abs=1e-12), rid
    # window size clips at entity edges
    wn = out.set_index("rid")["w_n"]
    sizes = df.groupby("k")["c"].transform("size")
    assert (wn <= 5).all()
    one_row = df[sizes == 1]["rid"]
    if len(one_row):
        assert (wn.loc[one_row] == 1).all()


def test_time_split_boundaries(ray_session):
    us = np.array([0, 10, 79, 80, 81, 80 + 1, 99, 100], dtype=np.int64) * 1_000_000
    df = pd.DataFrame({"rid": np.arange(len(us)), "ts": pd.to_datetime(us, unit="us")})
    out = (
        time_split(rd.from_pandas(df), ts_col="ts", train_frac_pct=80,
                   embargo_us=5_000_000)
        .to_pandas()
        .set_index("rid")["split"]
    )
    # span = 100s; cutoff = 80s; embargo to 85s
    want = {0: "train", 1: "train", 2: "train", 3: "train", 4: "embargo",
            5: "embargo", 6: "test", 7: "test"}
    assert out.to_dict() == want


def test_list_col_moments_matches_numpy(ray_session):
    rng = np.random.default_rng(5)
    m, d = 300, 8
    vecs = rng.uniform(-3, 3, (m, d)).astype(np.float32)
    import pyarrow as pa

    tbl = pa.table(
        {"embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))}
    )
    out = (
        list_col_moments(rd.from_arrow(tbl), "embedding")
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    micro = np.round(vecs.astype(np.float64) * 1e6)  # ties vanish w.p. 1
    assert list(out.index) == list(range(1, d + 1))
    assert (out["n"] == m).all()
    np.testing.assert_array_equal(out["s_micro"].to_numpy(), micro.sum(axis=0))
    np.testing.assert_array_equal(out["min_micro"].to_numpy(), micro.min(axis=0))
    np.testing.assert_array_equal(out["max_micro"].to_numpy(), micro.max(axis=0))
    np.testing.assert_allclose(
        out["mean_v"].to_numpy(), micro.mean(axis=0) / 1e6, rtol=0, atol=1e-12
    )


def test_list_col_moments_ragged_raises(ray_session):
    import pyarrow as pa

    tbl = pa.table(
        {"embedding": pa.array([[1.0] * 4, [1.0] * 3], pa.list_(pa.float32()))}
    )
    with pytest.raises(Exception):
        list_col_moments(rd.from_arrow(tbl), "embedding").materialize()
