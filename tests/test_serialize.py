"""Grouped ordered concat / collect vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.serialize import grouped_collect, grouped_concat


@pytest.fixture()
def ev(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    return pd.DataFrame(
        {
            "k": rng.integers(0, 53, n),
            "ts": rng.integers(0, 10_000, n),
            "rid": np.arange(n),
            "tok": rng.choice(["alpha", "b", "ce", "dd", "e"], n),
        }
    )


def test_grouped_concat_matches_pandas(ev):
    out = (
        grouped_concat(
            rd.from_pandas(ev),
            ["k"],
            "tok",
            sep="|",
            sort_keys=["ts", "rid"],
            out_col="seq",
            count_col="n",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        ev.sort_values(["k", "ts", "rid"])
        .groupby("k")
        .agg(seq=("tok", "|".join), n=("tok", "size"))
        .reset_index()
    )
    assert len(out) == len(want)
    assert (out["seq"].to_numpy() == want["seq"].to_numpy()).all()
    assert (out["n"].to_numpy() == want["n"].to_numpy()).all()


def test_grouped_concat_single_and_empty_sep(ev):
    one = ev.head(1)
    out = grouped_concat(
        rd.from_pandas(one), ["k"], "tok", sep="", sort_keys=["rid"], count_col=None
    ).to_pandas()
    assert len(out) == 1
    assert out["concat"].iloc[0] == one["tok"].iloc[0]


def test_grouped_collect_matches_pandas(ev):
    out = (
        grouped_collect(
            rd.from_pandas(ev), ["k"], "tok", sort_keys=["ts", "rid"], out_col="toks"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        ev.sort_values(["k", "ts", "rid"])
        .groupby("k")["tok"]
        .agg(list)
        .reset_index()
    )
    assert len(out) == len(want)
    for got_l, want_l in zip(out["toks"], want["tok"]):
        assert list(got_l) == want_l
