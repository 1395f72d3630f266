"""Greedy next-fit packing vs a pure-Python oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.pack import greedy_pack


def _oracle(sizes, budget):
    bins, acc, b = [], 0, 0
    for i, s in enumerate(sizes):
        if i > 0 and acc + s > budget:
            b += 1
            acc = s
        else:
            acc += s
        bins.append(b)
    return bins


@pytest.fixture()
def items(ray_session):
    rng = np.random.default_rng(7)
    n = 4000
    return pd.DataFrame(
        {
            "g": rng.integers(0, 29, n),
            "rid": np.arange(n),
            # mix of tiny, zero, and oversized (budget will be 100)
            "sz": rng.choice([0, 1, 7, 30, 55, 99, 150], n),
        }
    )


def test_greedy_pack_matches_python(items):
    out = (
        greedy_pack(
            rd.from_pandas(items),
            group_keys="g",
            size_col="sz",
            order_cols=["rid"],
            budget=100,
        )
        .to_pandas()
        .sort_values(["g", "rid"])
        .reset_index(drop=True)
    )
    for g, grp in out.groupby("g"):
        src = items[items["g"] == g].sort_values("rid")
        want = _oracle(src["sz"].tolist(), 100)
        assert grp["bin"].tolist() == want, f"group {g}"


def test_greedy_pack_budget_property(items):
    out = greedy_pack(
        rd.from_pandas(items),
        group_keys="g",
        size_col="sz",
        order_cols=["rid"],
        budget=100,
    ).to_pandas()
    sums = out.groupby(["g", "bin"])["sz"].agg(["sum", "size"])
    # every multi-item bin respects the budget; only singleton bins may exceed
    assert (sums.loc[sums["size"] > 1, "sum"] <= 100).all()
    # bins are dense 0..max per group
    for g, grp in out.sort_values(["g", "rid"]).groupby("g"):
        b = grp["bin"].to_numpy()
        assert b[0] == 0 and (np.diff(b) >= 0).all() and (np.diff(b) <= 1).all()


def test_greedy_pack_rejects_bad_input(items):
    with pytest.raises(ValueError):
        greedy_pack(
            rd.from_pandas(items),
            group_keys="g",
            size_col="sz",
            order_cols=["rid"],
            budget=0,
        )
    bad = items.copy()
    bad.loc[0, "sz"] = -5
    with pytest.raises(Exception):
        greedy_pack(
            rd.from_pandas(bad),
            group_keys="g",
            size_col="sz",
            order_cols=["rid"],
            budget=100,
        ).to_pandas()
