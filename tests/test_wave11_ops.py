"""Round-4 wave-11 operators vs brute-force oracles: two-sample KS,
entity-hash split, global percent rank."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.sampling import entity_split, mix64
from feast_ray.stages.stats import ks_two_sample


def test_ks_two_sample_matches_scipy_free_naive(ray_session):
    rng = np.random.default_rng(21)
    a = rng.integers(0, 80, 900)
    b = np.concatenate([rng.integers(20, 100, 700), rng.integers(0, 10, 50)])
    df = pd.DataFrame({
        "v": np.concatenate([a, b]),
        "g": ["A"] * len(a) + ["B"] * len(b),
    })
    out = ks_two_sample(rd.from_pandas(df), "v", "g", "A", "B").to_pandas()
    # naive empirical CDF sup over all candidate points
    pts = np.unique(df["v"])
    fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    want = np.abs(fa - fb).max()
    assert out["n_a"][0] == len(a) and out["n_b"][0] == len(b)
    assert out["ks_stat"][0] == pytest.approx(want, abs=1e-12)


def test_ks_identical_distribution_zero(ray_session):
    v = np.arange(50).repeat(2)
    df = pd.DataFrame({"v": np.concatenate([v, v]),
                       "g": ["A"] * len(v) + ["B"] * len(v)})
    out = ks_two_sample(rd.from_pandas(df), "v", "g", "A", "B").to_pandas()
    assert out["ks_stat"][0] == 0.0


def test_entity_split_is_entity_consistent(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "rid": np.arange(5000),
        "k": rng.integers(0, 300, 5000),
    })
    out = entity_split(rd.from_pandas(df), key_col="k").to_pandas()
    # every entity maps to exactly one split
    assert (out.groupby("k")["split"].nunique() == 1).all()
    # splits match the documented thresholds
    hv = mix64(out["k"].to_numpy().astype(np.int64)) % np.uint64(100)
    want = np.where(hv < 80, "train", np.where(hv < 90, "val", "test"))
    assert (out["split"].to_numpy() == want).all()
    # rough proportions at the entity level
    ent = out.drop_duplicates("k")
    frac = (ent["split"] == "train").mean()
    assert 0.6 < frac < 0.95
