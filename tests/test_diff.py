"""Snapshot diff vs a pandas outer-merge oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.diff import diff_tables


@pytest.fixture()
def snaps(ray_session):
    rng = np.random.default_rng(23)
    n = 2000
    old = pd.DataFrame(
        {
            "id": np.arange(n),
            "v": rng.integers(0, 100, n),
            "s": rng.choice(["a", "b", None], n),
        }
    )
    new = old.copy()
    new = new[new["id"] % 7 != 0]  # removed
    changed = new["id"] % 5 == 0
    new.loc[changed, "v"] = new.loc[changed, "v"] + 1
    nullflip = new["id"] % 11 == 1  # null <-> value transitions
    new.loc[nullflip, "s"] = new.loc[nullflip, "s"].map(
        lambda x: "z" if x is None else None
    )
    added = pd.DataFrame({"id": np.arange(n, n + 50), "v": 1, "s": "new"})
    new = pd.concat([new, added], ignore_index=True)
    return old, new


def test_diff_matches_pandas(snaps):
    old, new = snaps
    out = (
        diff_tables(rd.from_pandas(old), rd.from_pandas(new), keys=["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    m = old.merge(new, on="id", how="outer", suffixes=("_o", "_n"), indicator=True)
    want = {}
    for _, r in m.iterrows():
        if r["_merge"] == "right_only":
            want[r["id"]] = "added"
        elif r["_merge"] == "left_only":
            want[r["id"]] = "removed"
        else:
            vo, vn = r["v_o"], r["v_n"]
            so, sn = r["s_o"], r["s_n"]
            if vo != vn or (pd.isna(so) != pd.isna(sn)) or (
                not pd.isna(so) and so != sn
            ):
                want[r["id"]] = "changed"
    assert dict(zip(out["id"], out["status"])) == want
    assert set(want.values()) == {"added", "removed", "changed"}


def test_diff_rejects_duplicate_keys(ray_session):
    old = pd.DataFrame({"id": [1, 1], "v": [2, 3]})
    new = pd.DataFrame({"id": [1], "v": [2]})
    with pytest.raises(Exception):
        diff_tables(rd.from_pandas(old), rd.from_pandas(new), keys=["id"]).to_pandas()


def test_diff_identical_snapshots_empty(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3], "v": [4, 5, 6]})
    out = diff_tables(rd.from_pandas(df), rd.from_pandas(df), keys=["id"]).to_pandas()
    assert len(out) == 0


def test_diff_nan_floats_are_unchanged(ray_session):
    old = pd.DataFrame({"id": [1, 2, 3], "v": [np.nan, 2.0, np.nan]})
    new = pd.DataFrame({"id": [1, 2, 3], "v": [np.nan, 2.5, 7.0]})
    out = diff_tables(rd.from_pandas(old), rd.from_pandas(new), keys=["id"]).to_pandas()
    # NaN == NaN counts as unchanged; NaN -> value and value changes emit
    assert dict(zip(out["id"], out["status"])) == {2: "changed", 3: "changed"}
