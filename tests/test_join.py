"""Semi/anti join (J5): co-partitioned presence filter vs pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from feast_ray.stages.join import anti_join, filter_join, semi_join


@pytest.fixture()
def sides(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 300),
            "payload": rng.normal(size=300),
            "name": [f"row-{i}" for i in range(300)],
        }
    )
    # right with duplicate keys and keys absent from left
    right = pd.DataFrame({"k": rng.integers(20, 60, 100)})
    return left, right


def _run(ds):
    return ds.to_pandas().sort_values(["k", "name"]).reset_index(drop=True)


def test_semi_anti_match_pandas(sides):
    left, right = sides
    lds = rd.from_pandas(left)
    rds = rd.from_pandas(right)
    present = set(right["k"])
    want_semi = left[left["k"].isin(present)].sort_values(["k", "name"]).reset_index(drop=True)
    want_anti = left[~left["k"].isin(present)].sort_values(["k", "name"]).reset_index(drop=True)
    got_semi = _run(semi_join(lds, rds, keys=["k"], num_buckets=4))
    got_anti = _run(anti_join(lds, rds, keys=["k"], num_buckets=4))
    pd.testing.assert_frame_equal(got_semi, want_semi, check_like=True)
    pd.testing.assert_frame_equal(got_anti, want_anti, check_like=True)
    # partition: every left row appears in exactly one side
    assert len(got_semi) + len(got_anti) == len(left)


def test_duplicate_right_keys_no_fanout(sides):
    """Right multiplicity must not duplicate left rows (presence test only)."""
    left, _ = sides
    lds = rd.from_pandas(left)
    rds = rd.from_pandas(pd.DataFrame({"k": [5, 5, 5, 5]}))
    got = _run(semi_join(lds, rds, keys=["k"], num_buckets=4))
    assert len(got) == int((left["k"] == 5).sum())


def test_empty_right(sides):
    left, _ = sides
    lds = rd.from_pandas(left)
    rds = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=np.int64)}))
    assert semi_join(lds, rds, keys=["k"], num_buckets=4).count() == 0
    assert anti_join(lds, rds, keys=["k"], num_buckets=4).count() == len(left)


def test_bad_args(sides):
    left, right = sides
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    with pytest.raises(ValueError, match="mode"):
        filter_join(lds, rds, keys=["k"], mode="inner")
    with pytest.raises(ValueError, match="join key"):
        filter_join(lds, rds, keys=["nope"], mode="semi")


def test_null_keys_follow_sql_semantics(ray_session):
    """SQL EXISTS/NOT EXISTS: NULL keys never match — semi drops NULL-key
    left rows, anti keeps them; NULL right keys assert nothing."""
    left = pd.DataFrame({"k": pd.array([1, 2, None, 4], dtype="Int64"),
                         "name": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": pd.array([2, None], dtype="Int64")})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    semi = _run(semi_join(lds, rds, keys=["k"], num_buckets=2))
    anti = _run(anti_join(lds, rds, keys=["k"], num_buckets=2))
    assert semi["name"].tolist() == ["b"]
    assert sorted(anti["name"].tolist()) == ["a", "c", "d"]
