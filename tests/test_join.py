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


class TestEquiJoin:
    @pytest.fixture()
    def ec_sides(self, ray_session):
        rng = np.random.default_rng(11)
        n_l, n_r = 400, 150
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 50, n_l).astype(float),
                "lval": rng.normal(size=n_l),
                "lname": [f"L{i}" for i in range(n_l)],
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(25, 75, n_r).astype(float),  # dup keys + misses
                "rval": rng.normal(size=n_r),
            }
        )
        # NULL join keys on both sides: match nothing
        left.loc[left.index[:7], "k"] = np.nan
        right.loc[right.index[:5], "k"] = np.nan
        return left, right

    @staticmethod
    def _canon(df, cols):
        return (
            df[cols]
            .sort_values(cols, kind="stable")
            .reset_index(drop=True)
        )

    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_matches_pandas_merge(self, ec_sides, how):
        from feast_ray.stages.join import equi_join

        left, right = ec_sides
        got = equi_join(
            rd.from_pandas(left), rd.from_pandas(right), keys=["k"], how=how
        ).to_pandas()
        want = left.merge(right, on="k", how=how)
        # pandas merges NaN keys with each other; SQL (and equi_join) don't
        if how == "inner":
            want = want[want["k"].notna()]
        else:
            nan_l = left[left["k"].isna()].copy()
            nan_l["rval"] = np.nan
            want = pd.concat([want[want["k"].notna()], nan_l], ignore_index=True)
        cols = ["k", "lval", "lname", "rval"]
        assert list(got.columns) == cols
        g, w = self._canon(got, cols), self._canon(want, cols)
        assert len(g) == len(w)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)

    def test_payload_clash_raises(self, ec_sides):
        from feast_ray.stages.join import equi_join

        left, right = ec_sides
        right = right.rename(columns={"rval": "lval"})
        with pytest.raises(ValueError, match="clash"):
            equi_join(rd.from_pandas(left), rd.from_pandas(right), keys=["k"])

    def test_right_cols_subset_and_empty_groups(self, ray_session):
        from feast_ray.stages.join import equi_join

        left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
        right = pd.DataFrame({"k": [2, 2, 9], "b": [1.0, 2.0, 3.0], "c": ["x", "y", "z"]})
        got = (
            equi_join(
                rd.from_pandas(left), rd.from_pandas(right), keys=["k"], how="left",
                right_cols=["b"],
            )
            .to_pandas()
            .sort_values(["k", "b"])
            .reset_index(drop=True)
        )
        assert list(got.columns) == ["k", "a", "b"]
        assert got["k"].tolist() == [1, 2, 2, 3]
        assert got["b"].fillna(-1).tolist() == [-1.0, 1.0, 2.0, -1.0]


def test_skew_join_matches_equi_join(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.join import equi_join, skew_join

    rng = np.random.default_rng(31)
    n = 5000
    # key 7 is pathologically hot on the left; keys 1-3 hot-ish on the right
    left = pd.DataFrame(
        {
            "k": np.concatenate([np.full(2000, 7), rng.integers(0, 40, n - 2000)]),
            "lv": np.arange(n),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.concatenate([np.repeat([1, 2, 3, 7], 60), rng.integers(0, 40, 400)]),
            "rv": np.arange(640) * 10,
        }
    )
    for how in ("inner", "left"):
        want = (
            equi_join(rd.from_pandas(left), rd.from_pandas(right), keys=["k"], how=how)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        got = (
            skew_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                keys=["k"],
                how=how,
                hot_threshold=50,  # keys 1,2,3,7 take the broadcast path
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), how
        assert got[["k", "lv"]].equals(want[["k", "lv"]]), how
        gr, wr = got["rv"].fillna(-1).to_numpy(), want["rv"].fillna(-1).to_numpy()
        assert (gr == wr).all(), how


def test_skew_join_no_hot_keys_degenerates_to_equi(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.join import equi_join, skew_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500), "lv": np.arange(500)})
    right = pd.DataFrame({"k": rng.integers(0, 50, 300), "rv": np.arange(300)})
    want = (
        equi_join(rd.from_pandas(left), rd.from_pandas(right), keys=["k"], how="inner")
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    )
    got = (
        skew_join(rd.from_pandas(left), rd.from_pandas(right), keys=["k"],
                  how="inner", hot_threshold=10**9)
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    )
    assert got.equals(want)


def _gen_disjoint_intervals(rng, n_keys, max_per_key, lo, hi):
    import pandas as pd

    rows = []
    for k in range(n_keys):
        cuts = np.sort(rng.choice(np.arange(lo, hi), size=2 * rng.integers(0, max_per_key + 1), replace=False))
        for i in range(0, len(cuts) - 1, 2):
            rows.append((k, int(cuts[i]), int(cuts[i + 1])))
    return pd.DataFrame(rows, columns=["k", "s", "e"])


def test_overlap_join_matches_python(ray_session):
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.join import overlap_join

    rng = np.random.default_rng(17)
    left = _gen_disjoint_intervals(rng, 12, 6, 0, 1000).rename(
        columns={"s": "ls", "e": "le"}
    )
    left["lid"] = np.arange(len(left))
    right = _gen_disjoint_intervals(rng, 12, 6, 0, 1000).rename(
        columns={"s": "rs", "e": "re"}
    )
    right["rid"] = np.arange(len(right))
    out = (
        overlap_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            keys=["k"],
            l_start="ls",
            l_end="le",
            r_start="rs",
            r_end="re",
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    want = set()
    for _, l in left.iterrows():
        for _, r in right.iterrows():
            if l["k"] == r["k"] and l["ls"] < r["re"] and r["rs"] < l["le"]:
                want.add((l["lid"], r["rid"]))
    assert set(zip(out["lid"], out["rid"])) == want
    assert len(out) == len(want)
    assert want  # fixture produces overlaps


def test_overlap_join_rejects_overlapping_side(ray_session):
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.join import overlap_join

    left = pd.DataFrame({"k": [1, 1], "ls": [0, 5], "le": [10, 15], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1], "rs": [3], "re": [7], "rid": [0]})
    with pytest.raises(Exception):
        overlap_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            keys=["k"],
            l_start="ls",
            l_end="le",
            r_start="rs",
            r_end="re",
        ).to_pandas()


def test_overlap_join_touching_intervals_do_not_match(ray_session):
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.join import overlap_join

    left = pd.DataFrame({"k": [1, 1], "ls": [0, 20], "le": [10, 30], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1], "rs": [10], "re": [20], "rid": [0]})  # touches both
    out = overlap_join(
        rd.from_pandas(left), rd.from_pandas(right), keys=["k"],
        l_start="ls", l_end="le", r_start="rs", r_end="re",
    ).to_pandas()
    assert len(out) == 0  # half-open: [0,10) vs [10,20) and [20,30) never overlap


def test_equi_join_full_outer_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.join import equi_join

    left = pa.table(
        {
            "k": pa.array([None, 1, 2, 2, 3, 7, 7], type=pa.int64()),
            "lv": ["a", "b", "c", "d", "e", "f", "g"],
        }
    )
    right = pa.table(
        {
            "k": pa.array([None, None, 2, 3, 3, 9], type=pa.int64()),
            "rv": [10.0, 11.0, 12.0, 13.0, 14.0, 15.0],
        }
    )
    out = (
        equi_join(rd.from_arrow(left), rd.from_arrow(right), keys=["k"], how="full")
        .to_pandas()
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    # SQL FULL JOIN oracle: pandas outer merge on non-null keys, null-key
    # rows from BOTH sides appended unmatched
    lp, rp = left.to_pandas(), right.to_pandas()
    merged = lp[lp["k"].notna()].merge(rp[rp["k"].notna()], on="k", how="outer")
    extra = pd.concat([lp[lp["k"].isna()], rp[rp["k"].isna()]], ignore_index=True)
    want = (
        pd.concat([merged, extra], ignore_index=True)
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == len(want)

    def norm(s2):
        return [None if pd.isna(v) else v for v in s2]

    for c in ["k", "lv", "rv"]:
        assert norm(out[c]) == norm(want[c]), c
    # both miss directions present: left-only k=1 (1 row) + k=7 (2) + 1
    # null-key left = 4 NULL rv; right-only k=9 (1) + 2 null-key right = 3
    # NULL lv
    assert out["rv"].isna().sum() == 4 and out["lv"].isna().sum() == 3
