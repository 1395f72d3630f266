"""HyperLogLog approx-distinct: error bound vs exact, merge correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from feast_ray.stages.sketch import approx_distinct


@pytest.mark.parametrize("card", [50, 5000, 60000])
def test_error_bound(ray_session, card):
    rng = np.random.default_rng(card)
    n = card * 3
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, n),
            "v": rng.integers(0, card, n),  # ~card distinct per group
        }
    )
    got = approx_distinct(rd.from_pandas(df), "g", "v", p=12, num_buckets=2).to_pandas()
    exact = df.groupby("g")["v"].nunique()
    rel_bound = 4 * 1.04 / np.sqrt(2**12)  # 4 sigma
    for r in got.itertuples():
        e = exact[r.g]
        assert abs(r.approx_distinct - e) <= max(rel_bound * e, 4), (r.g, r.approx_distinct, e)


def test_merge_across_blocks_matches_single_block(ray_session):
    """A group's values split across many input blocks must merge to the
    same sketch as one block (register max is the merge)."""
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 10000, 30000)
    df = pd.DataFrame({"g": np.zeros(len(vals), dtype=np.int64), "v": vals})
    one = approx_distinct(rd.from_pandas(df), "g", "v", p=12).to_pandas()
    many = approx_distinct(
        rd.from_pandas(df).repartition(16), "g", "v", p=12
    ).to_pandas()
    assert one["approx_distinct"].iloc[0] == many["approx_distinct"].iloc[0]


def test_bad_p(ray_session):
    with pytest.raises(ValueError, match="p must be"):
        approx_distinct(rd.from_items([{"g": 1, "v": 2}]), "g", "v", p=4)


def test_heavy_hitters_exact_with_truncation(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from collections import Counter

    from feast_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish: few hot values over a long tail; MANY batches so the MG
    # truncation path (k << distinct-per-batch) actually fires
    vals = [f"v{int(v)}" for v in rng.zipf(1.3, 60_000) if v < 100_000]
    df = pd.DataFrame({"x": vals})
    T = 400
    ds = rd.from_pandas(df).repartition(16)
    out = (
        heavy_hitters(ds, "x", T, summary_k=256)
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    want = sorted((v, c) for v, c in Counter(vals).items() if c >= T)
    assert list(map(tuple, out[["value", "cnt"]].itertuples(index=False))) == want
    assert len(want) > 0

    # self-heal check: a summary_k far too small for the threshold
    # (threshold <= n/(k+1)) must trigger the pass-1 resize-and-redo and
    # still return EXACT results — never raise, never miss items
    T2 = 40
    out2 = (
        heavy_hitters(ds, "x", T2, summary_k=8)
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    want2 = sorted((v, c) for v, c in Counter(vals).items() if c >= T2)
    assert list(map(tuple, out2[["value", "cnt"]].itertuples(index=False))) == want2
    assert len(want2) > len(want)
