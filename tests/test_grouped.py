"""Unit tests for the bucketed grouped-execution core."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from feast_ray.grouped import (
    group_starts,
    grouped_map,
    hash_columns,
    sort_table,
    starts_to_group_index,
    starts_to_row_gstart,
)


def test_hash_deterministic(transcripts_tbl):
    h1 = hash_columns(transcripts_tbl, ["conv_id"])
    h2 = hash_columns(transcripts_tbl, ["conv_id"])
    assert (h1 == h2).all()
    # same key -> same hash
    conv = transcripts_tbl["conv_id"].to_pandas()
    df = conv.to_frame("c")
    df["h"] = h1
    assert (df.groupby("c")["h"].nunique() == 1).all()


def test_group_starts_matches_pandas(transcripts_tbl):
    t = sort_table(transcripts_tbl, ["conv_id", "ts", "turn_idx"])
    starts = group_starts(t, ["conv_id"])
    sizes = np.diff(starts)
    pdf = t.to_pandas()
    want = pdf.groupby("conv_id", sort=False).size().to_numpy()
    assert (sizes == want).all()
    gi = starts_to_group_index(starts)
    assert gi[0] == 0 and gi[-1] == len(sizes) - 1
    gs = starts_to_row_gstart(starts)
    assert (gs[starts[:-1]] == starts[:-1]).all()


def test_grouped_map_covers_all_groups(ray_session, transcripts_tbl):
    import ray.data as rd

    ds = rd.from_arrow(transcripts_tbl)

    def kernel(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        sizes = np.diff(starts)
        convs = tbl["conv_id"].combine_chunks().take(pa.array(starts[:-1]))
        return pa.table({"conv_id": convs, "n_turns": pa.array(sizes)})

    out = grouped_map(ds, ["conv_id"], kernel, sort_keys=["ts", "turn_idx"], num_buckets=7)
    pdf = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = (
        transcripts_tbl.to_pandas()
        .groupby("conv_id")
        .size()
        .rename("n_turns")
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert (pdf["conv_id"] == want["conv_id"]).all()
    assert (pdf["n_turns"] == want["n_turns"]).all()


def test_grouped_map_engines_agree(ray_session):
    """exchange (raw-task) and dataset (groupby.map_groups) engines produce
    identical rows for the same kernel."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import numpy as np
    from feast_ray.grouped import grouped_map

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": [f"g{i}" for i in rng.integers(0, 25, 500)],
            "ts": rng.integers(0, 1000, 500).astype("int64"),
            "v": rng.normal(size=500),
        }
    )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        v = t["v"].to_numpy()
        # per-group running count (order-sensitive => exercises the sort)
        sizes = np.diff(starts)
        rc = np.arange(len(v)) - np.repeat(starts[:-1], sizes) + 1
        return t.append_column("rc", pa.array(rc.astype(np.int64)))

    outs = {}
    for eng in ("exchange", "dataset"):
        outs[eng] = (
            grouped_map(rd.from_pandas(df), ["k"], kernel, sort_keys=["ts"],
                        num_buckets=4, engine=eng)
            .to_pandas()
            .sort_values(["k", "ts", "v"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["exchange"], outs["dataset"])


def test_grouped_map_single_bucket(ray_session):
    """num_buckets=1 is clamped to the minimum exchange shape and still
    groups correctly (Ray does not unpack single-return lists)."""
    import pandas as pd
    import pyarrow as pa
    import numpy as np
    import ray.data as rd

    from feast_ray.grouped import grouped_map

    df = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})

    def kern(t, starts):
        sizes = np.diff(starts)
        return t.append_column("n", pa.array(np.repeat(sizes, sizes).astype(np.int64)))

    out = grouped_map(rd.from_pandas(df), ["k"], kern, num_buckets=1).to_pandas()
    assert sorted(out["n"].tolist()) == [1, 2, 2, 2, 2]
