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
