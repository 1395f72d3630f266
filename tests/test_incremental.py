"""Incremental materialization: watermark-driven affected-bucket recompute
must equal a from-scratch backfill on the combined input."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from feast_ray.fixtures import gen_transcripts
from feast_ray.pipelines.backfill import (
    _load_watermark,
    backfill_incremental,
    backfill_transcripts,
)


def _read_out(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return (
        pa.concat_tables([pq.read_table(f) for f in files])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture()
def split_input(tmp_path):
    tbl = gen_transcripts(n_convs=50, mean_turns=10, seed=21, n_hot=2, hot_turns=60)
    ts = tbl["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    cut = np.quantile(ts, 0.8)
    early = tbl.filter(pa.array(ts <= cut))
    late = tbl.filter(pa.array(ts > cut))
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(early, d / "batch-000.parquet")
    return str(d), early, late


def test_incremental_equals_full(ray_session, tmp_path, split_input):
    in_dir, early, late = split_input
    out_inc = str(tmp_path / "out_inc")
    kw = dict(num_buckets=8, session_gap_s=1800, roll_turns=5, roll_time_s=600)

    # run 1: everything (no watermark yet)
    r1 = backfill_incremental(in_dir, out_inc, **kw)
    assert r1["new_buckets"] == 8
    wm1 = _load_watermark(out_inc)
    assert wm1 is not None and wm1["runs"] == 1

    # new turns arrive (a strict subset of conversations)
    pq.write_table(late, os.path.join(in_dir, "batch-001.parquet"))
    r2 = backfill_incremental(in_dir, out_inc, **kw)
    assert 0 < r2["new_buckets"] <= 8
    assert r2["partitions_skipped"] == 8 - r2["new_buckets"]
    assert _load_watermark(out_inc)["runs"] == 2

    # equals a from-scratch full backfill over the combined input
    out_full = str(tmp_path / "out_full")
    backfill_transcripts(in_dir, out_full, **kw)
    got, want = _read_out(out_inc), _read_out(out_full)
    assert len(got) == len(want)
    for c in want.columns:
        gv, wv = got[c], want[c]
        if pd.api.types.is_float_dtype(wv):
            ga, wa = gv.to_numpy(dtype=float), wv.to_numpy(dtype=float)
            assert ((np.isnan(ga) & np.isnan(wa)) | np.isclose(ga, wa, equal_nan=True)).all(), c
        else:
            assert gv.where(gv.notna(), None).tolist() == wv.where(wv.notna(), None).tolist(), c


def test_incremental_noop_when_no_new_rows(ray_session, tmp_path, split_input):
    in_dir, *_ = split_input
    out = str(tmp_path / "out")
    backfill_incremental(in_dir, out, num_buckets=8)
    r = backfill_incremental(in_dir, out, num_buckets=8)
    assert r["partitions_written"] == 0 and r["new_turns"] == 0


def test_incremental_config_change_forces_full_recompute(
    ray_session, tmp_path, split_input
):
    """Changing anything that determines bucket contents (window params,
    num_buckets) must invalidate the watermark: full recompute, and part
    dirs beyond a shrunken bucket count removed."""
    in_dir, *_ = split_input
    out = str(tmp_path / "out")
    backfill_incremental(in_dir, out, num_buckets=8, roll_turns=5)

    # same input, different window param: nothing is 'new' by the watermark,
    # but every bucket's features changed -> must recompute all 8
    r = backfill_incremental(in_dir, out, num_buckets=8, roll_turns=3)
    assert r["new_buckets"] == 8 and r["partitions_written"] == 8
    wm = _load_watermark(out)
    assert wm["config"]["roll_turns"] == 3

    # shrink num_buckets: stale part dirs >= new count must be gone
    r = backfill_incremental(in_dir, out, num_buckets=4, roll_turns=3)
    assert r["new_buckets"] == 4
    parts = sorted(glob.glob(os.path.join(out, "part=*")))
    assert len(parts) == 4

    # and the output still equals a from-scratch run at the new config
    out_full = str(tmp_path / "out_full")
    backfill_transcripts(in_dir, out_full, num_buckets=4, roll_turns=3)
    got, want = _read_out(out), _read_out(out_full)
    assert len(got) == len(want)


def test_allowed_lateness_reopens_closed_partition(ray_session, tmp_path):
    """A LATE row (event time behind the stored watermark) lands in a
    closed partition: with allowed_lateness covering its lag the partition
    is re-opened and recomputed from full history — final output equals the
    single-shot run on the combined input.  With the default bound of 0
    the late row is out of contract and missed (the documented trade)."""
    tbl = gen_transcripts(n_convs=30, mean_turns=10, seed=33)
    ts = tbl["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    # withhold the rows of one conversation that sit ~in the middle of the
    # timeline: when they "arrive" later, they are LATE vs the watermark
    conv = tbl["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
    target = conv[np.argsort(ts)[len(ts) // 2]]
    late_mask = (conv == target) & (ts <= np.quantile(ts, 0.9))
    assert late_mask.any() and not late_mask.all()
    first = tbl.filter(pa.array(~late_mask))
    late = tbl.filter(pa.array(late_mask))

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(first, in_dir / "batch-000.parquet")

    kw = dict(num_buckets=8, session_gap_s=1800, roll_turns=5, roll_time_s=600)
    out_miss = str(tmp_path / "out_miss")
    out_late = str(tmp_path / "out_late")
    backfill_incremental(str(in_dir), out_miss, **kw)
    backfill_incremental(str(in_dir), out_late, **kw)

    wm = _load_watermark(out_late)["end_ts_us"]
    lateness_s = int((wm - int(ts[late_mask].min())) // 1_000_000) + 1
    pq.write_table(late, in_dir / "batch-001.parquet")

    # default contract (0): the late row does not re-open its partition
    r0 = backfill_incremental(str(in_dir), out_miss, **kw)
    assert r0["partitions_written"] == 0
    got_miss = _read_out(out_miss)
    assert (got_miss["conv_id"] == target).sum() < int(
        (conv == target).sum()
    )  # stale: late turns absent

    # allowed_lateness covering the lag: partition re-opened, exact result
    r1 = backfill_incremental(
        str(in_dir), out_late, allowed_lateness_s=lateness_s, **kw
    )
    assert r1["partitions_written"] >= 1

    out_full = str(tmp_path / "out_full")
    backfill_transcripts(str(in_dir), out_full, num_buckets=8)
    got = _read_out(out_late)
    want = _read_out(out_full)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
