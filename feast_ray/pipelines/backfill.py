"""Flagship pipeline: backfill per-turn feature vectors over transcript
Parquet (the north-star workload, BASELINE.json:2/6/14).

spine = every turn (the backfill case of SURVEY §3.2): for each transcript
turn, materialize lag/lead, rolling turn-window and time-window aggregates,
sessionization features — all in ONE bucketed shuffle — and write
partitioned Parquet with per-partition lineage manifests + metrics,
resumable from checkpoint.

Dataflow:

    read_parquet (all 6 transcript columns)
      -> map_batches: derive numeric per-turn columns (msg_len, role flags)   [vectorized Arrow]
      -> map_batches: tag __bucket = hash(conv_id) % B; on resume, DROP rows
         of buckets already done (pruned BEFORE the shuffle)
      -> groupby(__bucket).map_groups:                                        [the one shuffle]
           local sort (conv_id, ts, turn_idx) -> window kernel over all
           convs in the bucket -> atomic parquet write + manifest
      -> tiny per-partition metrics rows -> aggregate on driver

Output layout: ``out/part=NNNNN/data.parquet`` + ``out/_manifests/part-NNNNN.json``.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import (
    BUCKET_COL,
    add_bucket,
    default_num_buckets,
    group_starts,
    sort_table,
    starts_to_row_gstart,
)
from feast_ray.stages.windows import (
    Lag,
    Lead,
    RollingRows,
    RollingTime,
    Sessionize,
    make_window_kernel,
    shift_indices,
)
from feast_ray.state.manifest import (
    config_fingerprint,
    load_done_partitions,
    write_manifest,
    write_partition_atomic,
)

US = 1_000_000


def _derive_turn_columns(tbl: pa.Table) -> pa.Table:
    """Vectorized per-turn numeric features (no shuffle)."""
    tbl = tbl.append_column("msg_len", pc.utf8_length(tbl["text"]).cast(pa.int32()))
    role = tbl["role"]
    tbl = tbl.append_column("is_user", pc.equal(role, "user").cast(pa.int8()))
    tbl = tbl.append_column("is_assistant", pc.equal(role, "assistant").cast(pa.int8()))
    tbl = tbl.append_column("is_tool", pc.equal(role, "tool").cast(pa.int8()))
    has_tool = pc.and_(tbl["tool"].is_valid(), pc.not_equal(pc.fill_null(tbl["tool"], ""), "none"))
    tbl = tbl.append_column("has_tool_call", has_tool.cast(pa.int8()))
    return tbl


def default_specs(roll_turns: int, roll_time_s: int, session_gap_s: int):
    return [
        Lag("msg_len", 1),
        Lead("msg_len", 1),
        Lag("role", 1),
        RollingRows("msg_len", roll_turns, aggs=("count", "sum", "mean", "last")),
        RollingRows("is_tool", roll_turns, aggs=("sum",), prefix=f"tool_r{roll_turns}"),
        RollingTime("msg_len", roll_time_s * US, aggs=("count", "mean")),
        Sessionize(session_gap_s * US),
    ]


def _session_extras(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
    """dt_prev_us + per-session turn sequence (needs session_id present)."""
    n = tbl.num_rows
    if n == 0:
        return tbl.append_column("dt_prev_us", pa.array([], type=pa.int64())).append_column(
            "session_turn_seq", pa.array([], type=pa.int64())
        )
    gstart = starts_to_row_gstart(starts)
    sizes = np.diff(starts)
    gend = np.repeat(starts[1:], sizes)
    ts = tbl["ts"].combine_chunks().cast(pa.int64()).to_numpy()
    lag_idx = shift_indices(n, gstart, gend, 1)
    prev_ts = pc.take(pa.array(ts), lag_idx).to_numpy(zero_copy_only=False)
    dt = ts - prev_ts
    tbl = tbl.append_column("dt_prev_us", pa.array(np.where(np.isnan(dt), 0, dt).astype(np.int64),
                                                   mask=np.isnan(dt)))
    sid = tbl["session_id"].combine_chunks().to_numpy(zero_copy_only=False)
    ar = np.arange(n, dtype=np.int64)
    is_start = np.ones(n, dtype=bool)
    is_start[1:] = (sid[1:] != sid[:-1]) | (ar[1:] == gstart[1:])
    sess_start = np.maximum.accumulate(np.where(is_start, ar, -1))
    tbl = tbl.append_column("session_turn_seq", pa.array(ar - sess_start))
    return tbl


def transcript_feature_dataset(
    ds,
    *,
    session_gap_s: int = 1800,
    roll_turns: int = 5,
    roll_time_s: int = 600,
    num_buckets: Optional[int] = None,
):
    """Lazy per-turn feature Dataset (no sink) — the retrieval-style variant."""
    from feast_ray.grouped import grouped_map

    specs = default_specs(roll_turns, roll_time_s, session_gap_s)
    wk = make_window_kernel(specs, "ts")

    def kernel(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        return _session_extras(wk(tbl, starts), starts)

    derived = ds.map_batches(_derive_turn_columns, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_map(
        derived, ["conv_id"], kernel, sort_keys=["ts", "turn_idx"], num_buckets=num_buckets
    )


def backfill_transcripts(
    input_path,
    out_dir: str,
    *,
    session_gap_s: int = 1800,
    roll_turns: int = 5,
    roll_time_s: int = 600,
    num_buckets: Optional[int] = None,
    resume: bool = True,
) -> dict:
    """Materialize the full per-turn feature table to partitioned Parquet
    with lineage manifests; resumable.  Returns aggregate metrics."""
    import ray.data as rd

    b = num_buckets or default_num_buckets()
    fingerprint = config_fingerprint(
        {
            "input": input_path,
            "session_gap_s": session_gap_s,
            "roll_turns": roll_turns,
            "roll_time_s": roll_time_s,
            "num_buckets": b,
            "kernel_version": 1,
        }
    )
    done = load_done_partitions(out_dir, fingerprint) if resume else set()

    ds = rd.read_parquet(input_path) if isinstance(input_path, (str, list)) else input_path
    derived = ds.map_batches(_derive_turn_columns, batch_format="pyarrow", zero_copy_batch=True)
    tagged = add_bucket(derived, ["conv_id"], b)

    if done:
        done_arr = np.array(sorted(done), dtype=np.int32)

        def _prune(tbl: pa.Table) -> pa.Table:
            keep = ~np.isin(tbl[BUCKET_COL].to_numpy(zero_copy_only=False), done_arr)
            return tbl.filter(pa.array(keep))

        tagged = tagged.map_batches(_prune, batch_format="pyarrow", zero_copy_batch=True)

    specs = default_specs(roll_turns, roll_time_s, session_gap_s)
    wk = make_window_kernel(specs, "ts")

    def bucket_fn(tbl: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part_id = int(tbl[BUCKET_COL][0].as_py())
        tbl = tbl.drop_columns([BUCKET_COL])
        t = sort_table(tbl, ["conv_id", "ts", "turn_idx"])
        starts = group_starts(t, ["conv_id"])
        out = _session_extras(wk(t, starts), starts)
        _, nbytes = write_partition_atomic(out, out_dir, part_id)
        wall = time.perf_counter() - t0
        write_manifest(
            out_dir,
            part_id,
            fingerprint=fingerprint,
            rows=out.num_rows,
            bytes_written=nbytes,
            wall_s=wall,
            extra={"n_convs": len(starts) - 1},
        )
        return pa.table(
            {
                "part_id": pa.array([part_id], type=pa.int32()),
                "rows": pa.array([out.num_rows], type=pa.int64()),
                "bytes": pa.array([nbytes], type=pa.int64()),
                "wall_s": pa.array([wall], type=pa.float64()),
            }
        )

    t0 = time.perf_counter()
    metrics = tagged.groupby(BUCKET_COL).map_groups(bucket_fn, batch_format="pyarrow").to_pandas()
    wall = time.perf_counter() - t0
    rows = int(metrics["rows"].sum()) if len(metrics) else 0
    return {
        "partitions_written": len(metrics),
        "partitions_skipped": len(done),
        "rows": rows,
        "bytes": int(metrics["bytes"].sum()) if len(metrics) else 0,
        "wall_s": wall,
        "turns_per_sec": rows / wall if wall > 0 else 0.0,
        "fingerprint": fingerprint,
    }
