"""Flagship pipeline: backfill per-turn feature vectors over transcript
Parquet (the north-star workload, BASELINE.json:2/6/14).

spine = every turn (the backfill case of SURVEY §3.2): for each transcript
turn, materialize lag/lead, rolling turn-window and time-window aggregates,
sessionization features — all in ONE bucketed shuffle — and write
partitioned Parquet with per-partition lineage manifests + metrics,
resumable from checkpoint.

Dataflow (fused raw-task exchange, ``feast_ray.exchange``):

    map task per input file chunk:
        read parquet -> derive numeric per-turn columns (vectorized Arrow)
        -> hash(conv_id) % B -> B zero-copy bucket slices
    reduce task per bucket (skipping buckets already done on resume):
        concat -> local sort (conv_id, ts, turn_idx) -> window/sessionize
        kernel over ALL convs in the bucket -> atomic parquet write +
        lineage manifest -> tiny metrics dict to the driver

Output layout: ``out/part=NNNNN/data.parquet`` + ``out/_manifests/part-NNNNN.json``.
``transcript_feature_dataset`` keeps the pure Dataset formulation of the
same computation (one ``groupby`` shuffle) for parity testing and
Dataset-composable use.
"""

from __future__ import annotations

from feast_ray.sources.parquet import read_pq

import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import (
    default_num_buckets,
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


def _write_text_sidecar(tbl: pa.Table, text_dir: str, paths) -> None:
    """Write one input chunk's turn text to the sidecar layout, atomically
    and idempotently (content-addressed by the chunk's path list, so a
    resumed or retried map task overwrites with identical bytes)."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    digest = hashlib.sha256("\x00".join(sorted(paths)).encode()).hexdigest()[:16]
    os.makedirs(text_dir, exist_ok=True)
    final = os.path.join(text_dir, f"part-{digest}.parquet")
    if os.path.exists(final):
        return
    cols = ["conv_id", "turn_idx", "text"] + (["tool"] if "tool" in tbl.column_names else [])
    fd, tmp = tempfile.mkstemp(dir=text_dir, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(
            tbl.select(cols), tmp,
            compression="zstd", compression_level=1,
            write_statistics=["conv_id"],
        )
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_text_sidecar(out_dir: str):
    """Dataset over the sidecar text written by ``text_layout='sidecar'`` —
    join to feature partitions on ``(conv_id, turn_idx)``."""
    import ray.data as rd

    return read_pq(os.path.join(out_dir, "text"))


def _resolve_files(input_path) -> list[str]:
    import glob as _glob

    if isinstance(input_path, (list, tuple)):
        return list(input_path)
    if os.path.isdir(input_path):
        return sorted(_glob.glob(os.path.join(input_path, "**", "*.parquet"), recursive=True))
    return [input_path]


def backfill_transcripts(
    input_path,
    out_dir: str,
    *,
    session_gap_s: int = 1800,
    roll_turns: int = 5,
    roll_time_s: int = 600,
    num_buckets: Optional[int] = None,
    resume: bool = True,
    carry_text: bool = True,
    text_layout: Optional[str] = None,
    files_per_task: int = 1,
    skip_buckets: Optional[set] = None,
    shard_rounds: int = 1,
    map_side_sort: bool = False,
) -> dict:
    """Materialize the full per-turn feature table to partitioned Parquet
    with lineage manifests; resumable.  Returns aggregate metrics.
    ``skip_buckets`` adds caller-managed pruning (e.g. the incremental
    watermark path) on top of manifest-based resume.  ``shard_rounds``
    (see ``exchange_grouped``) caps live shuffle objects at
    O(map_tasks x num_buckets / shard_rounds) by running the exchange as
    that many sequential key-hash-range passes — the knob for 100-TB runs
    where M x B refs would otherwise strain the object directory; sidecar
    text writes are content-addressed so the re-passes skip them.

    Runs on the fused raw-task exchange (``feast_ray.exchange``) — measured
    3-5x faster than the Dataset groupby path for this shuffle-dominated
    job.

    ``text_layout`` (overrides the legacy ``carry_text`` flag).  THE
    DOCUMENTED DEFAULT AT CLUSTER SCALE IS ``"sidecar"``: it preserves
    per-turn text (the north-star equality contract) while keeping text
    bytes out of the all-to-all entirely, so the wide payload scales like
    the narrow path (measured 8->32 CPU numbers in BASELINE.md §"text
    layout").  The parameter default resolves to ``"carried"`` only for
    backward compatibility of small self-contained outputs — cluster
    deployments should pass ``text_layout="sidecar"`` explicitly (the
    bench's wide scaling variant measures sidecar for this reason).

    - ``"carried"``: text/tool ride through the shuffle into the feature
      partitions (self-contained output; text bytes dominate the exchange).
    - ``"none"``: features only; readers fetch turn text from the source by
      ``(conv_id, turn_idx)``.
    - ``"sidecar"``: map tasks write text to ``out_dir/text/`` DIRECTLY
      (input-shard partitioned, NO SHUFFLE — text bytes never enter the
      exchange) and the feature exchange runs narrow.  Text co-location is
      never needed: features reference turns by ``(conv_id, turn_idx)``, so
      the wide payload can skip the all-to-all entirely — this is the
      text-preserving layout that scales like the narrow path (the wide
      path's 8→32 wall in BASELINE.md is exactly the text bytes on the
      shared memory bus).  Sidecar writes are idempotent per input chunk
      (content-addressed file names) so resume re-runs are safe.
    """
    from feast_ray.exchange import exchange_grouped

    if text_layout is None:
        text_layout = "carried" if carry_text else "none"
    if text_layout not in ("carried", "packed", "none", "sidecar"):
        raise ValueError(f"unknown text_layout {text_layout!r}")
    files = _resolve_files(input_path)
    b = num_buckets or default_num_buckets()
    fingerprint = config_fingerprint(
        {
            "input": sorted(files),
            "session_gap_s": session_gap_s,
            "roll_turns": roll_turns,
            "roll_time_s": roll_time_s,
            "num_buckets": b,
            "text_layout": text_layout,
            "kernel_version": 2,
        }
    )
    done = load_done_partitions(out_dir, fingerprint) if resume else set()
    if skip_buckets:
        done = done | set(skip_buckets)

    specs = default_specs(roll_turns, roll_time_s, session_gap_s)
    wk = make_window_kernel(specs, "ts")

    narrow_cols = [
        "conv_id", "turn_idx", "ts", "role",
        "msg_len", "is_user", "is_assistant", "is_tool", "has_tool_call",
    ]
    text_dir = os.path.join(out_dir, "text")

    def map_fn(tbl: pa.Table, paths) -> pa.Table:
        tbl = _derive_turn_columns(tbl)
        if text_layout == "sidecar":
            _write_text_sidecar(tbl, text_dir, paths)
        if text_layout not in ("carried", "packed"):
            tbl = tbl.select(narrow_cols)
        return tbl

    def reduce_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        return _session_extras(wk(t, starts), starts)

    def sink_fn(part_id: int, out: Optional[pa.Table]) -> dict:
        # crash-injection hook for the resume tests: simulate a job dying
        # mid-run AFTER some partitions landed (env is read in the remote
        # task — set it before ray.init in the crashing process)
        fault_after = int(os.environ.get("FEAST_RAY_FAULT_AFTER_PARTS", "-1"))
        if 0 <= fault_after <= part_id:
            raise RuntimeError(f"injected fault before partition {part_id}")
        t0 = time.perf_counter()
        if out is None:
            write_manifest(
                out_dir, part_id, fingerprint=fingerprint, rows=0, bytes_written=0, wall_s=0.0
            )
            return {"part_id": part_id, "rows": 0, "bytes": 0, "wall_s": 0.0}
        _, nbytes = write_partition_atomic(out, out_dir, part_id)
        wall = time.perf_counter() - t0
        write_manifest(
            out_dir,
            part_id,
            fingerprint=fingerprint,
            rows=out.num_rows,
            bytes_written=nbytes,
            wall_s=wall,
        )
        return {"part_id": part_id, "rows": out.num_rows, "bytes": nbytes, "wall_s": wall}

    t0 = time.perf_counter()
    results = exchange_grouped(
        files,
        keys=["conv_id"],
        sort_keys=["ts", "turn_idx"],
        reduce_kernel=reduce_kernel,
        num_buckets=b,
        map_fn=map_fn,
        map_fn_takes_paths=True,
        sink_fn=sink_fn,
        files_per_task=files_per_task,
        skip_buckets=done,
        # "packed": carried semantics, but text/tool cross the exchange as
        # one zstd IPC blob per slice — trades cheap CPU for the shared
        # memory-bus bytes that wall the wide path's 8->32 scaling
        pack_cols=["text", "tool"] if text_layout == "packed" else None,
        shard_rounds=shard_rounds,
        map_side_sort=map_side_sort,
    )
    wall = time.perf_counter() - t0
    rows = sum(r["rows"] for r in results)
    return {
        "partitions_written": len(results),
        "partitions_skipped": len(done),
        "rows": rows,
        "bytes": sum(r["bytes"] for r in results),
        "wall_s": wall,
        "turns_per_sec": rows / wall if wall > 0 else 0.0,
        "fingerprint": fingerprint,
    }


# ---------------------------------------------------------------------------
# Incremental materialization (SURVEY §3.2 — materialize_incremental analog)
# ---------------------------------------------------------------------------

WATERMARK_FILE = "_state/watermark.json"


def _load_watermark(out_dir: str):
    import json

    p = os.path.join(out_dir, WATERMARK_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _store_watermark(
    out_dir: str, end_ts_us: int, n_runs: int, config: Optional[dict] = None
) -> None:
    import json
    import tempfile

    sdir = os.path.join(out_dir, "_state")
    os.makedirs(sdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=sdir)
    payload = {"end_ts_us": int(end_ts_us), "runs": n_runs}
    if config is not None:
        payload["config"] = config
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(out_dir, WATERMARK_FILE))


def _max_ts_from_stats(dset) -> int:
    """Global max(ts) from parquet row-group statistics (metadata-only scan;
    falls back to a column read for files written without stats)."""
    best = None
    need_scan = False
    for frag in dset.get_fragments():
        md = frag.metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = schema_names.index("ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                need_scan = True
                break
            v = st.max
            if isinstance(v, int):
                v_us = v
            else:  # datetime (tz-aware = a UTC instant); drop tz for numpy
                v_us = int(np.datetime64(v.replace(tzinfo=None), "us").astype(np.int64))
            best = v_us if best is None else max(best, v_us)
        if need_scan:
            break
    if need_scan or best is None:
        col = dset.to_table(columns=["ts"]).column("ts").cast(pa.int64())
        best = int(pc.max(col).as_py())
    return best


def backfill_incremental(
    input_path,
    out_dir: str,
    *,
    session_gap_s: int = 1800,
    roll_turns: int = 5,
    roll_time_s: int = 600,
    num_buckets: Optional[int] = None,
    carry_text: bool = True,
    text_layout: Optional[str] = None,
    files_per_task: int = 1,
    allowed_lateness_s: int = 0,
) -> dict:
    """Incremental flagship backfill: recompute only the hash buckets that
    contain conversations with NEW turns since the stored watermark.
    ``text_layout`` passes through to ``backfill_transcripts`` (overrides
    the legacy ``carry_text`` flag; part of the watermark config, so a
    layout change forces the full recompute it requires).

    The reference's increment unit is a per-feature-view end-time watermark
    (upstream ``feature_store.py::materialize_incremental`` via
    ``FeatureView.most_recent_end_time``); ours is that watermark PLUS the
    partition manifests: affected conversations are recomputed from full
    history (exact for every window/session feature — no lookback-bound
    approximation), unaffected buckets are skipped entirely.

    ``allowed_lateness_s`` is the LATE-DATA contract (the reference's
    analog: last-write-wins on the next ``materialize`` run): a row may
    arrive with an event time up to this many seconds BEHIND the stored
    watermark and still re-open its conversation's closed partition — the
    affected-bucket scan runs from ``watermark - allowed_lateness`` instead
    of the watermark, so any partition a late row violates is recomputed
    from full history (exact, not patched).  Rows later than the bound are
    out of contract and silently missed until the next config change —
    size the bound from measured disorder (``disorder_stats_user``:
    max_late_us per entity).  Cost: every run re-reduces the buckets with
    events inside the lateness window, so the bound prices recompute, not
    correctness.

    Scale note: with a (conv_id, ts)-partitioned input layout the read of
    unaffected data prunes at the fragment level; in this flat-file local
    layout map tasks still read all files but drop non-affected buckets
    before the exchange (reduce work — the dominant cost — is saved).
    """
    from feast_ray.grouped import hash_backend_id, hash_columns

    files = _resolve_files(input_path)
    b = num_buckets or default_num_buckets()
    if text_layout is None:
        text_layout = "carried" if carry_text else "none"
    wm = _load_watermark(out_dir)

    # Anything that determines WHICH bucket a conversation lands in or WHAT
    # a bucket's feature rows contain must match the stored watermark's
    # config; otherwise skipping "unaffected" buckets would silently keep
    # stale or misbucketed output.  On mismatch: full recompute, and stale
    # part dirs beyond the new bucket count are removed.
    wm_config = {
        "session_gap_s": session_gap_s,
        "roll_turns": roll_turns,
        "roll_time_s": roll_time_s,
        "num_buckets": b,
        "text_layout": text_layout,
        "hash_backend": hash_backend_id(),
        "kernel_version": 2,
    }
    if wm is not None and wm.get("config") != wm_config:
        # remove EVERY part dir >= the new bucket count — the old count may
        # be unknown (pre-config watermark), so glob instead of trusting it
        import glob as _glob
        import shutil

        from feast_ray.state.manifest import manifest_path, partition_dir

        for pdir in _glob.glob(os.path.join(out_dir, "part=*")):
            try:
                pid = int(os.path.basename(pdir).split("=", 1)[1])
            except ValueError:
                continue
            if pid >= b:
                shutil.rmtree(partition_dir(out_dir, pid), ignore_errors=True)
                mp = manifest_path(out_dir, pid)
                if os.path.exists(mp):
                    os.unlink(mp)
        wm = None  # config changed: force full recompute

    import pyarrow.dataset as pads

    dset = pads.dataset(files, format="parquet")
    if wm is None:
        affected = None  # first run or config change: everything
    else:
        scan_from_us = wm["end_ts_us"] - allowed_lateness_s * 1_000_000
        cutoff = pa.scalar(scan_from_us, type=pa.int64()).cast(
            pa.timestamp("us", tz="UTC")
        )
        new_rows = dset.to_table(
            columns=["conv_id"], filter=pads.field("ts") > cutoff
        )
        if new_rows.num_rows == 0:
            return {
                "partitions_written": 0,
                "partitions_skipped": b,
                "rows": 0,
                "new_turns": 0,
                "watermark_us": wm["end_ts_us"],
            }
        convs = pc.unique(new_rows["conv_id"])
        hb = hash_columns(pa.table({"conv_id": convs}), ["conv_id"]) % np.uint64(b)
        affected = set(int(x) for x in np.unique(hb))

    skip = None if affected is None else set(range(b)) - affected
    res = backfill_transcripts(
        files,
        out_dir,
        session_gap_s=session_gap_s,
        roll_turns=roll_turns,
        roll_time_s=roll_time_s,
        num_buckets=b,
        resume=False,  # skipping is driven by the watermark, not manifests
        text_layout=text_layout,
        files_per_task=files_per_task,
        skip_buckets=skip or set(),
    )
    end_ts_us = _max_ts_from_stats(dset)
    _store_watermark(out_dir, end_ts_us, (wm or {}).get("runs", 0) + 1, wm_config)
    res["new_buckets"] = b if affected is None else len(affected)
    res["new_turns"] = res["rows"] if wm is None else int(new_rows.num_rows)
    res["watermark_us"] = end_ts_us
    return res
