"""Entity erasure + output integrity audit over the partitioned backfill
output — the data-management surface a feature store owes its operators:

- :func:`erase_entities` — GDPR-style "right to be forgotten": remove every
  row of a set of entity ids from a finished backfill (feature partitions
  AND sidecar text), atomically and idempotently, WITHOUT touching
  unaffected partitions (their bytes stay identical, so incremental
  consumers and resume bookkeeping are undisturbed).
- :func:`fsck_output` — re-reads every manifested partition and checks
  rows / bytes / readability against its manifest: the cheap integrity
  audit to run before promoting an output.

Shape: one Ray task per partition (raw tasks, not Dataset — this is an
in-place partition rewrite keyed by the output's own layout, which the
Dataset API cannot express).  Parquet row-group statistics on ``conv_id``
prune untouched partitions WITHOUT decoding them: at 100 TB the erase cost
is O(partitions containing the entity), not O(corpus).

Upstream analog: Feast has no erasure primitive (SURVEY §2 K1 covers only
persist); this is a beyond-reference operator the task brief's
data-management family requires.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from feast_ray.state.manifest import (load_manifests, manifest_path,
                                      partition_dir)


def _stats_may_contain(path: str, ids: list, key: str) -> bool:
    """True unless the file's row-group min/max statistics on ``key`` prove
    no target id can be present (the no-decode pruning fast path).  Works
    for integer AND string keys (parquet orders both; strings compare
    lexicographically, matching the stats)."""
    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return True
    lo, hi = min(ids), max(ids)
    for rg in range(md.num_row_groups):
        col = None
        for ci in range(md.num_columns):
            c = md.row_group(rg).column(ci)
            if c.path_in_schema == key:
                col = c
                break
        if col is None or col.statistics is None or not col.statistics.has_min_max:
            return True
        mn, mx = col.statistics.min, col.statistics.max
        if isinstance(mn, bytes):
            mn = mn.decode("utf-8", "surrogateescape")
        if isinstance(mx, bytes):
            mx = mx.decode("utf-8", "surrogateescape")
        if mx < lo or mn > hi:
            continue
        # range overlaps a target id's range: any id inside [mn, mx]?
        if any(mn <= v <= mx for v in ids):
            return True
    return False


def _erase_from_file(path: str, ids: list, key: str) -> tuple[int, int]:
    """Rewrite ``path`` without rows whose ``key`` is in ``ids`` (atomic,
    preserving the writer's codec/stats conventions).  Returns
    (rows_removed, rows_remaining); (0, n) leaves the file untouched."""
    tbl = pq.read_table(path)
    hit = pc.is_in(tbl[key].combine_chunks(), value_set=pa.array(ids))
    removed = int(pc.sum(pc.cast(hit, pa.int64())).as_py() or 0)
    if removed == 0:
        return 0, tbl.num_rows
    kept = tbl.filter(pc.invert(hit))
    import tempfile

    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        stats = [c for c in ("conv_id", "ts") if c in kept.schema.names]
        pq.write_table(kept, tmp, compression="zstd", compression_level=1,
                       write_statistics=stats or True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return removed, kept.num_rows


def erase_entities(
    out_dir: str,
    entity_ids: Sequence[int],
    *,
    key: str = "conv_id",
    concurrency: int = 16,
) -> dict:
    """Remove every row of ``entity_ids`` from a finished backfill output.

    Feature partitions (``part=*/data.parquet``) and sidecar text
    (``text/part-*.parquet``) are both scrubbed; each affected file is
    rewritten atomically and its manifest updated in place (same
    fingerprint — resume bookkeeping survives — with an ``erased`` audit
    record appended).  Idempotent: a second call with the same ids is a
    no-op.  Returns ``{"rows_removed", "partitions_rewritten",
    "partitions_skipped", "text_files_rewritten"}``.
    """
    import ray

    ids = sorted(set(entity_ids))
    if len(ids) == 0:
        return {"rows_removed": 0, "partitions_rewritten": 0,
                "partitions_skipped": 0, "text_files_rewritten": 0}
    ids_ref = ray.put(ids)

    @ray.remote(num_cpus=1)
    def scrub_partition(pdir: str, key_: str):
        ids_ = ray.get(ids_ref)
        path = os.path.join(pdir, "data.parquet")
        if not os.path.exists(path):
            return ("missing", 0, 0)
        if not _stats_may_contain(path, ids_, key_):
            return ("skipped", 0, 0)
        removed, remaining = _erase_from_file(path, ids_, key_)
        if removed == 0:
            return ("skipped", 0, 0)
        return ("rewritten", removed, remaining)

    manis = load_manifests(out_dir)
    futs = {}
    for m in manis:
        pid = int(m["part_id"])
        futs[pid] = scrub_partition.remote(partition_dir(out_dir, pid), key)
    rows_removed = 0
    rewritten = 0
    skipped = 0
    for m in manis:
        pid = int(m["part_id"])
        status, removed, remaining = ray.get(futs[pid])
        if status == "rewritten":
            rows_removed += removed
            rewritten += 1
            # update the manifest in place: same fingerprint (resume
            # still sees DONE), corrected rows/bytes, audit trail
            mp = manifest_path(out_dir, pid)
            rec = dict(m)
            rec["rows"] = int(m["rows"]) - removed
            rec["bytes"] = os.path.getsize(
                os.path.join(partition_dir(out_dir, pid), "data.parquet"))
            rec.setdefault("erased", []).append(
                {"n_ids": int(len(ids)), "rows_removed": int(removed)})
            import tempfile

            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(mp), suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, mp)
        else:
            skipped += 1

    # sidecar text (layout: text/part-<digest>.parquet, stats on conv_id)
    text_dir = os.path.join(out_dir, "text")
    text_rewritten = 0
    if os.path.isdir(text_dir):
        tfiles = sorted(
            os.path.join(text_dir, f) for f in os.listdir(text_dir)
            if f.endswith(".parquet"))

        @ray.remote(num_cpus=1)
        def scrub_text(path: str, key_: str):
            ids_ = ray.get(ids_ref)
            if not _stats_may_contain(path, ids_, key_):
                return 0
            removed, _ = _erase_from_file(path, ids_, key_)
            return removed

        for removed in ray.get([scrub_text.remote(p, key) for p in tfiles]):
            if removed:
                rows_removed += removed
                text_rewritten += 1
    return {
        "rows_removed": rows_removed,
        "partitions_rewritten": rewritten,
        "partitions_skipped": skipped,
        "text_files_rewritten": text_rewritten,
    }


def fsck_output(out_dir: str, *, concurrency: int = 16) -> dict:
    """Integrity audit of a backfill output: every manifested partition is
    re-read and checked — file exists, parquet readable, row count matches
    the manifest, byte size matches the manifest.  Returns the summary +
    per-partition issue list (empty = promotable)."""
    import ray

    @ray.remote(num_cpus=1)
    def check(pdir: str, want_rows: int, want_bytes: int):
        path = os.path.join(pdir, "data.parquet")
        if not os.path.exists(path):
            return "missing file"
        try:
            md = pq.ParquetFile(path).metadata
        except Exception as e:  # noqa: BLE001 — report, don't crash the audit
            return f"unreadable: {e}"
        if md.num_rows != want_rows:
            return f"rows {md.num_rows} != manifest {want_rows}"
        size = os.path.getsize(path)
        if size != want_bytes:
            return f"bytes {size} != manifest {want_bytes}"
        return None

    manis = load_manifests(out_dir)
    futs = [
        check.remote(partition_dir(out_dir, int(m["part_id"])),
                     int(m["rows"]), int(m["bytes"]))
        for m in manis
    ]
    issues = []
    for m, res in zip(manis, ray.get(futs)):
        if res is not None:
            issues.append({"part_id": int(m["part_id"]), "issue": res})
    return {
        "partitions": len(manis),
        "rows_total": int(sum(int(m["rows"]) for m in manis)),
        "issues": issues,
        "ok": not issues,
    }
