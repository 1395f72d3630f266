"""Training-data export sink: JSONL shards with content-addressed names.

The delivery format most LLM training stacks ingest is sharded JSONL, not
parquet.  Each Ray block becomes one shard written ATOMICALLY (tmp file +
rename) under a name derived from the shard's content hash — a retried or
resumed task rewrites the identical bytes to the identical name, so the
export is idempotent with no coordination (same contract as the backfill's
partition manifests, `state/manifest.py`).  An `_export.json` index lists
every shard with row/byte counts for the consumer.

Scale shape: one map task per block, no shuffle; only the per-shard index
rows (one per block, bounded) reach the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import pyarrow as pa


def _write_shard_atomic(payload: bytes, out_dir: str, sha: str) -> str:
    final = os.path.join(out_dir, f"shard-{sha}.jsonl")
    if os.path.exists(final):  # idempotent: content-addressed name
        return final
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(payload)
    os.replace(tmp, final)
    return final


def export_jsonl(ds, out_dir: str) -> dict:
    """Export a Dataset to content-addressed JSONL shards; returns the
    index dict (also persisted as ``out_dir/_export.json``).

    Column order is normalized (sorted) and rows serialize with pandas'
    line-delimited JSON writer — deterministic for a deterministic input,
    so re-exports produce byte-identical shards.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64()),
                 "bytes": pa.array([], pa.int64()),
                 "sha": pa.array([], pa.string())}
            )
        df = t.select(sorted(t.column_names)).to_pandas()
        payload = df.to_json(
            orient="records", lines=True, force_ascii=True,
            date_format="iso", date_unit="us",
        ).encode("utf-8")
        sha = hashlib.sha256(payload).hexdigest()[:16]
        path = _write_shard_atomic(payload, out_dir, sha)
        return pa.table(
            {"path": pa.array([path]),
             "rows": pa.array([t.num_rows], pa.int64()),
             "bytes": pa.array([len(payload)], pa.int64()),
             "sha": pa.array([sha])}
        )

    shards = ds.map_batches(
        write_block, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one row per block — bounded
    index = {
        "n_shards": len(shards),
        "n_rows": int(sum(s["rows"] for s in shards)),
        "n_bytes": int(sum(s["bytes"] for s in shards)),
        "shards": sorted(
            ({k: s[k] for k in ("path", "rows", "bytes", "sha")} for s in shards),
            key=lambda s: s["sha"],
        ),
    }
    tmp = os.path.join(out_dir, "_export.json.tmp")
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_export.json"))
    return index
