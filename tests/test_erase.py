"""Entity erasure + fsck over the partitioned backfill output."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from feast_ray.pipelines.backfill import backfill_transcripts
from feast_ray.pipelines.erase import erase_entities, fsck_output
from feast_ray.state.manifest import load_manifests


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory, transcripts_tbl):
    d = tmp_path_factory.mktemp("erase_fixtures")
    pq.write_table(transcripts_tbl, d / "transcripts.parquet")
    return str(d)


def _file_hash(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_erase_entities_and_fsck(ray_session, fixture_dir, transcripts_tbl,
                                 tmp_path):
    out = str(tmp_path / "run")
    inp = os.path.join(fixture_dir, "transcripts.parquet")
    backfill_transcripts(inp, out, num_buckets=6, resume=False,
                         text_layout="sidecar")

    convs = transcripts_tbl["conv_id"].to_numpy(zero_copy_only=False)
    victims = sorted(set(convs.tolist()))[:3]
    n_victim_rows = int(np.isin(convs, victims).sum())
    assert n_victim_rows > 0

    # snapshot per-partition hashes to prove untouched partitions keep bytes
    before = {
        p: _file_hash(os.path.join(out, p, "data.parquet"))
        for p in os.listdir(out) if p.startswith("part=")
    }

    res = erase_entities(out, victims)
    # features + sidecar text both scrubbed
    assert res["rows_removed"] == 2 * n_victim_rows
    assert res["partitions_rewritten"] >= 1
    assert res["text_files_rewritten"] >= 1

    import glob

    feat_files = sorted(glob.glob(os.path.join(out, "part=*", "data.parquet")))
    got = pq.ParquetDataset(feat_files).read().to_pandas()
    assert not np.isin(got["conv_id"].to_numpy(), victims).any()
    assert len(got) == len(convs) - n_victim_rows
    text = pq.read_table(os.path.join(out, "text")).to_pandas()
    assert not np.isin(text["conv_id"].to_numpy(), victims).any()

    # untouched partitions byte-identical (no gratuitous rewrites)
    untouched = 0
    for p, h in before.items():
        path = os.path.join(out, p, "data.parquet")
        pdf = pq.read_table(path, columns=["conv_id"]).to_pandas()
        if _file_hash(path) == h:
            untouched += 1
    assert untouched == res["partitions_skipped"]

    # manifests corrected: rows sum to the remaining total; fsck is clean
    manis = load_manifests(out)
    assert sum(int(m["rows"]) for m in manis) == len(got)
    audit = fsck_output(out)
    assert audit["ok"] and audit["rows_total"] == len(got)

    # idempotent second erase: zero work
    res2 = erase_entities(out, victims)
    assert res2["rows_removed"] == 0
    assert res2["partitions_rewritten"] == 0

    # resume sees everything done (erase kept the fingerprints) — a re-run
    # over the same config writes nothing new
    m2 = backfill_transcripts(inp, out, num_buckets=6, resume=True,
                              text_layout="sidecar")
    assert m2["partitions_skipped"] == len(manis)


def test_fsck_detects_corruption(ray_session, fixture_dir, tmp_path):
    out = str(tmp_path / "run")
    inp = os.path.join(fixture_dir, "transcripts.parquet")
    backfill_transcripts(inp, out, num_buckets=4, resume=False)
    audit = fsck_output(out)
    assert audit["ok"]

    # truncate one partition file -> fsck must flag exactly that partition
    manis = load_manifests(out)
    victim = int(manis[0]["part_id"])
    path = os.path.join(out, f"part={victim:05d}", "data.parquet")
    with open(path, "r+b") as f:
        f.truncate(100)
    audit2 = fsck_output(out)
    assert not audit2["ok"]
    assert any(i["part_id"] == victim for i in audit2["issues"])
    assert len(audit2["issues"]) == 1
