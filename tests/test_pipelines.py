"""End-to-end pipelines: historical retrieval vs oracle; backfill sink,
manifests, metrics, and checkpointed resume equivalence."""

from __future__ import annotations

import glob
import os
import shutil
from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from feast_ray.pipelines.backfill import backfill_transcripts, transcript_feature_dataset
from feast_ray.pipelines.historical import get_historical_features
from feast_ray.specs import FeatureView, ParquetSource
from feast_ray.state.manifest import load_manifests, manifest_path, partition_dir
from tests.oracle import oracle_asof
from tests.util import assert_frames_match

TTL = timedelta(hours=1)
TTL_US = 3600 * 1_000_000


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory, transcripts_tbl, features_tbl, spine_tbl):
    d = tmp_path_factory.mktemp("fixdata")
    pq.write_table(transcripts_tbl, d / "transcripts.parquet")
    pq.write_table(features_tbl, d / "features_numeric.parquet")
    pq.write_table(spine_tbl.take(pa.array(range(300))), d / "spine.parquet")
    return str(d)


def test_historical_retrieval_matches_oracle(ray_session, fixture_dir, features_tbl, spine_tbl):
    view = FeatureView(
        name="convfeat",
        join_keys=("conv_id",),
        source=ParquetSource(
            path=os.path.join(fixture_dir, "features_numeric.parquet"),
            timestamp_field="ts",
            created_timestamp_column="created_ts",
        ),
        ttl=TTL,
        features=("msg_len", "value"),
    )
    got = get_historical_features(
        os.path.join(fixture_dir, "spine.parquet"), [view], num_buckets=5
    ).to_pandas()
    spine_pdf = spine_tbl.take(pa.array(range(300))).to_pandas()
    want = oracle_asof(
        spine_pdf,
        features_tbl.to_pandas(),
        key="conv_id",
        created_ts="created_ts",
        ttl_us=TTL_US,
        feature_cols=["msg_len", "value"],
    )
    assert_frames_match(
        got, want, row_key=["conv_id", "ts", "turn_idx"], cols=["msg_len", "value"]
    )


def test_historical_full_feature_names_and_udf(ray_session, fixture_dir):
    view = FeatureView(
        name="convfeat",
        join_keys=("conv_id",),
        source=ParquetSource(
            path=os.path.join(fixture_dir, "features_numeric.parquet"),
            timestamp_field="ts",
            created_timestamp_column="created_ts",
        ),
        ttl=TTL,
        features=("msg_len", "value"),
    )

    def odfv(df: pd.DataFrame) -> pd.DataFrame:  # on-demand transform (M8)
        df["value_per_char"] = df["convfeat__value"] / df["convfeat__msg_len"].clip(lower=1)
        return df

    got = get_historical_features(
        os.path.join(fixture_dir, "spine.parquet"),
        [view],
        full_feature_names=True,
        on_demand_transform=odfv,
        num_buckets=4,
    ).to_pandas()
    assert {"convfeat__msg_len", "convfeat__value", "value_per_char"} <= set(got.columns)


def test_backfill_writes_resumes_and_preserves_text(ray_session, fixture_dir, transcripts_tbl, tmp_path):
    out1 = str(tmp_path / "run_single")
    inp = os.path.join(fixture_dir, "transcripts.parquet")
    m1 = backfill_transcripts(inp, out1, num_buckets=8, resume=False)
    assert m1["rows"] == transcripts_tbl.num_rows
    assert m1["partitions_written"] >= 1
    manifests = load_manifests(out1)
    assert sum(r["rows"] for r in manifests) == transcripts_tbl.num_rows
    assert all(r["status"] == "done" and r["wall_s"] > 0 for r in manifests)

    # per-turn text byte-equality under stable turn ordering
    got = pq.read_table(out1).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    want = (
        transcripts_tbl.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()

    # simulate a partially-failed run: copy output, delete 2 partitions
    out2 = str(tmp_path / "run_resume")
    shutil.copytree(out1, out2)
    victims = [r["part_id"] for r in manifests[:2]]
    for pid in victims:
        os.unlink(manifest_path(out2, pid))
        shutil.rmtree(partition_dir(out2, pid))
    m2 = backfill_transcripts(inp, out2, num_buckets=8, resume=True)
    assert m2["partitions_written"] == len(victims)
    assert m2["partitions_skipped"] == len(manifests) - len(victims)

    # resumed output equals the single-shot run
    a = pq.read_table(out1).to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    b = pq.read_table(out2).to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert a.shape == b.shape
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_feature_dataset_matches_backfill(ray_session, fixture_dir, tmp_path):
    inp = os.path.join(fixture_dir, "transcripts.parquet")
    out = str(tmp_path / "bf")
    backfill_transcripts(inp, out, num_buckets=4, resume=False)
    import ray.data as rd

    lazy = transcript_feature_dataset(rd.read_parquet(inp), num_buckets=4).to_pandas()
    written = pq.read_table(out).to_pandas().drop(columns=["part"])  # hive partition col
    key = ["conv_id", "turn_idx"]
    lazy = lazy.sort_values(key, kind="stable").reset_index(drop=True)
    written = written.sort_values(key, kind="stable").reset_index(drop=True)
    assert sorted(lazy.columns) == sorted(written.columns)
    for c in ["session_id", "session_turn_seq", "msg_len_r5_mean", "lag1_msg_len"]:
        lv = lazy[c].to_numpy(dtype=float, na_value=np.nan)
        wv = written[c].to_numpy(dtype=float, na_value=np.nan)
        assert np.allclose(lv, wv, equal_nan=True)


def test_persist_and_reload_saved_dataset(ray_session, tmp_path, fixture_dir):
    """K1 persist analog: retrieval result -> partitioned parquet +
    dataset manifest -> lazy reload with identical content."""
    import ray.data as rd

    from feast_ray.state.manifest import load_saved_dataset, persist_dataset

    ds = rd.read_parquet(os.path.join(fixture_dir, "features_numeric.parquet"))
    out = str(tmp_path / "saved")
    rec = persist_dataset(ds, out, name="convfeat_training", config={"v": 1})
    assert rec["status"] == "done" and rec["rows"] == ds.count()
    re_ds, re_rec = load_saved_dataset(out)
    assert re_rec["name"] == "convfeat_training"
    a = ds.to_pandas().sort_values(["conv_id", "ts"]).reset_index(drop=True)
    b = re_ds.to_pandas().sort_values(["conv_id", "ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert set(a.columns) == set(b.columns)


def test_historical_udf_numpy_dict_mode(ray_session, fixture_dir):
    """ODFV native/dict mode analog (upstream transform_dict): the UDF sees
    a dict of numpy arrays (batch_format='numpy') instead of pandas."""
    import numpy as np

    view = FeatureView(
        name="convfeat",
        join_keys=("conv_id",),
        source=ParquetSource(
            path=os.path.join(fixture_dir, "features_numeric.parquet"),
            timestamp_field="ts",
            created_timestamp_column="created_ts",
        ),
        ttl=TTL,
        features=("msg_len", "value"),
    )

    def odfv(batch: dict) -> dict:
        batch["value_per_char"] = batch["value"] / np.maximum(batch["msg_len"], 1)
        return batch

    got = get_historical_features(
        os.path.join(fixture_dir, "spine.parquet"),
        [view],
        on_demand_transform=odfv,
        on_demand_batch_format="numpy",
        num_buckets=4,
    ).to_pandas()
    assert "value_per_char" in got.columns
    m = got["value"].notna()
    want = got.loc[m, "value"] / got.loc[m, "msg_len"].clip(lower=1)
    assert np.allclose(got.loc[m, "value_per_char"], want, equal_nan=True)


def test_backfill_sidecar_text_layout(ray_session, fixture_dir, transcripts_tbl, tmp_path):
    """text_layout='sidecar': features equal the narrow run; the sidecar
    holds every turn's text exactly once (text never entered the shuffle)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from feast_ray.pipelines.backfill import backfill_transcripts, load_text_sidecar

    inp = os.path.join(fixture_dir, "transcripts.parquet")
    out_sc = str(tmp_path / "sidecar")
    out_nw = str(tmp_path / "narrow")
    backfill_transcripts(inp, out_sc, num_buckets=6, text_layout="sidecar")
    backfill_transcripts(inp, out_nw, num_buckets=6, text_layout="none")

    def read_parts(d):
        files = sorted(glob.glob(os.path.join(d, "part=*", "data.parquet")))
        return (
            pa.concat_tables([pq.read_table(f) for f in files])
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    sc, nw = read_parts(out_sc), read_parts(out_nw)
    assert list(sc.columns) == list(nw.columns)  # no text columns in features
    assert "text" not in sc.columns
    assert len(sc) == len(nw) == transcripts_tbl.num_rows
    for c in nw.columns:
        a, b = sc[c], nw[c]
        if a.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float), equal_nan=True), c
        else:
            assert a.where(a.notna(), None).tolist() == b.where(b.notna(), None).tolist(), c

    # sidecar text: exactly the input turns' text
    side = (
        load_text_sidecar(out_sc)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts_tbl.select(["conv_id", "turn_idx", "text", "tool"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(side) == len(want)
    assert (side["text"] == want["text"]).all()

    # resume idempotence: re-run skips everything, sidecar files unchanged
    before = sorted(glob.glob(os.path.join(out_sc, "text", "*.parquet")))
    r = backfill_transcripts(inp, out_sc, num_buckets=6, text_layout="sidecar")
    assert r["partitions_written"] == 0
    assert sorted(glob.glob(os.path.join(out_sc, "text", "*.parquet"))) == before


def test_backfill_packed_layout_matches_carried(ray_session, tmp_path):
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from feast_ray.fixtures import gen_transcripts
    from feast_ray.pipelines.backfill import backfill_transcripts

    tbl = gen_transcripts(n_convs=150, mean_turns=25, seed=9)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        part = tbl.slice(i * 1500, 1500)
        if part.num_rows:
            pq.write_table(part, src / f"p{i}.parquet")

    outs = {}
    for layout in ("carried", "packed"):
        od = tmp_path / f"out_{layout}"
        backfill_transcripts(
            str(src), str(od), num_buckets=3, resume=False, text_layout=layout
        )
        t = pa.concat_tables(
            [pq.read_table(p) for p in sorted(glob.glob(str(od) + "/part=*/**/*.parquet", recursive=True))]
        )
        idx = pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        outs[layout] = t.take(idx)
    a, b = outs["carried"], outs["packed"]
    assert a.num_rows == b.num_rows
    assert sorted(a.column_names) == sorted(b.column_names)
    assert a.equals(b.select(a.column_names))


def test_backfill_crash_resume_at_scale(ray_session, tmp_path):
    """A job that DIES mid-run (injected crash in the remote sink after
    ~half the partitions) resumes from manifests, writes only the missing
    partitions, and the combined output equals a single-shot run —
    partition writes are atomic so no torn partition is ever visible."""
    import glob
    import os
    import subprocess
    import sys

    import pandas as pd
    import pyarrow.parquet as pq

    from feast_ray.fixtures import gen_transcripts
    from feast_ray.pipelines.backfill import backfill_transcripts
    from feast_ray.state.manifest import load_manifests

    tbl = gen_transcripts(n_convs=4000, mean_turns=40, seed=31, n_hot=2, hot_turns=2000)
    src = tmp_path / "in"
    src.mkdir()
    step = (tbl.num_rows + 7) // 8
    for i in range(8):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, src / f"p{i}.parquet")

    out_crash = str(tmp_path / "out_crash")
    # phase 1: fresh process whose sink raises for part_id >= 8 of 16 —
    # the job dies with roughly half the partitions durably written
    code = (
        "import ray, sys\n"
        "ray.init(address='local', num_cpus=4, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "from feast_ray.pipelines.backfill import backfill_transcripts\n"
        "try:\n"
        "    backfill_transcripts(sys.argv[1], sys.argv[2], num_buckets=16)\n"
        "    print('NOFAULT')\n"
        "except Exception as e:\n"
        "    print('CRASHED', type(e).__name__)\n"
        "finally:\n"
        "    ray.shutdown()\n"
    )
    env = dict(os.environ, FEAST_RAY_FAULT_AFTER_PARTS="8")
    env.pop("RAY_ADDRESS", None)
    p = subprocess.run(
        [sys.executable, "-c", code, str(src), out_crash],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=300,
    )
    assert "CRASHED" in p.stdout, p.stdout + p.stderr
    done_before = load_manifests(out_crash)
    assert 1 <= len(done_before) < 16  # partial progress survived the crash

    # phase 2: resume in THIS session — only the missing partitions run
    m = backfill_transcripts(str(src), out_crash, num_buckets=16, resume=True)
    assert m["partitions_skipped"] == len(done_before)
    assert m["partitions_written"] == 16 - len(done_before)

    # single-shot reference
    out_ref = str(tmp_path / "out_ref")
    backfill_transcripts(str(src), out_ref, num_buckets=16, resume=False)

    def read_sorted(d):
        files = sorted(glob.glob(d + "/part=*/**/*.parquet", recursive=True))
        df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)

    a, b = read_sorted(out_crash), read_sorted(out_ref)
    assert a.shape == b.shape
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_export_jsonl_roundtrip_and_idempotent(ray_session, tmp_path):
    """JSONL export: read-back equality via DuckDB, idempotent re-export
    (content-addressed shards — second run writes nothing new)."""
    import json
    import os

    import duckdb
    import ray.data as rd

    from feast_ray.pipelines.export import export_jsonl

    src = "/root/testdata/sf0.001/documents.parquet"
    ds = rd.read_parquet(src, columns=["doc_id", "text", "source"]).repartition(2)
    out = str(tmp_path / "export")
    idx = export_jsonl(ds, out)
    assert idx["n_rows"] == 500 and idx["n_shards"] >= 1

    con = duckdb.connect()
    back = con.execute(
        f"SELECT doc_id, source, text FROM read_json_auto('{out}/shard-*.jsonl') ORDER BY doc_id"
    ).fetchdf()
    want = con.execute(
        f"SELECT doc_id, source, text FROM read_parquet('{src}') ORDER BY doc_id"
    ).fetchdf()
    assert back.equals(want)

    mtimes = {p: os.path.getmtime(f"{out}/{p}") for p in os.listdir(out)
              if p.endswith(".jsonl")}
    idx2 = export_jsonl(
        rd.read_parquet(src, columns=["doc_id", "text", "source"]).repartition(2),
        out,
    )
    assert idx2["n_rows"] == idx["n_rows"]
    assert {s["sha"] for s in idx2["shards"]} == {s["sha"] for s in idx["shards"]}
    for p, m in mtimes.items():
        assert os.path.getmtime(f"{out}/{p}") == m  # untouched on re-export
    assert json.load(open(f"{out}/_export.json"))["n_rows"] == 500


def test_feature_service_bundle(ray_session, fixture_dir):
    """Passing a FeatureSpec (the FeatureService analog) equals passing its
    views with its full_feature_names flag."""
    from feast_ray.specs import FeatureSpec

    view = FeatureView(
        name="convfeat",
        join_keys=("conv_id",),
        source=ParquetSource(
            path=os.path.join(fixture_dir, "features_numeric.parquet"),
            timestamp_field="ts",
            created_timestamp_column="created_ts",
        ),
        ttl=TTL,
        features=("msg_len", "value"),
    )
    svc = FeatureSpec(name="svc", views=(view,), full_feature_names=True)
    got = get_historical_features(
        os.path.join(fixture_dir, "spine.parquet"), svc, num_buckets=5
    ).to_pandas()
    want = get_historical_features(
        os.path.join(fixture_dir, "spine.parquet"), [view],
        full_feature_names=True, num_buckets=5,
    ).to_pandas()
    key = ["conv_id", "ts", "turn_idx"]
    assert "convfeat__msg_len" in got.columns
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)


def test_curate_then_export_end_to_end(ray_session, tmp_path):
    """The full training-data story in one test: curation verdicts ->
    kept docs joined back to text -> JSONL shard export -> DuckDB
    read-back equals the kept set."""
    import duckdb
    import ray.data as rd

    from feast_ray.pipelines.export import export_jsonl
    from feast_ray.pipelines.queries_docs import q_curate_corpus_docs

    sf = "/root/testdata/sf0.001"
    verdicts = q_curate_corpus_docs(sf).to_pandas()
    kept_ids = sorted(verdicts.loc[verdicts["kept"] == 1, "doc_id"])
    assert len(kept_ids) > 0

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    kept = docs[docs["doc_id"].isin(kept_ids)].reset_index(drop=True)
    out = str(tmp_path / "corpus")
    idx = export_jsonl(rd.from_pandas(kept).repartition(2), out)
    assert idx["n_rows"] == len(kept_ids)

    back = duckdb.connect().execute(
        f"SELECT doc_id FROM read_json_auto('{out}/shard-*.jsonl') ORDER BY doc_id"
    ).fetchdf()
    assert list(back["doc_id"]) == kept_ids


def test_backfill_shard_rounds_parity(ray_session, fixture_dir, transcripts_tbl, tmp_path):
    """shard_rounds (the 100-TB object-count valve, exchange.py) must be a
    pure execution-shape knob: R sequential key-range passes produce
    byte-identical feature partitions to the single-pass exchange, including
    at the num_returns==1 edge (shard_rounds == num_buckets) and composed
    with the sidecar text layout (whose content-addressed writes the
    re-passes must skip, not duplicate)."""
    inp = os.path.join(fixture_dir, "transcripts.parquet")

    def read_sorted(d):
        return (
            pq.read_table(d)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    ref = str(tmp_path / "r1")
    backfill_transcripts(inp, ref, num_buckets=8, resume=False, shard_rounds=1)
    want = read_sorted(ref)
    for rounds in (3, 8):  # uneven split + one-bucket-per-round edge
        out = str(tmp_path / f"r{rounds}")
        m = backfill_transcripts(inp, out, num_buckets=8, resume=False, shard_rounds=rounds)
        assert m["rows"] == transcripts_tbl.num_rows
        pd.testing.assert_frame_equal(read_sorted(out), want, check_like=True)

    # sidecar layout: text files written once, not once per round
    sc = str(tmp_path / "sc")
    backfill_transcripts(
        inp, sc, num_buckets=8, resume=False, shard_rounds=4, text_layout="sidecar"
    )
    text_files = [f for f in os.listdir(os.path.join(sc, "text")) if f.endswith(".parquet")]
    assert len(text_files) == 1  # one input chunk -> one content-addressed sidecar
    side = pq.read_table(os.path.join(sc, "text")).to_pandas()
    assert len(side) == transcripts_tbl.num_rows


def test_transcript_lifecycle_end_to_end(ray_session, tmp_path):
    """The north-star surfaces chained on one output (VERDICT r4 ask #8):
    sidecar backfill -> PIT multi-view retrieval over the materialized
    features -> leakage audit (zero temporal leaks) -> incremental backfill
    of a late batch -> GDPR erase -> fsck -> and the chained invariant: a
    further incremental run after erase is a clean no-op (manifests stay
    resumable, erased conversations stay erased)."""
    import glob as _glob

    from feast_ray.fixtures import gen_transcripts
    from feast_ray.pipelines.backfill import backfill_incremental
    from feast_ray.pipelines.erase import erase_entities, fsck_output
    from feast_ray.pipelines.historical import get_historical_features
    from feast_ray.specs import FeatureView, ParquetSource
    from feast_ray.stages.asof import asof_join

    tbl = gen_transcripts(n_convs=60, mean_turns=12, seed=77, n_hot=2, hot_turns=80)
    ts = tbl["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    cut = np.quantile(ts, 0.85)
    early, late = tbl.filter(pa.array(ts <= cut)), tbl.filter(pa.array(ts > cut))
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(early, src / "batch-000.parquet")

    out = str(tmp_path / "bf")
    kw = dict(num_buckets=8, session_gap_s=1800, roll_turns=5, roll_time_s=600)
    r1 = backfill_incremental(str(src), out, text_layout="sidecar", **kw)
    assert r1["rows"] == early.num_rows

    # ---- PIT multi-view retrieval over the materialized feature partitions
    part_files = sorted(_glob.glob(os.path.join(out, "part=*", "data.parquet")))
    spine = (
        early.to_pandas()
        .groupby("conv_id", as_index=False)
        .agg(ts=("ts", "max"))
        .head(40)
    )
    view_roll = FeatureView(
        name="roll", join_keys=("conv_id",),
        source=ParquetSource(path=part_files, timestamp_field="ts"),
        features=("msg_len_r5_count", "session_id"),
    )
    view_turn = FeatureView(
        name="turn", join_keys=("conv_id",),
        source=ParquetSource(path=part_files, timestamp_field="ts"),
        features=("msg_len",),
    )
    hist = get_historical_features(
        spine, [view_roll, view_turn], full_feature_names=True, num_buckets=4
    ).to_pandas()
    assert len(hist) == len(spine)
    assert {"roll__msg_len_r5_count", "turn__msg_len"} <= set(hist.columns)
    # spine ts == max feature ts per conv, so every row must match
    assert hist["roll__msg_len_r5_count"].notna().all()

    # ---- leakage audit: matched feature ts never exceeds the spine ts
    from feast_ray.sources.parquet import read_pq, spine_from

    leak = asof_join(
        spine_from(spine), read_pq(part_files), key="conv_id",
        feature_cols=["msg_len"], matched_ts_name="feat_ts", num_buckets=4,
    ).to_pandas()
    assert (leak["feat_ts"] <= leak["ts"]).all()

    # ---- late batch -> incremental recompute of affected buckets only
    pq.write_table(late, src / "batch-001.parquet")
    r2 = backfill_incremental(str(src), out, text_layout="sidecar", **kw)
    assert 0 < r2["new_buckets"] <= 8
    total = pq.ParquetDataset(
        sorted(_glob.glob(os.path.join(out, "part=*", "data.parquet")))
    ).read()
    assert total.num_rows == tbl.num_rows

    # ---- GDPR erase of three conversations, then fsck
    convs = sorted(set(tbl["conv_id"].to_pylist()))
    victims = convs[:3]
    res = erase_entities(out, victims)
    assert res["rows_removed"] > 0
    audit = fsck_output(out)
    assert audit["issues"] == []
    assert audit["rows_total"] == tbl.num_rows - res["rows_removed"] // 2

    # ---- chained invariant: incremental after erase is a no-op (no
    # resurrection of erased rows, manifests still resumable)
    r3 = backfill_incremental(str(src), out, text_layout="sidecar", **kw)
    assert r3["new_turns"] == 0 and r3["partitions_written"] == 0
    final = pq.ParquetDataset(
        sorted(_glob.glob(os.path.join(out, "part=*", "data.parquet")))
    ).read().to_pandas()
    assert not final["conv_id"].isin(victims).any()
    side = pq.read_table(os.path.join(out, "text")).to_pandas()
    assert not side["conv_id"].isin(victims).any()
    assert fsck_output(out)["issues"] == []
