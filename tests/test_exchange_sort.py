"""Reduce-side numeric sort fast path: collision fallback + parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from feast_ray.exchange import _H, _sort_and_group
from feast_ray.grouped import group_starts, sort_table


def _mk(convs, ts, h):
    return pa.table(
        {
            "conv_id": pa.array(convs),
            "ts": pa.array(np.asarray(ts, dtype=np.int64)),
            "turn_idx": pa.array(np.arange(len(convs), dtype=np.int64)),
            "v": pa.array(np.arange(len(convs), dtype=np.float64)),
            _H: pa.array(np.asarray(h, dtype=np.int64)),
        }
    )


def test_fast_path_matches_comparator_sort():
    rng = np.random.default_rng(1)
    convs = [f"c{i}" for i in rng.integers(0, 20, 200)]
    h = np.array([hash(c) & 0x7FFFFFFF for c in convs], dtype=np.int64)
    ts = rng.integers(0, 1000, 200)
    tbl = _mk(convs, ts, h)
    t, starts = _sort_and_group(tbl, ["conv_id"], ["conv_id", "ts", "turn_idx"])
    # every group is one conv, rows sorted by (ts, turn_idx) within group
    for g in range(len(starts) - 1):
        seg = t.slice(starts[g], starts[g + 1] - starts[g])
        assert len(set(seg["conv_id"].to_pylist())) == 1
        tt = seg["ts"].to_numpy()
        ti = seg["turn_idx"].to_numpy()
        order = np.lexsort((ti, tt))
        assert (order == np.arange(len(seg))).all()
    # same group count as the comparator path
    ref = sort_table(tbl.drop_columns([_H]), ["conv_id", "ts", "turn_idx"])
    assert len(starts) == len(group_starts(ref, ["conv_id"]))


def test_hash_collision_falls_back_to_comparator_sort():
    # two different convs share the same __h: the fast path would interleave
    # them into one group; the collision check must detect and fall back
    convs = ["a", "b", "a", "b", "c"]
    h = [7, 7, 7, 7, 9]
    ts = [1, 2, 3, 4, 5]
    tbl = _mk(convs, ts, h)
    t, starts = _sort_and_group(tbl, ["conv_id"], ["conv_id", "ts", "turn_idx"])
    assert len(starts) - 1 == 3  # a, b, c — correct grouping despite collision
    for g in range(len(starts) - 1):
        seg = t.slice(starts[g], starts[g + 1] - starts[g])
        assert len(set(seg["conv_id"].to_pylist())) == 1


def test_non_numeric_sort_key_falls_back():
    convs = ["a", "a", "b"]
    tbl = pa.table(
        {
            "conv_id": pa.array(convs),
            "s": pa.array(["z", "y", "x"]),
            _H: pa.array(np.array([1, 1, 2], dtype=np.int64)),
        }
    )
    t, starts = _sort_and_group(tbl, ["conv_id"], ["conv_id", "s"])
    assert len(starts) - 1 == 2
    assert t["s"].to_pylist()[:2] == ["y", "z"]  # sorted within group


def _presorted_parts(seed, n_parts=4, n=120, n_convs=12, with_ties=True):
    """Build map-style slices for ONE bucket: each part sorted by
    (__h, ts, turn_idx), conversations spread across parts."""
    rng = np.random.default_rng(seed)
    parts = []
    for p in range(n_parts):
        convs = [f"c{i}" for i in rng.integers(0, n_convs, n)]
        h = np.array([hash(c) & 0x7FFFFFFFFFFF for c in convs], dtype=np.int64)
        ts = rng.integers(0, 40 if with_ties else 10**9, n)
        ti = rng.integers(0, 10**6, n)
        order = np.lexsort((ti, ts, h))
        t = pa.table(
            {
                "conv_id": pa.array([convs[i] for i in order]),
                "ts": pa.array(ts[order]),
                "turn_idx": pa.array(ti[order]),
                "v": pa.array(rng.normal(size=n)[order]),
                _H: pa.array(h[order]),
            }
        )
        meta = {b"__slices_presorted": b"1"}
        parts.append(t.replace_schema_metadata(meta))
    return parts


def test_merge_sorted_parts_matches_concat_sort():
    from feast_ray.exchange import _merge_sorted_parts

    for seed in (0, 1, 2):
        parts = _presorted_parts(seed)
        got = _merge_sorted_parts(parts, ["conv_id"], ["conv_id", "ts", "turn_idx"])
        assert got is not None
        t, starts = got
        ref_t, ref_starts = _sort_and_group(
            pa.concat_tables(parts), ["conv_id"], ["conv_id", "ts", "turn_idx"]
        )
        assert starts.tolist() == ref_starts.tolist()
        # identical (conv, ts, turn_idx) ordering; v rides along with its row
        for c in ("conv_id", "ts", "turn_idx"):
            assert t[c].to_pylist() == ref_t[c].to_pylist(), (seed, c)
        # rows are whole: (ts, turn_idx) -> v mapping preserved
        key_v = {
            (c, a, b): v
            for c, a, b, v in zip(
                ref_t["conv_id"].to_pylist(), ref_t["ts"].to_pylist(),
                ref_t["turn_idx"].to_pylist(), ref_t["v"].to_pylist(),
            )
        }
        for c, a, b, v in zip(
            t["conv_id"].to_pylist(), t["ts"].to_pylist(),
            t["turn_idx"].to_pylist(), t["v"].to_pylist(),
        ):
            assert key_v[(c, a, b)] == v


def test_merge_sorted_parts_single_part_and_collision():
    from feast_ray.exchange import _merge_sorted_parts

    parts = _presorted_parts(3, n_parts=1)
    t, starts = _merge_sorted_parts(parts, ["conv_id"], ["conv_id", "ts", "turn_idx"])
    ref_t, ref_starts = _sort_and_group(
        pa.concat_tables(parts), ["conv_id"], ["conv_id", "ts", "turn_idx"]
    )
    assert starts.tolist() == ref_starts.tolist()

    # forced hash collision across two different convs -> merge must refuse
    a = pa.table({"conv_id": pa.array(["a", "a"]), "ts": pa.array([1, 2]),
                  "turn_idx": pa.array([0, 1]), _H: pa.array([7, 7])})
    b = pa.table({"conv_id": pa.array(["b"]), "ts": pa.array([1]),
                  "turn_idx": pa.array([0]), _H: pa.array([7])})
    meta = {b"__slices_presorted": b"1"}
    out = _merge_sorted_parts(
        [a.replace_schema_metadata(meta), b.replace_schema_metadata(meta)],
        ["conv_id"], ["conv_id", "ts", "turn_idx"],
    )
    assert out is None


def test_split_by_bucket_presort_marks_and_orders():
    from feast_ray.exchange import _PRESORT_KEY, _split_by_bucket

    rng = np.random.default_rng(9)
    tbl = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in rng.integers(0, 25, 300)]),
            "ts": pa.array(rng.integers(0, 50, 300)),
            "turn_idx": pa.array(np.arange(300, dtype=np.int64)),
        }
    )
    parts = _split_by_bucket(tbl, ["conv_id"], 6, sort_cols=["ts", "turn_idx"])
    assert sum(p.num_rows for p in parts) == 300
    for p in parts:
        assert (p.schema.metadata or {}).get(_PRESORT_KEY) == b"1"
        if p.num_rows > 1:
            h = p[_H].to_numpy(zero_copy_only=False)
            ts = p["ts"].to_numpy(zero_copy_only=False)
            ti = p["turn_idx"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ti, ts, h))
            assert (order == np.arange(p.num_rows)).all()
    # non-numeric sort col degrades to unmarked bucket-only split
    tbl2 = tbl.append_column("s", pa.array(["x"] * 300))
    parts2 = _split_by_bucket(tbl2, ["conv_id"], 6, sort_cols=["s"])
    assert all((p.schema.metadata or {}).get(_PRESORT_KEY) is None for p in parts2)


def test_backfill_map_side_sort_parity(ray_session, tmp_path):
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from feast_ray.fixtures import gen_transcripts
    from feast_ray.pipelines.backfill import backfill_transcripts

    tbl = gen_transcripts(n_convs=50, mean_turns=10, seed=5, n_hot=2, hot_turns=70)
    src = tmp_path / "in"
    src.mkdir()
    # conversations deliberately split across files so reducers must merge
    for i in range(4):
        pq.write_table(tbl.slice(i * (tbl.num_rows // 4 + 1), tbl.num_rows // 4 + 1),
                       src / f"f{i}.parquet")

    def run(flag):
        out = str(tmp_path / f"out_{flag}")
        backfill_transcripts(str(src), out, num_buckets=8, resume=False,
                             map_side_sort=flag)
        return (
            pq.read_table(out).to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(False), run(True), check_like=True)
