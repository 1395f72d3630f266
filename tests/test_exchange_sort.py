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
