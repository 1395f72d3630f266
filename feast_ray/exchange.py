"""Fused two-phase MapReduce exchange — the flagship backfill's scale path.

Why this exists (measured, see BASELINE.md): Ray Data's sort-based
``groupby().map_groups`` on this workload spends ~3-4x the wall time of the
underlying task work in all-to-all orchestration (sampling, barriers,
per-block driver overhead at ~200+ blocks x 4 operators).  The engine's
per-entity operators only need *hash co-location*, not a global sort, so the
exchange is expressed directly in Ray core — the documented escape hatch for
semantics/performance the Dataset API can't deliver:

    map task  (one per input file chunk):  read parquet -> map_fn (derive
        columns, vectorized) -> hash(key) % B -> ONE argsort by bucket ->
        B zero-copy slices returned as separate objects
    reduce task (one per bucket b):  concat the b-th slice of every map ->
        local sort by (key, *sort_keys) -> group boundaries ->
        reduce_kernel over ALL groups vectorized -> sink (atomic parquet
        write + lineage manifest)

Scale accounting for a 256-node / 100 TB run:
- Object count is O(M x B) (M map tasks, B buckets).  Keep M in the low
  thousands by batching files per map task (``files_per_task``) and B sized
  so a bucket fits a reducer's heap; M=2k, B=4k -> 8M refs, fine.  Beyond
  that, run the exchange per input partition range (the resume manifests
  already partition the work).
- The map->reduce barrier is inherent to any shuffle; Ray pipelines object
  transfer during the map phase and spills to disk under pressure.
- Skew: a reducer's cost is its bucket's row count; hash-bucketing spreads
  conversations uniformly.  A single conversation larger than a bucket
  budget is split with salted keys + overlap regions —
  ``feast_ray.stages.salt.salted_window_features`` (SURVEY §4.2); the
  kernels are O(n) vectorized so moderately hot conversations also degrade
  smoothly without salting.

The Dataset-based path (``feast_ray.grouped.grouped_map``) remains the
correctness-first route used by the operator library; both run the same
kernels.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa

from feast_ray.grouped import group_starts, hash_columns, sort_table

MapFn = Callable[[pa.Table], pa.Table]
ReduceKernel = Callable[[pa.Table, np.ndarray], pa.Table]
SinkFn = Callable[[int, pa.Table], dict]  # (bucket_id, table) -> metrics dict


_H = "__h"  # per-row uint64 key hash (as int64 bits), carried through the exchange


_PRESORT_KEY = b"__slices_presorted"


def _split_by_bucket(
    tbl: pa.Table,
    keys: Sequence[str],
    num_buckets: int,
    lo: int = 0,
    hi: Optional[int] = None,
    sort_cols: Sequence[str] = (),
) -> list[pa.Table]:
    """One argsort by bucket id, then zero-copy slices for buckets
    ``[lo, hi)`` (default: all).

    The full key hash rides along as ``__h`` so reducers can sort and find
    group boundaries NUMERICALLY (no string comparisons); slices are NOT
    compacted here — Ray's Arrow serializer truncates sliced tables to
    their logical rows on put, so per-slice ``combine_chunks`` was a pure
    extra copy (verified: 100 slice puts of a 400 MB parent fit a 2 GB
    store).  When a sub-range is requested (the sharded-exchange path),
    only the in-range rows are materialized by the ``take``.

    ``sort_cols`` (the map-side-sort path): additionally order each slice
    by ``(__h, *sort_cols)`` in the SAME single lexsort — the sort work of
    the exchange then happens in the (many, read-overlapped) map tasks and
    each reducer only k-way merges presorted runs (see
    ``_merge_sorted_parts``).  Slices are marked via schema metadata;
    non-numeric sort columns silently degrade to the bucket-only sort."""
    if hi is None:
        hi = num_buckets
    if tbl.num_rows == 0:
        return [tbl.append_column(_H, pa.array([], pa.int64()))] * (hi - lo)
    hu = hash_columns(tbl, keys)
    h = (hu % np.uint64(num_buckets)).astype(np.int64)
    presorted = False
    arrays = _numeric_sort_arrays(tbl, list(reversed(sort_cols))) if sort_cols else None
    if arrays is not None:
        # lexsort: later keys are more significant -> (bucket, __h, *sort)
        order = np.lexsort(tuple(arrays) + (hu.view(np.int64), h))
        presorted = True
    else:
        order = np.argsort(h, kind="stable")
    hs = h[order]
    bounds = np.searchsorted(hs, np.arange(lo, hi + 1))
    sel = order[bounds[0] : bounds[-1]]
    t = tbl.append_column(_H, pa.array(hu.view(np.int64))).take(pa.array(sel))
    if presorted:
        meta = dict(t.schema.metadata or {})
        meta[_PRESORT_KEY] = b"1"
        t = t.replace_schema_metadata(meta)
    bounds = bounds - bounds[0]
    return [t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(hi - lo)]


def _merge_sorted_parts(
    parts: Sequence[pa.Table], keys: Sequence[str], order_cols: Sequence[str]
) -> Optional[tuple[pa.Table, np.ndarray]]:
    """K-way merge of map slices each presorted by ``(__h, *sort_cols)``.

    One stable radix argsort on the int64 hash (linear, single pass over
    one array) replaces the reduce-side multi-key lexsort; equal-hash runs
    whose rows came from MORE THAN ONE part are then re-ordered by the sort
    columns with a lexsort restricted to just those rows (a conversation
    usually lives in few input files, so this touches a small fraction).
    Returns None — caller falls back to the concat+sort path — on hash
    collision (verified exactly as in ``_sort_and_group``) or non-numeric
    sort columns."""
    import pyarrow.compute as pc

    tbl = pa.concat_tables(parts)
    n = tbl.num_rows
    sort_cols = [c for c in order_cols if c not in keys]
    h = tbl[_H].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")  # radix; part-internal order kept
    hs = h[order]
    chg = hs[1:] != hs[:-1]
    if len(parts) > 1 and sort_cols:
        sizes = np.array([p.num_rows for p in parts], dtype=np.int64)
        part_id = np.repeat(np.arange(len(parts), dtype=np.int64), sizes)
        pid_s = part_id[order]
        run_id = np.concatenate(([0], np.cumsum(chg)))
        mix_pair = (~chg) & (pid_s[1:] != pid_s[:-1])
        if mix_pair.any():
            mixed_runs = np.unique(run_id[1:][mix_pair])
            idx = np.flatnonzero(np.isin(run_id, mixed_runs))
            arrays = _numeric_sort_arrays(tbl, list(reversed(sort_cols)))
            if arrays is None:
                return None
            sub = tuple(a[order[idx]] for a in arrays)
            o2 = np.lexsort(sub + (run_id[idx],))
            order[idx] = order[idx][o2]  # within-run permutation: hs unchanged
    t = tbl.drop_columns([_H]).take(pa.array(order))
    same_h = ~chg
    if same_h.any():
        for k in keys:
            col = t[k].combine_chunks()
            ne = pc.not_equal(col.slice(1), col.slice(0, n - 1))
            if (same_h & pc.fill_null(ne, True).to_numpy(zero_copy_only=False)).any():
                return None  # 64-bit hash collision: exact fallback
    if t.schema.metadata and _PRESORT_KEY in t.schema.metadata:
        meta = dict(t.schema.metadata)
        meta.pop(_PRESORT_KEY)
        t = t.replace_schema_metadata(meta or None)
    starts = np.concatenate(([0], np.flatnonzero(chg) + 1, [n])).astype(np.int64)
    return t, starts


def _numeric_sort_arrays(tbl: pa.Table, cols: Sequence[str]) -> Optional[list[np.ndarray]]:
    """numpy arrays for ``cols`` in column order, or None if any column is
    non-numeric (callers then fall back to the Arrow comparator sort).
    Timestamps are cast to int64 microseconds; ns values with sub-us
    components raise on the safe cast and likewise return None."""
    arrays: list[np.ndarray] = []
    for c in cols:
        col = tbl[c].combine_chunks()
        try:
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us", tz=col.type.tz)).cast(pa.int64())
            a = col.to_numpy(zero_copy_only=False)
        except pa.ArrowInvalid:
            return None
        if not np.issubdtype(a.dtype, np.number):
            return None
        arrays.append(a)
    return arrays


def _sort_and_group(
    tbl: pa.Table, keys: Sequence[str], order_cols: Sequence[str]
) -> tuple[pa.Table, np.ndarray]:
    """Reduce-side sort + group boundaries.

    Fast path (measured ~1.3x over the Arrow comparator sort at bucket
    sizes): numeric ``np.lexsort`` on ``(__h, *sort_keys)`` — no string
    comparisons — with group boundaries at hash changes.  A 64-bit hash
    collision between two different keys in one bucket would interleave
    their rows, so equal-hash adjacent rows are verified key-equal with one
    vectorized compare per key column; any mismatch falls back to the full
    comparator sort.  Falls back likewise when a sort column is non-numeric.
    """
    import pyarrow.compute as pc

    n = tbl.num_rows
    sort_cols = [c for c in order_cols if c not in keys]
    if _H in tbl.column_names and n > 0:
        h = tbl[_H].combine_chunks().to_numpy(zero_copy_only=False)
        arrays = _numeric_sort_arrays(tbl, list(reversed(sort_cols)))
        if arrays is not None:
            order = np.lexsort(tuple(arrays) + (h,))
            hs = h[order]
            t = tbl.drop_columns([_H]).take(pa.array(order))
            chg = hs[1:] != hs[:-1]
            same_h = ~chg
            collision = False
            if same_h.any():
                for k in keys:
                    col = t[k].combine_chunks()
                    ne = pc.not_equal(col.slice(1), col.slice(0, n - 1))
                    ne_np = pc.fill_null(ne, True).to_numpy(zero_copy_only=False)
                    if (same_h & ne_np).any():
                        collision = True
                        break
            if not collision:
                starts = np.concatenate(
                    ([0], np.flatnonzero(chg) + 1, [n])
                ).astype(np.int64)
                return t, starts
    plain = tbl.drop_columns([_H]) if _H in tbl.column_names else tbl
    t = sort_table(plain, list(order_cols))
    starts = group_starts(t, keys)
    return t, starts


_PACK_KEY = b"__packed_cols_ipc"


def _pack_slice(t: pa.Table, cols: Sequence[str]) -> pa.Table:
    """Move ``cols`` out of the slice's columnar payload into ONE
    zstd-compressed Arrow IPC blob stashed in the schema metadata.  Purpose:
    the wide backfill's 8->32 scaling wall is text bytes on the shared
    memory bus (BASELINE.md phase breakdown); compressible payloads shrink
    3-5x for ~cheap CPU, and the blob round-trips rows losslessly because
    IPC preserves order and the reduce side re-attaches BEFORE the concat
    and sort."""
    present = [c for c in cols if c in t.column_names]
    if not present:
        return t
    sub = t.select(present)
    rest = t.drop_columns(present)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(
        sink, sub.schema, options=pa.ipc.IpcWriteOptions(compression="zstd")
    ) as w:
        w.write_table(sub)
    meta = dict(rest.schema.metadata or {})
    meta[_PACK_KEY] = sink.getvalue().to_pybytes()
    return rest.replace_schema_metadata(meta)


def _unpack_slice(t: pa.Table) -> pa.Table:
    meta = dict(t.schema.metadata or {})
    blob = meta.pop(_PACK_KEY, None)
    if blob is None:
        return t
    sub = pa.ipc.open_stream(pa.BufferReader(blob)).read_all()
    out = t.replace_schema_metadata(meta or None)
    for name in sub.column_names:
        out = out.append_column(name, sub[name].combine_chunks())
    return out


def exchange_grouped(
    input_files: Sequence[str],
    *,
    keys: Sequence[str],
    sort_keys: Sequence[str],
    reduce_kernel: ReduceKernel,
    num_buckets: int,
    map_fn: Optional[MapFn] = None,
    sink_fn: Optional[SinkFn] = None,
    columns: Optional[Sequence[str]] = None,
    files_per_task: int = 1,
    skip_buckets: Optional[set[int]] = None,
    map_fn_takes_paths: bool = False,
    pack_cols: Optional[Sequence[str]] = None,
    shard_rounds: int = 1,
    map_side_sort: bool = False,
) -> list:
    """Run the fused exchange over parquet files; returns per-bucket results
    (``sink_fn`` metrics dicts if given, else reduced Arrow tables).

    ``pack_cols``: columns shipped through the shuffle as one
    zstd-compressed IPC blob per slice instead of raw Arrow buffers (see
    ``_pack_slice``) — for big compressible payloads (text) whose raw bytes
    would saturate the transport.

    ``shard_rounds``: the 100-TB object-count valve.  The exchange's live
    object count is O(M x B); with R rounds the bucket space [0, B) is cut
    into R contiguous key-hash ranges processed SEQUENTIALLY — each round
    maps the input emitting only its range's buckets and reduces them to
    completion before the next round starts, so the live count is bounded
    at O(M x B/R) regardless of B.  ``map_side_sort``: each map task fully
    sorts its slices by ``(__h, *sort_keys)`` inside the one bucket-split
    lexsort, and reducers replace the concat+lexsort with a linear radix
    merge (``_merge_sorted_parts``) — shifts the sort work off the
    post-barrier reduce side into the read-overlapped map phase.  Falls
    back transparently (per slice / per bucket) for non-numeric sort
    columns or hash collisions; results are identical either way (parity
    pinned by ``tests/test_exchange_sort.py``).  The trade is R passes over the input
    (reads + ``map_fn`` re-run; out-of-range rows are dropped before any
    ``take`` materializes them), the classic multi-round shuffle trade —
    IO is re-paid to keep shuffle metadata/object state bounded.  ``map_fn``
    side effects (e.g. sidecar writes) must therefore be idempotent when
    R > 1.  Results are returned in bucket order, identical to R=1 (parity
    pinned by ``tests/test_exchange_sort.py``).  Resume composes: the
    per-bucket manifests make a crash mid-round skip completed buckets."""
    import ray

    keys = list(keys)
    order_cols = keys + [c for c in sort_keys if c not in keys]
    skip = skip_buckets or set()

    @ray.remote
    def map_task(paths: list[str], B: int, lo: int, hi: int):
        import pyarrow.parquet as pq

        tbls = [pq.read_table(p, columns=list(columns) if columns else None) for p in paths]
        tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
        if map_fn is not None:
            tbl = map_fn(tbl, paths) if map_fn_takes_paths else map_fn(tbl)
        sc = [c for c in order_cols if c not in keys] if map_side_sort else ()
        parts = _split_by_bucket(tbl, keys, B, lo, hi, sort_cols=sc)
        if pack_cols:
            parts = [_pack_slice(p, pack_cols) for p in parts]
        return parts

    @ray.remote
    def reduce_task(b: int, *parts: pa.Table):
        # num_returns=1 (one-bucket shard round) ships the map's 1-element
        # list as a single object — unwrap it
        parts = [p[0] if isinstance(p, list) else p for p in parts]
        if pack_cols:
            parts = [_unpack_slice(p) for p in parts]
        parts = [p for p in parts if p.num_rows > 0]
        if not parts:
            out = None
        else:
            merged = None
            if all(
                (p.schema.metadata or {}).get(_PRESORT_KEY) == b"1" for p in parts
            ):
                merged = _merge_sorted_parts(parts, keys, order_cols)
            if merged is None:
                t, starts = _sort_and_group(pa.concat_tables(parts), keys, order_cols)
            else:
                t, starts = merged
            out = reduce_kernel(t, starts)
        if sink_fn is not None:
            return sink_fn(b, out)
        return out

    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    if not 1 <= shard_rounds <= num_buckets:
        raise ValueError("shard_rounds must be in [1, num_buckets]")
    chunks = [
        list(input_files[i : i + files_per_task])
        for i in range(0, len(input_files), files_per_task)
    ]
    results: list = []
    edges = np.linspace(0, num_buckets, shard_rounds + 1).astype(int)
    for r in range(shard_rounds):
        lo, hi = int(edges[r]), int(edges[r + 1])
        wanted = [b for b in range(lo, hi) if b not in skip]
        if not wanted:
            continue
        n_ret = hi - lo
        splits = [
            map_task.options(num_returns=n_ret).remote(c, num_buckets, lo, hi)
            for c in chunks
        ]
        if n_ret == 1:  # num_returns=1 yields the bare ref, not a list
            splits = [[s] for s in splits]
        out_refs = [reduce_task.remote(b, *[s[b - lo] for s in splits]) for b in wanted]
        del splits  # drop slice refs so the store can free them as reducers finish
        results.extend(ray.get(out_refs))  # per-round barrier bounds live objects
    return results
