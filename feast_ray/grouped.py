"""Bucketed grouped execution — the engine's single-shuffle co-grouping core.

Every per-entity operator in this engine (as-of join, lag/lead, rolling
windows, sessionization, latest-per-entity) needs all rows of one entity
(``conv_id`` / ``user_id``) co-located and sorted by event time.  Doing
``groupby(key).map_groups(fn)`` directly would call a Python function once per
entity — millions of tiny calls at scale.  Instead we shuffle ONCE by a hash
*bucket* of the key and run a **vectorized multi-group kernel** over each
bucket:

    ds -> map_batches(add __bucket = hash(key) % B)          # cheap, streaming
       -> groupby("__bucket").map_groups(wrapped_kernel)     # THE one shuffle
            wrapped_kernel:  sort bucket by (key, *sort_keys)  # local O(n log n)
                             starts = group boundary offsets   # vectorized
                             kernel(sorted_table, starts)      # numpy over ALL
                                                               # groups at once

Scale notes (100 TB / 256-node design):
- ``num_buckets`` bounds per-task memory: bucket bytes ~= total_bytes / B.
  Pick B so a bucket fits a worker heap (e.g. 100 TB / 1 GiB => B ~= 100k).
  Locally the default is modest.  The shuffle itself is Ray Data's sort-based
  groupby on a small int column — the cheapest possible shuffle key.
- Skewed entities: one hot conversation is still one group inside one bucket;
  the kernels are O(n) vectorized so a hot group costs its row count, not a
  Python loop.  ``feast_ray.stages.salt`` splits pathological entities whose
  rows exceed a bucket budget (SURVEY §4.2).
- All kernels are Arrow-in / Arrow-out, zero-copy where pyarrow allows.

This replaces the reference's per-feature-view pandas merges (upstream
``infra/offline_stores/dask.py::evaluate_historical_retrieval``) with one
explicit, reusable partitioning (SURVEY §2.4 J1, §7.3).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:  # polars xxhash is the fast path for string-key hashing
    import polars as pl

    _HAS_POLARS = True
except Exception:  # pragma: no cover
    _HAS_POLARS = False

BUCKET_COL = "__bucket"

# Kernel signature: (sorted_table, group_starts) -> pa.Table
# group_starts is an int64 numpy array of length n_groups + 1:
# rows of group g are sorted_table[starts[g] : starts[g + 1]].
GroupKernel = Callable[[pa.Table, np.ndarray], pa.Table]

# Per-map-task byte ceiling in the exchange: one map task concats its chunk
# of upstream blocks before splitting, so this bounds that concat's heap.
_MAP_TASK_TARGET_BYTES = 128 << 20
# Shuffle object count is O(map_tasks x buckets); a per-task byte target
# alone would launch ~total_bytes/128MB map tasks (millions of objects at
# the 100-TB design point).  Cap task count and let per-task bytes grow past
# the target instead — map_split streams one chunk per task, so a larger
# chunk raises per-task heap linearly but keeps the object-store metadata
# bounded.  4096 tasks x 128MB ≈ 0.5 TB per exchange before chunks grow.
_MAX_MAP_TASKS = 4096


def _unwrap_schema(sch) -> Optional[pa.Schema]:
    """``pa.Schema`` out of ray's ``Schema`` wrapper / raw value, else None."""
    base = getattr(sch, "base_schema", sch)
    return base if isinstance(base, pa.Schema) else None


class _quiet_footer_unify:
    """Silence ray's known-benign "Failed to hash the schemas" warning for
    the duration of a driver-local schema-inference call.

    Parquet footers written by pandas carry a ``b'pandas'`` metadata blob
    that makes ``pa.Schema`` unhashable; ray's fragment-schema unification
    inside ``Read.infer_schema`` then logs that warning once per Read op.
    BLOCKS are stripped at the read (``feast_ray.sources.parquet.read_pq``),
    so the only remaining emitter is this driver-local footer path."""

    def __enter__(self):
        import logging

        self._log = logging.getLogger(
            "ray.data._internal.arrow_ops.transform_pyarrow"
        )
        self._prev = self._log.level
        self._log.setLevel(logging.ERROR)
        return self

    def __exit__(self, *exc):
        self._log.setLevel(self._prev)
        return False


# Logical ops whose output schema equals their (first) input's schema.
_SCHEMA_PRESERVING_OPS = frozenset(
    ["Filter", "Sort", "Limit", "RandomShuffle", "Repartition",
     "RandomizeBlocks", "StreamingRepartition", "MaterializeStage"]
)


def _infer_schema_local(ds) -> Optional[pa.Schema]:
    """Plan-time schema of an un-executed Dataset WITHOUT touching the
    cluster.

    ``Dataset.schema()`` on a transformed, un-executed dataset launches a
    ``limit(1)`` probe execution; the probe's task CANCELLATIONS
    intermittently trip ray 2.49's core-worker fatal races
    (``task_manager.cc:930`` / ``reference_count.cc:581`` — BASELINE.md
    infrastructure note), which abort the whole driver process.  At scale
    the probe is also a throwaway partial read of the input.  Instead:
    walk the logical plan, take the SOURCE schema from metadata
    (``infer_schema`` on Read/From/InputData ops — parquet footer / bundle
    schema, no execution), then apply each pyarrow-format ``map_batches``
    UDF to a TYPED EMPTY table locally.  Engine kernels are schema-stable
    on empty input by design (the exchange's zero-block path already runs
    kernels on typed empties).  Returns None — caller falls back to the
    probe — on any node or UDF this can't simulate (callable-class /
    non-pyarrow / generator UDFs, joins, aggregates, expression projects).
    """

    def sim(node) -> Optional[pa.Table]:
        deps = node.input_dependencies
        if not deps:  # source: Read / FromArrow / InputData ...
            infer = getattr(node, "infer_schema", None)
            if infer is None:
                return None
            with _quiet_footer_unify():
                sch = _unwrap_schema(infer())
            if sch is not None and len(sch.names) > 0:
                return sch.empty_table()
            # ray 2.49 drops the schema of EMPTY from_arrow/input blocks at
            # the metadata layer, but the stored block object keeps it —
            # read the (empty, local) block directly
            bundles = getattr(node, "input_data", None) or ()
            for b in bundles:
                for ref in getattr(b, "block_refs", ()):
                    import ray as _ray

                    t0 = _ray.get(ref)
                    if isinstance(t0, pa.Table):
                        return t0.slice(0, 0)
            return None
        ins = [sim(d) for d in deps]
        if any(t is None for t in ins):
            return None
        t = ins[0]
        name = type(node).__name__
        if name == "MapBatches":
            if getattr(node, "_batch_format", None) != "pyarrow":
                return None
            fn = getattr(node, "_fn", None)
            if not callable(fn) or isinstance(fn, type):
                return None  # callable-class (actor) stage — state too heavy
            if getattr(fn, "__feast_ray_no_local_sim__", False):
                return None  # UDF opted out (side effects / not empty-stable)
            out = fn(t, *(node._fn_args or ()), **(node._fn_kwargs or {}))
            # a UDF that fabricates rows on empty input is not a pure
            # per-batch map — don't trust its plan-time schema
            if not isinstance(out, pa.Table) or out.num_rows != 0:
                return None
            return out
        if name == "Project":
            if getattr(node, "_exprs", None):
                return None
            if node.cols is not None:
                t = t.select(list(node.cols))
            if node.cols_rename:
                t = t.rename_columns(
                    [node.cols_rename.get(c, c) for c in t.column_names]
                )
            return t
        if name == "Union":
            for other in ins[1:]:
                if other.schema != t.schema:
                    return None
            return t
        if name in _SCHEMA_PRESERVING_OPS:
            return t
        return None

    try:
        tbl = sim(ds._plan._logical_plan.dag)
    except Exception:
        return None
    return tbl.schema if tbl is not None else None


def dataset_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset, robust to pandas-backed blocks (which
    report object dtype as the python type) and unknown-schema datasets.

    Never executes the dataset when avoidable: cached plan schema first,
    then local empty-table simulation (`_infer_schema_local`), and only
    then ray's ``limit(1)`` probe — whose cancellations can hit the ray
    2.49 fatal race that kills long gate sessions."""
    with _quiet_footer_unify():
        sch = ds.schema(fetch_if_missing=False)
    if sch is not None and len(sch.names) == 0:
        sch = None  # ray 2.49 reports a ZERO-FIELD schema for empty mapped blocks
    if sch is None:
        local = _infer_schema_local(ds)
        if local is not None:
            # debug-mode cross-check (ADVICE r03): UDFs must be schema-stable
            # on empty input for the local simulation to be trusted; set
            # FEAST_RAY_SCHEMA_CHECK=1 to verify against the probe execution.
            import os

            if os.environ.get("FEAST_RAY_SCHEMA_CHECK"):
                probe = _unwrap_schema(ds.schema(fetch_if_missing=True))
                if probe is not None and len(probe.names) and probe != local:
                    raise RuntimeError(
                        "plan-time schema simulation diverged from the probe "
                        f"execution: simulated={local} probed={probe} — a "
                        "map_batches UDF is not schema-stable on empty input "
                        "(mark it __feast_ray_no_local_sim__ = True)"
                    )
            return local
        sch = ds.schema(fetch_if_missing=True)
    if sch is not None and len(sch.names) == 0:
        sch = None
    if sch is None:
        raise ValueError(
            "dataset schema is unknown (empty dataset from a row-filter?); "
            "materialize a schema first, e.g. filter via map_batches on pyarrow"
        )
    fields = []
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            t = pa.string() if t is object or t is str else pa.from_numpy_dtype(t)
        fields.append(pa.field(n, t))
    return pa.schema(fields)


def dataset_to_refs(ds):
    """Execute ``ds`` into ``(block_refs, schema, total_rows, size_bytes)``
    via its internal RefBundles.

    Replacement for ``Dataset.to_arrow_refs()``: in ray 2.49 the streamed
    bundles do not populate the plan's schema cache, so ``to_arrow_refs``'s
    trailing ``schema()`` call RE-EXECUTES the whole pipeline under a
    ``limit(1)`` probe — paying the upstream again AND rolling the dice on
    the cancellation fatal race (see `_infer_schema_local`).  Bundle
    metadata carries schema, per-block row counts and byte sizes for free.

    ``schema`` is a ``pa.Schema`` or None (pandas-backed blocks);
    ``total_rows`` is None when any block's count is unknown."""
    refs: list = []
    sizes: list[int] = []
    schema: Optional[pa.Schema] = None
    rows = 0
    rows_known = True
    for bundle in ds.iter_internal_ref_bundles():
        if schema is None:
            schema = _unwrap_schema(bundle.schema)
        for ref, md in bundle.blocks:
            refs.append(ref)
            sizes.append(md.size_bytes or 0)
            if md.num_rows is None:
                rows_known = False
            else:
                rows += md.num_rows
    return refs, schema, (rows if rows_known else None), sizes


def block_refs_of(ds) -> list:
    """Block refs of an executed dataset, without ``to_arrow_refs``'s
    schema re-probe (see `dataset_to_refs`).  Blocks are usually Arrow
    tables; callers that ``ray.get`` them must tolerate pandas blocks if
    a pandas-format stage ran last."""
    return dataset_to_refs(ds)[0]


def sorted_head(ds, sort_keys: Sequence[str], descending: Sequence[bool], k: int):
    """``ds.sort(...).limit(k)`` with a ``materialize()`` barrier between.

    A ``limit`` fed directly by a streaming upstream stops the executor
    early and CANCELS its in-flight tasks; each cancellation is a roll on
    ray 2.49's core-worker fatal race (see `_infer_schema_local`).  The
    sort is an all-to-all barrier anyway, so materializing its output adds
    nothing at scale — the limit then reads driver-local bundles with at
    most one awaited boundary-slice task, i.e. nothing left to cancel.
    Only k rows ever leave the materialized sort."""
    try:
        out = ds.sort(list(sort_keys), descending=list(descending))
    except TypeError:  # older sort signature: single bool
        out = ds.sort(sort_keys[0], descending=descending[0])
    return out.materialize().limit(k)


def hash_backend_id() -> str:
    """Identity of the row-hash implementation (bucket assignment depends on
    it).  Persisted in incremental watermarks: a backend or version change
    re-buckets rows, so skipping 'unaffected' buckets would be wrong."""
    if _HAS_POLARS:
        return f"polars-{pl.__version__}"
    import pandas as pd

    return f"pandas-{pd.__version__}"


def hash_columns(tbl: pa.Table, keys: Sequence[str], seed: int = 0) -> np.ndarray:
    """Deterministic per-row uint64 hash of one or more key columns.

    Used only for partitioning (bucket assignment, exact-dedup routing) —
    never exposed in results, so the exact hash function is an internal
    detail.  Polars (xxhash64, vectorized) when available; pandas'
    ``hash_array`` fallback.
    """
    if _HAS_POLARS:
        df = pl.from_arrow(tbl.select(list(keys)))
        h = df.hash_rows(seed=seed).to_numpy()
        return h.astype(np.uint64, copy=False)
    import pandas as pd

    out = np.zeros(tbl.num_rows, dtype=np.uint64)
    for k in keys:
        col = tbl[k].to_pandas().to_numpy()
        out ^= pd.util.hash_array(col) + np.uint64(0x9E3779B97F4A7C15) + (out << np.uint64(6))
    return out


def add_bucket(
    ds,
    keys: Sequence[str],
    num_buckets: int,
    *,
    bucket_col: str = BUCKET_COL,
):
    """Append an int32 hash-bucket column — the shuffle key for grouped ops."""

    keys = list(keys)

    def _tag(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column(bucket_col, pa.array([], type=pa.int32()))
        b = (hash_columns(tbl, keys) % np.uint64(num_buckets)).astype(np.int32)
        return tbl.append_column(bucket_col, pa.array(b))

    return ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)


def sort_table(tbl: pa.Table, cols: Sequence[str]) -> pa.Table:
    """Local sort (ascending, nulls last) — O(n log n) inside one bucket."""
    if tbl.num_rows <= 1:
        return tbl
    idx = pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in cols])
    return tbl.take(idx)


def group_starts(tbl: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Group boundary offsets of a table already sorted by ``keys``.

    Returns int64 array [0, b1, b2, ..., n]; group g spans
    ``[starts[g], starts[g+1])``.  Keys must be non-null.
    """
    n = tbl.num_rows
    if n == 0:
        return np.array([0], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        arr = tbl[k].combine_chunks() if isinstance(tbl[k], pa.ChunkedArray) else tbl[k]
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            codes = arr.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            change |= codes[1:] != codes[:-1]
        else:
            vals = arr.to_numpy(zero_copy_only=False)
            change |= vals[1:] != vals[:-1]
    bounds = np.flatnonzero(change) + 1
    return np.concatenate(([0], bounds, [n])).astype(np.int64)


def starts_to_group_index(starts: np.ndarray) -> np.ndarray:
    """Per-row group ordinal (0-based) from boundary offsets."""
    sizes = np.diff(starts)
    return np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)


def starts_to_row_gstart(starts: np.ndarray) -> np.ndarray:
    """Per-row start offset of the row's own group."""
    sizes = np.diff(starts)
    return np.repeat(starts[:-1], sizes)


def default_num_buckets(parallelism_hint: Optional[int] = None) -> int:
    """Local default: one bucket per CPU — measured to halve wall time vs
    4x CPUs on mid-size inputs (every extra bucket is an extra all-to-all
    block; the kernels are O(n) so fewer, bigger buckets win until a bucket
    approaches worker memory).

    At cluster scale callers should size B from total input bytes / target
    bucket bytes (see module docstring) — pass it explicitly.
    """
    import ray

    if parallelism_hint is not None:
        return max(1, parallelism_hint)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def grouped_map(
    ds,
    keys: Sequence[str],
    kernel: GroupKernel,
    *,
    sort_keys: Sequence[str] = (),
    num_buckets: Optional[int] = None,
    drop_bucket: bool = True,
    engine: str = "exchange",
):
    """Run a vectorized multi-group kernel over every entity group.

    ``ds`` is hash-bucketed by ``keys`` (one shuffle), each bucket is locally
    sorted by ``(*keys, *sort_keys)``, group boundaries are computed, and
    ``kernel(sorted_table, starts)`` is invoked once per bucket — covering
    every group in that bucket in one vectorized call.

    ``engine="exchange"`` (default) runs the shuffle on the fused raw-task
    exchange (``feast_ray.exchange``): upstream stages execute into object
    store blocks, map tasks split each block into per-bucket slices, reduce
    tasks concat + numeric-sort + run the kernel.  Measured 2-4x faster
    than Ray Data's sort-based ``groupby().map_groups`` on the query
    battery — the Dataset sort spends most of its wall time orchestrating
    hundreds of blocks, not sorting (see BASELINE.md).  ``engine="dataset"``
    keeps the Dataset-native formulation (parity-tested; same kernels).
    Group ORDER within a bucket differs between engines (hash order vs key
    order) — row-level results are identical, consumers must not rely on
    inter-group output order.

    Kernel contract (plan-time schema inference relies on it): the kernel
    must be SCHEMA-STABLE on a typed EMPTY input — return a 0-row table
    with exactly the columns/types it returns for data — and must not
    fabricate rows or have side effects at import/call time.  A kernel (or
    upstream pyarrow ``map_batches`` UDF) that cannot satisfy this should
    set ``fn.__feast_ray_no_local_sim__ = True`` to opt out of the local
    empty-table simulation; the engine then falls back to Ray's schema
    probe for that pipeline (see ``_infer_schema_local``).
    """
    keys = list(keys)
    order = keys + [c for c in sort_keys if c not in keys]
    b = num_buckets or default_num_buckets()

    if engine == "exchange":
        return _grouped_map_exchange(ds, keys, kernel, order, b)
    if engine != "dataset":
        raise ValueError(f"unknown engine {engine!r}")

    tagged = add_bucket(ds, keys, b)

    def _run(bucket_tbl: pa.Table) -> pa.Table:
        if drop_bucket and BUCKET_COL in bucket_tbl.column_names:
            bucket_tbl = bucket_tbl.drop_columns([BUCKET_COL])
        t = sort_table(bucket_tbl, order)
        starts = group_starts(t, keys)
        return kernel(t, starts)

    return tagged.groupby(BUCKET_COL).map_groups(_run, batch_format="pyarrow")


def _grouped_map_exchange(ds, keys, kernel, order_cols, num_buckets: int):
    """grouped_map on raw Ray tasks: block-wise bucket split + per-bucket
    reduce, returned as a Dataset over the reduce outputs."""
    import ray
    import ray.data as rd

    from feast_ray import exchange as ex

    # executes upstream stages; blocks stay remote.  Bundle metadata gives
    # schema + row counts + bytes without any schema-probe re-execution.
    refs, in_schema, total_rows, sizes = dataset_to_refs(ds)
    if not refs or total_rows == 0:
        # zero blocks OR zero total rows: still emit the KERNEL's output
        # schema (downstream stages depend on it) by running the kernel on
        # a typed empty.  Row counts come from driver-local bundle
        # metadata — no synchronous barrier.  (ray 2.49's from_arrow_refs
        # drops empty-block schemas, so returning the empty reduce outputs
        # would yield an UNKNOWN-schema dataset.)
        # ray 2.49 bundle metadata reports a ZERO-FIELD schema for empty
        # mapped blocks — treat it as unknown and re-derive (the local
        # plan simulation replays pyarrow map UDFs on a typed empty)
        if in_schema is not None and len(in_schema.names) == 0:
            in_schema = None
        empty = (in_schema if in_schema is not None else dataset_schema(ds)).empty_table()
        out = kernel(empty, np.array([0], dtype=np.int64))
        return rd.from_arrow(out)
    # Batch small blocks together so object count stays O(tasks x buckets),
    # sized by BYTES: one map task concatenates its chunk, so the chunk must
    # fit comfortably in a worker heap at any input scale.  Small inputs
    # still fan out to ~2 map tasks per CPU for split parallelism.
    total_bytes = sum(sizes)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        cpus = 8
    target = min(_MAP_TASK_TARGET_BYTES, max(4 << 20, total_bytes // (2 * cpus) + 1))
    # task-count ceiling (ADVICE r03): bytes target governs small/medium
    # inputs; past _MAX_MAP_TASKS x target the per-task chunk grows instead
    target = max(target, total_bytes // _MAX_MAP_TASKS + 1)
    chunks: list[list] = []
    cur: list = []
    cur_bytes = 0
    for r, s in zip(refs, sizes):
        cur.append(r)
        cur_bytes += s
        if cur_bytes >= target:
            chunks.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        chunks.append(cur)

    def _pick(parts):
        """Non-empty tables, or the widest-schema empty as representative —
        Ray passes schema-less 0-row source blocks through map stages
        untouched, and those must not poison the concat."""
        live = [p for p in parts if p.num_rows > 0]
        return live if live else [max(parts, key=lambda p: p.num_columns)]

    @ray.remote
    def map_split(B: int, *tbls):
        # to_arrow_refs can surface pandas-backed blocks unconverted
        tbls = [
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
            for t in tbls
        ]
        tbls = _pick(tbls)
        tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
        return ex._split_by_bucket(tbl, keys, B)

    @ray.remote
    def reduce_task(*parts: pa.Table):
        parts = _pick(parts)
        tbl = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        t, starts = ex._sort_and_group(tbl, keys, order_cols)
        if t.num_rows == 0:
            starts = np.array([0], dtype=np.int64)
        return kernel(t, starts)

    # num_returns=1 would hand reducers the unsplit LIST (Ray only unpacks
    # multi-return); 2 buckets is the minimum exchange shape anyway
    num_buckets = max(2, num_buckets)
    splits = [
        map_split.options(num_returns=num_buckets).remote(num_buckets, *c) for c in chunks
    ]
    outs = [reduce_task.remote(*[s[b] for s in splits]) for b in range(num_buckets)]
    return rd.from_arrow_refs(outs)


# ---------------------------------------------------------------------------
# Vectorized grouped aggregation (replacement for Dataset.groupby().aggregate)
# ---------------------------------------------------------------------------

_AGG_OPS = ("count", "sum", "max", "min", "mean", "first", "last")


def grouped_aggregate(
    ds,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Optional[str]]],
    *,
    sort_keys: Sequence[str] = (),
    num_buckets: Optional[int] = None,
):
    """One row per key group with vectorized aggregates.

    ``aggs`` maps output column -> (op, input column); op in
    count/sum/max/min/mean/first/last (count ignores its column).  Runs on
    the engine's single hash-bucket shuffle + ``np.*.reduceat`` kernels —
    measured well under Ray Data's sort-based ``groupby().aggregate()`` for
    the same result (the sort's range-partition barrier and per-group
    Python dispatch are avoided).
    """
    keys = list(keys)
    for out, (op, col) in aggs.items():
        if op not in _AGG_OPS:
            raise ValueError(f"unknown agg op {op!r} for {out!r}")
        if op != "count" and col is None:
            raise ValueError(f"agg {out!r}: op {op!r} needs an input column")
        if op in ("first", "last") and not sort_keys:
            raise ValueError(
                f"agg {out!r}: {op!r} is order-dependent — pass sort_keys= "
                "(within-group row order is otherwise shuffle-nondeterministic)"
            )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take_first = pa.array(firsts)
        cols: dict[str, pa.Array] = {}
        for k in keys:
            cols[k] = pc.take(t[k].combine_chunks(), take_first)
        sizes = np.diff(starts)
        for out, (op, col) in aggs.items():
            if op == "count":
                cols[out] = pa.array(sizes.astype(np.int64))
                continue
            if op == "first":
                cols[out] = pc.take(t[col].combine_chunks(), take_first)
                continue
            if op == "last":
                cols[out] = pc.take(t[col].combine_chunks(), pa.array(starts[1:] - 1))
                continue
            v = t[col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            nan = np.isnan(v)
            if op == "sum" or op == "mean":
                s = np.add.reduceat(np.where(nan, 0.0, v), firsts)
                c = np.diff(np.concatenate(([0], np.cumsum(~nan)))[starts])
                if op == "sum":
                    cols[out] = pa.array(s, mask=c == 0)
                else:
                    with np.errstate(invalid="ignore", divide="ignore"):
                        cols[out] = pa.array(s / c, mask=c == 0)
            elif op == "max":
                m = np.maximum.reduceat(np.where(nan, -np.inf, v), firsts)
                cols[out] = pa.array(m, mask=~np.isfinite(m))
            elif op == "min":
                m = np.minimum.reduceat(np.where(nan, np.inf, v), firsts)
                cols[out] = pa.array(m, mask=~np.isfinite(m))
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=list(sort_keys), num_buckets=num_buckets)
