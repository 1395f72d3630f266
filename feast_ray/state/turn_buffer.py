"""Streaming-ingest variant: stateful actor pool holding per-conv_id sorted
turn buffers (T3, SURVEY §2.3; "stateful actor pools holding per-conv_id
sorted turn buffers", BASELINE.json:6).

The batch/backfill path computes windows after a sort shuffle because it
sees complete history.  A STREAM of arriving turns cannot wait for "all
rows": each incoming micro-batch must emit features immediately, using
whatever history already arrived.  That per-key mutable state is the one
place the Dataset API genuinely can't express the semantics (a map_batches
actor pool does not route batches by key), so this stage drops to raw Ray
actors — the documented escape hatch:

    router (driver or any producer)
        hash(conv_id) % P  ->  P ``TurnShardActor``s   (each conv pinned to
                                                        exactly one actor)
    TurnShardActor.ingest(arrow_slice):
        carry = last ``overlap_rows`` buffered turns of each touched conv
        table = sort(carry + new rows)                (vectorized, Arrow)
        features = THE SAME window kernels as the batch path
                   (feast_ray.stages.windows.make_window_kernel)
        emit only the new rows; update carry + per-conv session counters

Incremental output equals the batch path's output for every prefix of the
stream, provided turns of one conversation arrive in (ts, turn_idx) order
across batches (the stream contract; late data is the caller's re-run per
SURVEY §2.9).  Lead specs are rejected — future turns don't exist yet.

Scale: P actors ~= cluster cores; carry is O(active_convs x overlap_rows)
per actor — bounded by evicting conversations idle past ``evict_idle_us``
(their next turn would start a new session anyway, so correctness of
session ids survives eviction only if eviction >= session gap; enforced).
Idleness is measured in EVENT time against the shard's newest event, so the
session guarantee additionally assumes bounded cross-conversation event-time
skew: a conversation whose clock lags the shard's newest event by more than
``evict_idle_us - gap`` can be evicted while its own next turn is still
within its session gap (the resumed turn then opens a new session).  Size
``evict_idle_us`` >= gap + max expected skew, or keep eviction off.
NOTE: eviction IS a semantic trade-off for the other windows — after an
evicted conversation resumes, lag/rolling features restart from empty
history (null lag at the resume row) where the batch path would look back
across the idle gap.  Eviction is off by default; enable it only when
features are session-scoped or the divergence is acceptable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from feast_ray.grouped import group_starts, hash_columns, sort_table, starts_to_row_gstart
from feast_ray.stages.salt import required_overlap
from feast_ray.stages.windows import Lead, Sessionize, make_window_kernel


@ray.remote
class TurnShardActor:
    """Owns the sorted turn buffers for one hash shard of conversations."""

    def __init__(
        self,
        specs: Sequence[object],
        *,
        key: str = "conv_id",
        ts_col: str = "ts",
        order_cols: Sequence[str] = ("ts", "turn_idx"),
        overlap_rows: Optional[int] = None,
        time_rows_bound: int = 0,
        evict_idle_us: Optional[int] = None,
    ):
        from feast_ray.stages.windows import Ewma, Expanding, RowNumber

        if any(isinstance(s, Lead) for s in specs):
            raise ValueError("Lead specs are not computable on a stream (future turns)")
        if any(isinstance(s, (Ewma, Expanding, RowNumber)) for s in specs):
            raise ValueError(
                "Ewma/Expanding/RowNumber need full-history state; not supported "
                "by the bounded turn buffer (use the batch path)"
            )
        from feast_ray.stages.windows import RollingTime

        if (
            overlap_rows is None
            and time_rows_bound == 0
            and any(isinstance(s, RollingTime) for s in specs)
        ):
            raise ValueError(
                "RollingTime needs a row bound for its lookback on the stream: "
                "pass time_rows_bound= or overlap_rows= (silent truncation "
                "otherwise)"
            )
        self.specs = list(specs)
        self.key = key
        self.ts_col = ts_col
        self.order_cols = list(order_cols)
        self.overlap = (
            overlap_rows
            if overlap_rows is not None
            else required_overlap(self.specs, time_rows_bound)
        )
        self.session_specs = [s for s in self.specs if isinstance(s, Sessionize)]
        self.plain_specs = [s for s in self.specs if not isinstance(s, Sessionize)]
        self.kernel = make_window_kernel(self.plain_specs, ts_col) if self.plain_specs else None
        gaps = [s.gap_us for s in self.session_specs]
        if evict_idle_us is not None and gaps and evict_idle_us < max(gaps):
            raise ValueError("evict_idle_us must be >= the largest session gap")
        self.evict_idle_us = evict_idle_us
        # per-conv state
        self.carry: dict = {}  # conv -> pa.Table of last `overlap` turns
        self.sess_count: dict = {}  # conv -> {spec.name: sessions so far}
        self.last_ts: dict = {}  # conv -> int64 ts of newest buffered turn

    def ingest(self, tbl: pa.Table) -> pa.Table:
        """Compute features for the new turns; returns them in input order of
        (conv, ts, turn_idx)."""
        if tbl.num_rows == 0:
            return tbl
        tbl = tbl.append_column("__new", pa.array(np.ones(tbl.num_rows, dtype=np.int8)))
        touched = pc.unique(tbl[self.key].combine_chunks()).to_pylist()
        parts = [tbl]
        for cid in touched:
            c = self.carry.get(cid)
            if c is not None and c.num_rows:
                parts.append(
                    c.append_column("__new", pa.array(np.zeros(c.num_rows, dtype=np.int8)))
                )
        t = pa.concat_tables(parts, promote_options="permissive")
        t = sort_table(t, [self.key] + self.order_cols)
        starts = group_starts(t, [self.key])
        out = self.kernel(t, starts) if self.kernel is not None else t

        n = out.num_rows
        ts = t[self.ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if pa.types.is_timestamp(t[self.ts_col].type) else t[self.ts_col].combine_chunks().cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        gstart = starts_to_row_gstart(starts)
        ar = np.arange(n, dtype=np.int64)
        has_prev = ar > gstart
        prev_ts = np.empty(n, dtype=np.int64)
        prev_ts[1:] = ts[:-1]
        prev_ts[0] = 0

        conv_col = t[self.key].combine_chunks()
        group_first_conv = [conv_col[int(s)].as_py() for s in starts[:-1]]
        sizes = np.diff(starts)

        for spec in self.session_specs:
            start_flag = np.where(has_prev & (ts - prev_ts <= spec.gap_us), 0, 1).astype(np.int64)
            # base = sessions already closed for the conv BEFORE this call,
            # minus 1 if this call's first buffered row continues that state
            # (the carry rows re-assert their own session starts, so subtract
            # the starts attributable to carry rows)
            base = np.fromiter(
                (self.sess_count.get(c, {}).get(spec.name, 0) for c in group_first_conv),
                count=len(group_first_conv),
                dtype=np.int64,
            )
            carry_rows = t["__new"].combine_chunks().to_numpy(zero_copy_only=False) == 0
            # session starts contributed by carry rows were already counted in
            # sess_count; zero them so the cumsum only adds NEW sessions.
            eff = np.where(carry_rows, 0, start_flag)
            # but a carry row's recomputed flag==1 at its group head double-counts
            # nothing: eff zeros it.  A NEW row continuing a carried session has
            # flag 0 -> cumsum unchanged.  Exact.
            cs = np.cumsum(eff)
            gbase = cs[gstart] - eff[gstart]
            sid = np.repeat(base, sizes) + (cs - gbase) - 1
            # rows before any new session in their conv (all-carry prefix)
            # keep the last known id: sid there = base - 1 (their original id)
            out = out.append_column(spec.name, pa.array(sid))
            # update counters with new sessions
            for g, c in enumerate(group_first_conv):
                lo, hi = starts[g], starts[g + 1]
                add = int(eff[lo:hi].sum())
                d = self.sess_count.setdefault(c, {})
                d[spec.name] = d.get(spec.name, 0) + add

        # slice out the new rows (they are interleaved after carried rows)
        new_mask = t["__new"].combine_chunks().to_numpy(zero_copy_only=False) == 1
        result = out.filter(pa.array(new_mask)).drop_columns(["__new"])

        # refresh carry: last `overlap` rows per conv (from the combined table)
        keep_cols = [c for c in tbl.column_names if c != "__new"]
        for g, c in enumerate(group_first_conv):
            lo, hi = int(starts[g]), int(starts[g + 1])
            take_lo = max(lo, hi - self.overlap)
            self.carry[c] = t.slice(take_lo, hi - take_lo).select(keep_cols).combine_chunks()
            self.last_ts[c] = int(ts[hi - 1])
        if self.evict_idle_us is not None:
            newest = max(self.last_ts.values(), default=0)
            stale = [c for c, lt in self.last_ts.items() if newest - lt > self.evict_idle_us]
            for c in stale:
                self.carry.pop(c, None)
                self.last_ts.pop(c, None)
                # sess_count kept: session ids must keep increasing after idle
        return result

    def stats(self) -> dict:
        return {
            "buffered_convs": len(self.carry),
            "buffered_rows": int(sum(t.num_rows for t in self.carry.values())),
        }


class StreamingTurnPipeline:
    """Router + actor pool: hash-split every incoming Arrow batch by conv_id
    and ingest each slice on its pinned shard actor."""

    def __init__(self, specs, *, num_shards: int = 4, key: str = "conv_id", **actor_kw):
        self.key = key
        self.num_shards = num_shards
        self.actors = [
            TurnShardActor.remote(list(specs), key=key, **actor_kw) for _ in range(num_shards)
        ]

    def ingest(self, tbl: pa.Table) -> pa.Table:
        """Synchronous convenience: returns the feature rows for this batch."""
        refs = self.ingest_async(tbl)
        outs = [r for r in ray.get(refs) if r.num_rows]
        return pa.concat_tables(outs) if outs else tbl.slice(0, 0)

    def ingest_async(self, tbl: pa.Table) -> list:
        h = (hash_columns(tbl, [self.key]) % np.uint64(self.num_shards)).astype(np.int64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        t = tbl.take(pa.array(order))
        bounds = np.searchsorted(hs, np.arange(self.num_shards + 1))
        refs = []
        for s in range(self.num_shards):
            part = t.slice(bounds[s], bounds[s + 1] - bounds[s])
            if part.num_rows:
                refs.append(self.actors[s].ingest.remote(part.combine_chunks()))
        return refs

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


@ray.remote
def _shard_feeder(actor, tbl: pa.Table, sort_cols: list, batch_size: int) -> pa.Table:
    """One shard's replay loop, running AS A RAY TASK (not on the driver):
    stream the shard's rows to its pinned actor in event-time order as
    micro-batches, collecting the incremental feature rows."""
    idx = pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in sort_cols])
    tbl = tbl.take(idx)
    outs = []
    for lo in range(0, tbl.num_rows, batch_size):
        part = tbl.slice(lo, batch_size).combine_chunks()
        out = ray.get(actor.ingest.remote(part))
        if out.num_rows:
            outs.append(out)
    return pa.concat_tables(outs) if outs else tbl.slice(0, 0)


def replay_distributed(
    specs,
    ds,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    num_shards: int = 4,
    batch_size: int = 4096,
    **actor_kw,
):
    """Distributed replay of a bounded event stream through the stateful
    shard-actor pool — the production-shaped feed (no driver loop):

    1. one hash exchange co-locates each conversation's rows on its shard
       (``grouped_map`` identity kernel — same partitioner as the router);
    2. one FEEDER TASK per shard replays its partition to its pinned actor
       in event-time order, micro-batch by micro-batch.

    Per-conversation arrival order is (ts, ...) within a shard, which is
    exactly the stream contract the actors require; cross-shard order is
    irrelevant (shards share no conversation).  Returns the concatenated
    incremental outputs as a Dataset.  Unbounded production ingest keeps
    the same actor pool and replaces the feeders with real consumers.
    """
    import ray.data as rd

    from feast_ray.grouped import grouped_map

    pipe = StreamingTurnPipeline(
        specs, num_shards=num_shards, key=key, ts_col=ts_col, **actor_kw
    )
    try:
        # identity kernel: the exchange just co-locates rows by key hash;
        # one output block per bucket = one replay partition per feeder task
        shards = grouped_map(
            ds, [key], lambda t, starts: t, num_buckets=num_shards
        )
        from feast_ray.grouped import block_refs_of

        refs = block_refs_of(shards)
        if not refs:
            return shards
        # global (ts, order_cols) sort per shard => per-conv stream order
        sort_cols = [ts_col] + [
            c for c in actor_kw.get("order_cols", ("ts", "turn_idx")) if c != ts_col
        ]
        # route each co-located block to a DISTINCT actor: blocks are
        # per-bucket, so a conversation appears in exactly one block
        out_refs = [
            _shard_feeder.remote(pipe.actors[i % num_shards], r, sort_cols, batch_size)
            for i, r in enumerate(refs)
        ]
        outs = [t for t in ray.get(out_refs) if t.num_rows]
    finally:
        pipe.shutdown()
    if not outs:
        return shards.limit(0)
    return rd.from_arrow(pa.concat_tables(outs))
