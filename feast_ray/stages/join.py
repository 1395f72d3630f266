"""Distributed semi / anti / general equi joins (SURVEY §2 J5 + J-core).

Feast's offline stores express entity filtering as SQL ``WHERE EXISTS`` /
``NOT EXISTS`` subqueries and feature composition as LEFT JOINs pushed to
the warehouse (upstream ``offline_store.py`` templating); here each is one
co-partitioned hash shuffle: both sides are tagged, unioned, bucketed by
the join keys, and a vectorized kernel resolves matches bucket-locally.

Scale notes:
- Semi/anti: ONE all-to-all over left + the right KEY COLUMNS only (the
  right side's payload never moves).  When the right side is known-small,
  prefer a broadcast ``ray.put`` set + ``map_batches`` filter instead —
  this module is the general path with no size assumption on either side.
- ``equi_join``: both sides' payloads shuffle once; the match fan-out is
  produced by pure index arithmetic (repeat/tile over group offsets), so a
  hot key costs O(matches) vectorized ``take``, never a Python loop.  For
  a small right side use the broadcast as-of/interval machinery or
  pre-filter instead of this all-to-all.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from feast_ray.grouped import block_refs_of, grouped_map, starts_to_group_index

_SIDE = "__fj_side"


def _dataset_schema(ds) -> pa.Schema:
    from feast_ray.grouped import dataset_schema

    return dataset_schema(ds)


def filter_join(
    left,
    right,
    *,
    keys: Sequence[str],
    mode: str = "semi",
    num_buckets: Optional[int] = None,
):
    """Keep left rows whose ``keys`` appear (semi) / don't appear (anti) in
    ``right``.  Duplicate right keys are fine (presence test only); left
    row multiplicity is preserved exactly (no join fan-out).

    NULL keys follow SQL ``EXISTS`` / ``NOT EXISTS`` semantics: a left row
    with any NULL key matches nothing (dropped by semi, kept by anti), and
    right rows with NULL keys assert nothing.  Those rows never enter the
    shuffle — NULL-key left rows are split off before bucketing and, for
    anti, unioned back onto the output.
    """
    import pyarrow.compute as pc

    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    keys = list(keys)
    left_schema = _dataset_schema(left)
    for k in keys:
        if k not in left_schema.names:
            raise ValueError(f"join key {k!r} not in left schema {left_schema.names}")
    union_schema = pa.schema(list(left_schema) + [pa.field(_SIDE, pa.int8())])

    def _keys_valid(t: pa.Table):
        m = None
        for k in keys:
            v = t[k].is_valid() if not isinstance(t[k], pa.ChunkedArray) else t[k].combine_chunks().is_valid()
            m = v if m is None else pc.and_(m, v)
        return m

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.filter(_keys_valid(t))  # NULL-key rows can never match
        cols = {f.name: t[f.name].cast(f.type) for f in left_schema}
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table({f.name: cols[f.name] for f in union_schema})

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(_keys_valid(t))  # NULL-key right rows assert nothing
        n = t.num_rows
        cols = {}
        for f in left_schema:
            if f.name in keys:
                cols[f.name] = t[f.name].cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, type=f.type)
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table({f.name: cols[f.name] for f in union_schema})

    both = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    want_present = mode == "semi"

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        side = t[_SIDE].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        has_right = np.bincount(gidx[side == 1], minlength=n_groups) > 0
        keep = (side == 0) & (has_right[gidx] == want_present)
        return t.filter(pa.array(keep)).drop_columns([_SIDE])

    out = grouped_map(both, keys, kernel, num_buckets=num_buckets)
    if mode == "anti":
        null_left = left.map_batches(
            lambda t: pa.table(
                {f.name: t.filter(pc.invert(_keys_valid(t)))[f.name].cast(f.type)
                 for f in left_schema}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = out.union(null_left)
    return out


def semi_join(left, right, *, keys, num_buckets=None):
    return filter_join(left, right, keys=keys, mode="semi", num_buckets=num_buckets)


def anti_join(left, right, *, keys, num_buckets=None):
    return filter_join(left, right, keys=keys, mode="anti", num_buckets=num_buckets)


def equi_join(
    left,
    right,
    *,
    keys: Sequence[str],
    how: str = "inner",
    right_cols: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
):
    """General hash equi-join returning left columns + right payload columns.

    SQL semantics (mirrors ``LEFT [OUTER] | INNER JOIN ... ON l.k = r.k``):
    duplicate keys fan out to the full cross product within the key group;
    NULL join keys match nothing (inner drops them, left emits them with
    NULL right columns — those rows never enter the shuffle).

    ``keys`` must exist under the same names on both sides (rename first via
    ``map_batches`` — the engine's M1 field-mapping stage).  ``right_cols``
    selects the right payload (default: every non-key right column); payload
    names must not clash with left columns.

    One all-to-all of both sides; per-bucket kernel sorts by ``(keys, side)``
    so each key group is a contiguous [left rows | right rows] block and the
    match expansion is three numpy index ops + vectorized ``take``.

    ``how="full"`` adds FULL OUTER: right rows whose key has no left match
    are emitted with the non-key left columns NULL (their union-tagged row
    already has exactly that shape); NULL-key rows from BOTH sides are
    emitted unmatched (SQL FULL JOIN semantics).
    """
    import pyarrow.compute as pc

    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be 'inner', 'left' or 'full', got {how!r}")
    keys = list(keys)
    left_schema = _dataset_schema(left)
    right_schema = _dataset_schema(right)
    for k in keys:
        if k not in left_schema.names:
            raise ValueError(f"join key {k!r} not in left schema {left_schema.names}")
        if k not in right_schema.names:
            raise ValueError(f"join key {k!r} not in right schema {right_schema.names}")
    if right_cols is None:
        right_cols = [n for n in right_schema.names if n not in keys]
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left_schema.names)
    if clash:
        raise ValueError(f"right payload columns clash with left: {sorted(clash)}")
    payload_fields = [right_schema.field(c) for c in right_cols]
    union_schema = pa.schema(
        list(left_schema) + payload_fields + [pa.field(_SIDE, pa.int8())]
    )

    def _keys_valid(t: pa.Table):
        m = None
        for k in keys:
            col = t[k].combine_chunks() if isinstance(t[k], pa.ChunkedArray) else t[k]
            v = col.is_valid()
            m = v if m is None else pc.and_(m, v)
        return m

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.filter(_keys_valid(t))
        n = t.num_rows
        cols = {f.name: t[f.name].cast(f.type) for f in left_schema}
        for f in payload_fields:
            cols[f.name] = pa.nulls(n, type=f.type)
        cols[_SIDE] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table({f.name: cols[f.name] for f in union_schema})

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(_keys_valid(t))
        n = t.num_rows
        cols = {}
        for f in left_schema:
            if f.name in keys:
                cols[f.name] = t[f.name].cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, type=f.type)
        for f in payload_fields:
            cols[f.name] = t[f.name].cast(f.type)
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table({f.name: cols[f.name] for f in union_schema})

    both = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_names = [f.name for f in left_schema] + right_cols

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        side = t[_SIDE].combine_chunks().to_numpy(zero_copy_only=False)
        n_groups = len(starts) - 1
        gidx = starts_to_group_index(starts)
        nl = np.bincount(gidx[side == 0], minlength=n_groups)
        nr = np.bincount(gidx[side == 1], minlength=n_groups)
        # sorted by (keys, side): group g = [left block | right block];
        # right block of group g begins at starts[g] + nl[g]
        right_start = starts[:-1] + nl
        left_pos = np.flatnonzero(side == 0)
        g_of_left = gidx[left_pos]
        rep = nr[g_of_left]  # matches per left row
        total = int(rep.sum())
        left_take = np.repeat(left_pos, rep)
        offs = np.repeat(np.cumsum(rep) - rep, rep)
        within = np.arange(total, dtype=np.int64) - offs
        right_take = np.repeat(right_start[g_of_left], rep) + within

        lt = pa.array(left_take)
        rt = pa.array(right_take)
        cols = {f.name: pc.take(t[f.name].combine_chunks(), lt) for f in left_schema}
        for c in right_cols:
            cols[c] = pc.take(t[c].combine_chunks(), rt)
        matched = pa.table({n: cols[n] for n in out_names})
        if how == "inner":
            return matched
        miss_pos = left_pos[rep == 0]
        mp = pa.array(miss_pos)
        mcols = {f.name: pc.take(t[f.name].combine_chunks(), mp) for f in left_schema}
        for f in payload_fields:
            mcols[f.name] = pa.nulls(len(miss_pos), type=f.type)
        misses = pa.table({n: mcols[n] for n in out_names})
        parts = [matched, misses]
        if how == "full":
            # right rows in key groups with no left rows: the union row is
            # already the FULL OUTER shape (keys filled, other left cols
            # NULL, payload real) — take it verbatim
            right_pos = np.flatnonzero(side == 1)
            rmiss = right_pos[nl[gidx[right_pos]] == 0]
            rp = pa.array(rmiss)
            rcols = {n: pc.take(t[n].combine_chunks(), rp) for n in out_names}
            parts.append(pa.table({n: rcols[n] for n in out_names}))
        return pa.concat_tables(parts)

    out = grouped_map(both, keys, kernel, sort_keys=[_SIDE], num_buckets=num_buckets)
    if how in ("left", "full"):
        null_left = left.map_batches(
            lambda t: _null_key_left(t, left_schema, payload_fields, out_names, _keys_valid),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = out.union(null_left)
    if how == "full":
        null_right = right.map_batches(
            lambda t: _null_key_right(
                t, keys, left_schema, payload_fields, out_names, _keys_valid
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = out.union(null_right)
    return out


def _null_key_left(t, left_schema, payload_fields, out_names, keys_valid):
    import pyarrow.compute as pc

    kept = t.filter(pc.invert(keys_valid(t)))
    cols = {f.name: kept[f.name].cast(f.type) for f in left_schema}
    for f in payload_fields:
        cols[f.name] = pa.nulls(kept.num_rows, type=f.type)
    return pa.table({n: cols[n] for n in out_names})


def _null_key_right(t, keys, left_schema, payload_fields, out_names, keys_valid):
    import pyarrow.compute as pc

    kept = t.filter(pc.invert(keys_valid(t)))
    n = kept.num_rows
    cols = {}
    for f in left_schema:
        if f.name in keys:
            cols[f.name] = kept[f.name].cast(f.type)
        else:
            cols[f.name] = pa.nulls(n, type=f.type)
    for f in payload_fields:
        cols[f.name] = kept[f.name].cast(f.type)
    return pa.table({n2: cols[n2] for n2 in out_names})


def skew_join(
    left,
    right,
    *,
    keys: Sequence[str],
    how: str = "inner",
    right_cols: Optional[Sequence[str]] = None,
    hot_threshold: int = 100_000,
    num_buckets: Optional[int] = None,
):
    """Skew-aware equi-join: keys whose RIGHT-side row count reaches
    ``hot_threshold`` take a broadcast map-side path; everything else takes
    the co-partitioned shuffle (``equi_join``).  Same inner/left semantics
    and output columns, any row order.

    Why: a hash shuffle sends ALL rows of one key to one reducer — a hot
    key (a viral entity, a default value) turns the exchange into a
    straggler.  The standard fix is to split the key space: hot keys'
    right rows are broadcast once (``ray.put``) and joined batch-locally on
    the map side (pyarrow's C++ hash join per batch), so the hot left rows
    never shuffle at all; the cold remainder joins on the normal exchange.

    Hot-key detection is a distributed count (per-batch ``value_counts``
    combiner + grouped sum — the same map-side-partial shape the engine
    uses everywhere) and only keys ABOVE the threshold reach the driver,
    so driver state is O(hot keys), not O(keys).  The broadcast side holds
    ``hot_keys x right rows per hot key`` — bound it with the threshold
    and the knowledge that a key hot on BOTH sides is a cross-product no
    partitioning scheme saves you from.
    """
    import ray
    import ray.data as rd

    import pyarrow.compute as pc

    from feast_ray.grouped import grouped_map as _gm

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = list(keys)
    right_schema = _dataset_schema(right)
    if right_cols is None:
        right_cols = [n for n in right_schema.names if n not in keys]
    right_cols = list(right_cols)

    # distributed right-side key counts; only above-threshold keys collect
    def partial_counts(t: pa.Table) -> pa.Table:
        cols = {k: pa.array([], t[k].type) for k in keys}
        cols["__cnt"] = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table(cols)
        import pandas as pd

        kf = pd.DataFrame({k: t[k].combine_chunks().to_pandas() for k in keys})
        codes, _ = pd.factorize(pd.MultiIndex.from_frame(kf), sort=False)
        cnt = np.bincount(codes)
        _, first_idx = np.unique(codes, return_index=True)
        take = pa.array(first_idx.astype(np.int64))
        out = {k: pc.take(t[k].combine_chunks(), take) for k in keys}
        out["__cnt"] = pa.array(cnt.astype(np.int64))
        return pa.table(out)

    def sum_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        c = t["__cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        total = np.add.reduceat(c, firsts) if len(c) else np.zeros(0, np.int64)
        out = {k: pc.take(t[k].combine_chunks(), pa.array(firsts)) for k in keys}
        out["__cnt"] = pa.array(total)
        return pa.table(out)

    counts = _gm(
        right.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True),
        keys,
        sum_kernel,
        num_buckets=num_buckets,
    )
    hot_tbl = pa.concat_tables(
        [
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
            for t in ray.get(
                block_refs_of(
                    counts.map_batches(
                        lambda t: t.filter(
                            pc.greater_equal(t["__cnt"], pa.scalar(hot_threshold, pa.int64()))
                        ).select(keys),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    )
                )
            )
        ]
    ).combine_chunks()

    if hot_tbl.num_rows == 0:
        return equi_join(
            left, right, keys=keys, how=how, right_cols=right_cols, num_buckets=num_buckets
        )

    hot_ref = ray.put(hot_tbl)

    def splitter(keep_hot: bool):
        def f(t: pa.Table) -> pa.Table:
            hot = ray.get(hot_ref)
            # the C++ join may reorder, so probe with a rowid and sort back
            rid = pa.array(np.arange(t.num_rows, dtype=np.int64))
            probe = pa.Table.from_arrays(
                [t[k] for k in keys] + [rid], names=keys + ["__rid"]
            )
            m = probe.join(
                hot.append_column("__hot", pa.array(np.ones(hot.num_rows, np.int8))),
                keys=keys,
                join_type="left outer",
            )
            order = pc.sort_indices(m, sort_keys=[("__rid", "ascending")])
            is_hot = (
                pc.take(m["__hot"], order).is_valid().to_numpy(zero_copy_only=False)
            )
            return t.filter(pa.array(is_hot if keep_hot else ~is_hot))

        return f

    left_hot = left.map_batches(splitter(True), batch_format="pyarrow", zero_copy_batch=True)
    left_cold = left.map_batches(splitter(False), batch_format="pyarrow", zero_copy_batch=True)
    right_hot = right.map_batches(splitter(True), batch_format="pyarrow", zero_copy_batch=True)
    right_cold = right.map_batches(splitter(False), batch_format="pyarrow", zero_copy_batch=True)

    # broadcast the hot right rows once; join batch-locally on the map side
    hot_right_tbl = pa.concat_tables(
        [
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
            for t in ray.get(block_refs_of(right_hot))
        ],
        promote_options="default",
    ).combine_chunks()
    hot_right_tbl = pa.table(
        {k: hot_right_tbl[k] for k in keys + [c for c in right_cols]}
    )
    hot_right_ref = ray.put(hot_right_tbl)
    jt = "inner" if how == "inner" else "left outer"
    out_names = [f.name for f in _dataset_schema(left)] + right_cols

    def map_join(t: pa.Table) -> pa.Table:
        r = ray.get(hot_right_ref)
        joined = t.join(r, keys=keys, join_type=jt)
        return pa.table({n: joined[n] for n in out_names})

    hot_joined = left_hot.map_batches(map_join, batch_format="pyarrow", zero_copy_batch=True)
    cold_joined = equi_join(
        left_cold, right_cold, keys=keys, how=how, right_cols=right_cols, num_buckets=num_buckets
    )
    return cold_joined.union(hot_joined)


def overlap_join(
    left,
    right,
    *,
    keys: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    num_buckets: Optional[int] = None,
):
    """Interval-overlap join for per-key NON-OVERLAPPING interval sets:
    emit one row per (left, right) pair of the same key whose HALF-OPEN
    intervals intersect (``l_start < r_end AND r_start < l_end``) — the
    session x calendar-window / episode x maintenance-window alignment op
    (upstream Feast has no interval algebra at all; its closest relative is
    the validity-window join, ``stages.asof.interval_join``).

    The non-overlap contract (each SIDE's intervals are disjoint within a
    key — true for sessions, calendar buckets, SCD-2 validity ranges) is
    what makes this one shuffle + pure index arithmetic: disjoint sorted
    intervals have sorted ends, so the rights overlapping a left form ONE
    contiguous run located by two searchsorteds over group-rebased bounds,
    and the pair fan-out is the same repeat/arange used by ``equi_join``.
    The contract is VERIFIED per bucket (clear error, not silent wrong
    answers).  Output = all left columns + all right columns (names must
    not clash); inner semantics (pairs only).
    """
    import pyarrow.compute as pc

    keys = list(keys)
    ls = _dataset_schema(left)
    rs = _dataset_schema(right)
    l_cols = [n for n in ls.names if n not in keys]
    r_cols = [n for n in rs.names if n not in keys]
    clash = set(l_cols) & set(r_cols)
    if clash:
        raise ValueError(f"left/right column names clash: {sorted(clash)}")
    union_schema = pa.schema(
        [ls.field(k) for k in keys]
        + [ls.field(c) for c in l_cols]
        + [rs.field(c) for c in r_cols]
        + [pa.field(_SIDE, pa.int8())]
    )

    def tag(side_val: int, schema_in, own_cols, other_cols, other_schema):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {k: t[k].cast(union_schema.field(k).type) for k in keys}
            for c in own_cols:
                cols[c] = t[c].cast(union_schema.field(c).type)
            for c in other_cols:
                cols[c] = pa.nulls(n, type=union_schema.field(c).type)
            cols[_SIDE] = pa.array(np.full(n, side_val, dtype=np.int8))
            return pa.table({f.name: cols[f.name] for f in union_schema})

        return f

    both = left.map_batches(
        tag(0, ls, l_cols, r_cols, rs), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            tag(1, rs, r_cols, l_cols, ls), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def to_us(arr):
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_timestamp(a.type):
            a = a.cast(pa.timestamp("us", tz=a.type.tz))
        return a.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)

    out_names = keys + l_cols + r_cols

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        empty = union_schema.empty_table().select(out_names)
        if t.num_rows == 0:
            return empty
        side = t[_SIDE].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        is_l = side == 0
        # sorted by (keys, side, start within side) is NOT guaranteed by the
        # exchange (sort key = side only), so locate and sort each side here
        lpos = np.flatnonzero(is_l)
        rpos = np.flatnonzero(~is_l)
        lsv = to_us(t[l_start])[lpos]
        lev = to_us(t[l_end])[lpos]
        rsv = to_us(t[r_start])[rpos]
        rev = to_us(t[r_end])[rpos]
        lg = gidx[lpos]
        rg = gidx[rpos]
        lo_ = np.lexsort((lsv, lg))
        ro_ = np.lexsort((rsv, rg))
        lpos, lsv, lev, lg = lpos[lo_], lsv[lo_], lev[lo_], lg[lo_]
        rpos, rsv, rev, rg = rpos[ro_], rsv[ro_], rev[ro_], rg[ro_]
        # verify the per-key non-overlap contract on both sides
        for nm, sv, ev, gv in (("left", lsv, lev, lg), ("right", rsv, rev, rg)):
            if len(sv) > 1:
                same = gv[1:] == gv[:-1]
                if (same & (sv[1:] < ev[:-1])).any():
                    raise ValueError(
                        f"overlap_join: {nm} intervals overlap within a key — "
                        "the non-overlap contract does not hold for this input"
                    )
        if len(lpos) == 0 or len(rpos) == 0:
            return empty
        # group-rebase bounds so ONE global searchsorted serves every group
        r_group_starts = np.searchsorted(rg, np.arange(n_groups))
        r_group_ends = np.searchsorted(rg, np.arange(n_groups), side="right")
        base = np.zeros(n_groups, dtype=np.int64)
        has_r = r_group_ends > r_group_starts
        base[has_r] = rsv[r_group_starts[np.flatnonzero(has_r)]]
        span = np.zeros(n_groups, dtype=np.int64)
        span[has_r] = rev[r_group_ends[np.flatnonzero(has_r)] - 1] - base[has_r]
        offset = int(span.max()) + 2 if len(span) else 2
        if n_groups * offset >= 2**62:
            raise ValueError("interval spans too large for the packed key space")
        rs_key = rg * offset + np.clip(rsv - base[rg], 0, offset - 1)
        re_key = rg * offset + np.clip(rev - base[rg], 0, offset - 1)
        ql = lg * offset + np.clip(lsv - base[lg], 0, offset - 1)
        qh = lg * offset + np.clip(lev - base[lg], 0, offset - 1)
        lo = np.searchsorted(re_key, ql, side="right")
        hi = np.searchsorted(rs_key, qh, side="left")
        # groups without rights: both bounds land at the same position
        rep = np.maximum(hi - lo, 0)
        total = int(rep.sum())
        if total == 0:
            return empty
        l_take = np.repeat(lpos, rep)
        offs = np.repeat(np.cumsum(rep) - rep, rep)
        within = np.arange(total, dtype=np.int64) - offs
        r_take = rpos[np.repeat(lo, rep) + within]
        cols = {}
        for k in keys:
            cols[k] = pc.take(t[k].combine_chunks(), pa.array(l_take))
        for c in l_cols:
            cols[c] = pc.take(t[c].combine_chunks(), pa.array(l_take))
        for c in r_cols:
            cols[c] = pc.take(t[c].combine_chunks(), pa.array(r_take))
        return pa.table({n: cols[n] for n in out_names})

    return grouped_map(both, keys, kernel, sort_keys=[_SIDE], num_buckets=num_buckets)
