"""Salted-key splitting for hot entities (SURVEY §4.2, BASELINE.json:6).

A conversation whose row count exceeds a worker's chunk budget becomes a
straggler (and, at the extreme, an OOM) under plain hash-by-``conv_id``
partitioning.  This stage splits such entities into bounded sub-chunks
WITHOUT losing window-kernel exactness:

    salt        = turn_idx // chunk_rows          (deterministic pre-shuffle:
                                                   the transcript schema
                                                   carries the within-entity
                                                   ordinal ``turn_idx``)
    overlap     = the last ``overlap_rows`` rows of chunk c are ALSO sent to
                  chunk c+1, flagged ``__ovl=1``; the kernel computes over
                  real+overlap rows sorted together and drops overlap rows on
                  emit — so lag/rolling windows at a chunk boundary see the
                  exact same trailing history as the unsalted path.
    shuffle key = (conv_id, salt)  — a hot conversation now occupies
                  ceil(n / chunk_rows) independent reducers.

Exactness contract:
- ``Lag(col, k)`` / ``RollingRows(col, k)``: exact iff
  ``overlap_rows >= k`` (``k-1`` for rolling) — trailing history is row-bounded.
- ``Lead(col, k)``: exact iff ``overlap_rows >= k`` (leads are taken from the
  NEXT chunk's overlap copy mirrored backward — implemented by also sending
  the FIRST ``overlap_rows`` rows of chunk c to chunk c-1).
- ``RollingTime(col, delta_us)``: exact iff every entity has at most
  ``overlap_rows`` rows inside any ``delta_us`` time window — a caller-owned
  bound (rate limit), now ENFORCED at runtime: the kernel detects a window
  that would have been silently truncated at a chunk boundary and raises
  (see ``_check_rolling_time_bound``).
- ``Sessionize(gap_us)``: the boundary decision needs only the previous row
  (overlap >= 1), but session ids are a per-entity running count — repaired
  exactly by a cheap second phase: per-chunk ``session_start`` sums (a tiny
  aggregate) are prefix-summed per entity and added back as offsets.
- ``Expanding(col, aggs)`` — ALL aggs: chunk-LOCAL expanding over real
  rows only, then the same tiny second phase carries per-entity prefix
  state across chunks.  count/sum/min/max combine directly (cumsum
  offsets, exclusive cummin/cummax); mean/std derive from the repaired
  (count, sum, sum-of-squares) prims; last carries the latest non-null
  chunk aggregate forward (shift + ffill per entity).  Integer-fed
  count/min/max/last are exact; float sums (and the mean/std derived from
  them) reproduce the unsalted result up to float reassociation at chunk
  boundaries.
- ``RowNumber()``: chunk-local ordinal + per-entity prefix ROW counts —
  exact.
- ``Ewma(col, alpha)``: the recurrence is a linear map per chunk
  (y_end = (1-a)^rows * y_in + z_end, z = the zero-seeded local walk), so
  chunks compose by scanning those maps per entity in the tiny phase-2
  metadata; per row y_i = z_i + (1-a)^(i+1) * y_in.  Matches the unsalted
  walk up to float reassociation (~1e-12 relative); the (1-a)^rows factor
  underflowing to 0.0 on huge chunks is the mathematically correct limit.

The two-phase session repair checkpoints the featured table once
(``materialize()``); in the backfill sink this checkpoint is the partitioned
parquet output itself, so no extra materialization happens at scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map, starts_to_row_gstart
from feast_ray.stages.windows import (
    Ewma,
    Expanding,
    Lag,
    Lead,
    RollingRows,
    RollingTime,
    RowNumber,
    Sessionize,
    _empty_with_spec_columns,
    make_window_kernel,
)

SALT_COL = "__salt"
OVL_COL = "__ovl"


def required_overlap(specs: Sequence[object], time_rows_bound: int = 0) -> int:
    """Minimum overlap_rows for exactness given the spec list."""
    need = 1
    for s in specs:
        if isinstance(s, (Lag, Lead)):
            need = max(need, s.k)
        elif isinstance(s, RollingRows):
            need = max(need, s.k - 1)
        elif isinstance(s, RollingTime):
            need = max(need, time_rows_bound)
        elif isinstance(s, Sessionize):
            need = max(need, 1)
    return need


def _salt_and_overlap(tbl: pa.Table, ordinal_col: str, chunk_rows: int, overlap_rows: int,
                      want_lead: bool) -> pa.Table:
    """Tag each row with its salt chunk; emit overlap copies to the next
    chunk (trailing history) and, when leads are requested, to the previous
    chunk (leading future)."""
    ordinal = tbl[ordinal_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    salt = (ordinal // chunk_rows).astype(np.int32)
    local = ordinal - salt.astype(np.int64) * chunk_rows
    n = tbl.num_rows
    real = tbl.append_column(SALT_COL, pa.array(salt)).append_column(
        OVL_COL, pa.array(np.zeros(n, dtype=np.int8))
    )
    parts = [real]
    tail = local >= chunk_rows - overlap_rows
    if tail.any():
        t = tbl.filter(pa.array(tail))
        parts.append(
            t.append_column(SALT_COL, pa.array(salt[tail] + 1)).append_column(
                OVL_COL, pa.array(np.ones(int(tail.sum()), dtype=np.int8))
            )
        )
    if want_lead:
        head = (local < overlap_rows) & (salt > 0)
        if head.any():
            t = tbl.filter(pa.array(head))
            parts.append(
                t.append_column(SALT_COL, pa.array(salt[head] - 1)).append_column(
                    OVL_COL, pa.array(np.ones(int(head.sum()), dtype=np.int8))
                )
            )
    return pa.concat_tables(parts) if len(parts) > 1 else real


def salted_window_features(
    ds,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    ordinal_col: str = "turn_idx",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    specs: Sequence[object],
    chunk_rows: int,
    overlap_rows: Optional[int] = None,
    time_rows_bound: int = 0,
    num_buckets: Optional[int] = None,
):
    """Window features with hot-entity splitting; result matches
    :func:`feast_ray.stages.windows.add_window_features` exactly (modulo row
    order) under the overlap contract in the module docstring."""
    specs = list(specs)
    _EXP_OK = {"count", "sum", "min", "max", "mean", "std", "last"}
    expanding_specs = [s for s in specs if isinstance(s, Expanding)]
    ewma_specs = [s for s in specs if isinstance(s, Ewma)]
    rownum_specs = [s for s in specs if isinstance(s, RowNumber)]
    for e in expanding_specs:
        unknown = set(e.aggs) - _EXP_OK
        if unknown:
            raise ValueError(f"unknown Expanding aggs {sorted(unknown)}")
    for s in ewma_specs:
        if not 0.0 < s.alpha <= 1.0:
            raise ValueError("Ewma.alpha must be in (0, 1]")
    if (
        overlap_rows is None
        and time_rows_bound == 0
        and any(isinstance(s, RollingTime) for s in specs)
    ):
        raise ValueError(
            "RollingTime under salting needs a row bound for its lookback: "
            "pass time_rows_bound=<max rows within delta_us per entity> or an "
            "explicit overlap_rows — otherwise boundary windows would be "
            "silently truncated"
        )
    ovl = overlap_rows if overlap_rows is not None else required_overlap(specs, time_rows_bound)
    if ovl >= chunk_rows:
        raise ValueError(f"overlap_rows ({ovl}) must be < chunk_rows ({chunk_rows})")
    session_specs = [s for s in specs if isinstance(s, Sessionize)]
    plain_specs = [
        s for s in specs
        if not isinstance(s, (Sessionize, Expanding, Ewma, RowNumber))
    ]
    want_lead = any(isinstance(s, Lead) for s in specs)
    rolling_time_specs = [s for s in specs if isinstance(s, RollingTime)]
    wk = make_window_kernel(plain_specs, ts_col) if plain_specs else None
    # Chunk-local cumulative PRIMS run over REAL rows only (overlap copies
    # would double-count prefix state); each declared Expanding agg is
    # derived in phase 2 from prefix-combinable prims: count always (null
    # masks), sum for sum/mean/std, sum-of-squares (expanding sum over a
    # derived x^2 column) for std, min/max/last as requested.
    exp_plan: list[tuple] = []  # (spec, internal_prefix, prims, sq_col)
    sq_cols: dict[str, str] = {}
    for i, e in enumerate(expanding_specs):
        a = set(e.aggs)
        prims = {"count"}
        if a & {"sum", "mean", "std"}:
            prims.add("sum")
        if "std" in a:
            prims.add("sumsq")
        prims |= a & {"min", "max", "last"}
        sq = sq_cols.setdefault(e.col, f"__sq_{e.col}") if "sumsq" in prims else None
        exp_plan.append((e, f"__p{i}", prims, sq))
    exp_internal: list[Expanding] = []
    for e, pfx, prims, sq in exp_plan:
        exp_internal.append(
            Expanding(e.col, aggs=tuple(sorted(prims - {"sumsq"})), prefix=pfx)
        )
        if sq is not None:
            exp_internal.append(Expanding(sq, aggs=("sum",), prefix=f"{pfx}sq"))
    wk_exp = make_window_kernel(exp_internal, ts_col) if exp_internal else None
    need_lrn = bool(rownum_specs or ewma_specs)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if rolling_time_specs and t.num_rows:
            _check_rolling_time_bound(t, starts, rolling_time_specs, ts_col, ovl)
        out = wk(t, starts) if wk is not None else t
        n = out.num_rows
        if n == 0:
            out = _append_session_cols(out, session_specs, empty=True)
            if exp_internal:
                out = _empty_with_spec_columns(out, exp_internal)
            if need_lrn:
                out = out.append_column("__lrn", pa.array([], pa.int64()))
            for s in ewma_specs:
                out = out.append_column(f"__z_{s.out}", pa.array([], pa.float64()))
            return out.drop_columns([OVL_COL])
        if session_specs:
            ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            ordv = t[ordinal_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            gstart = starts_to_row_gstart(starts)
            ar = np.arange(n, dtype=np.int64)
            prev_ts = np.empty(n, dtype=np.int64)
            prev_ts[1:] = ts[:-1]
            prev_ts[0] = 0
            has_prev = ar > gstart
            for spec in session_specs:
                start_flag = np.where(
                    ordv == 0,
                    1,
                    np.where(has_prev & (ts - prev_ts <= spec.gap_us), 0, 1),
                ).astype(np.int64)
                out = out.append_column(f"__start_{spec.name}", pa.array(start_flag))
        # drop overlap rows, then chunk-local session cumsum over real rows
        ovl_mask = out[OVL_COL].combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        # group starts must be recomputed over real rows for the cumsum
        keep_idx = np.flatnonzero(~ovl_mask)
        gstart_all = starts_to_row_gstart(starts)
        kept_group = gstart_all[keep_idx]  # original group id (start offset) per kept row
        out = out.take(pa.array(keep_idx))
        m = out.num_rows
        if m:
            first_of_group = np.ones(m, dtype=bool)
            first_of_group[1:] = kept_group[1:] != kept_group[:-1]
            starts_kept = np.concatenate(
                (np.flatnonzero(first_of_group), [m])
            ).astype(np.int64)
        if exp_internal:
            if m:
                out = wk_exp(out, starts_kept)
            else:
                out = _empty_with_spec_columns(out, exp_internal)
        if need_lrn:
            if m:
                ar = np.arange(m, dtype=np.int64)
                gpos = np.maximum.accumulate(np.where(first_of_group, ar, 0))
                out = out.append_column("__lrn", pa.array(ar - gpos + 1))
            else:
                out = out.append_column("__lrn", pa.array([], pa.int64()))
        for s in ewma_specs:
            if not m:
                out = out.append_column(f"__z_{s.out}", pa.array([], pa.float64()))
                continue
            col = out[s.col].combine_chunks()
            if col.null_count:
                raise ValueError(f"{s.col} has nulls; ewma over nulls is undefined")
            # zero-seeded local walk: z_0 = a*x_0 achieved by scaling each
            # chunk's first element (the recurrence is identical afterwards)
            x = col.cast(pa.float64()).to_numpy(zero_copy_only=False).copy()
            x[starts_kept[:-1]] *= s.alpha
            from feast_ray.stages.windows import ewma_walk

            out = out.append_column(
                f"__z_{s.out}", pa.array(ewma_walk(x, starts_kept, s.alpha))
            )
        if session_specs and m:
            for spec in session_specs:
                sf = out[f"__start_{spec.name}"].combine_chunks().to_numpy(zero_copy_only=False)
                cs = np.cumsum(sf)
                # starts seen before this row's chunk (cs is bucket-global)
                base = np.maximum.accumulate(np.where(first_of_group, cs - sf, 0))
                out = out.append_column(f"__local_{spec.name}", pa.array(cs - base - 1))
        return out.drop_columns([OVL_COL])

    def tag(t: pa.Table) -> pa.Table:
        # derived x^2 columns (expanding std prims) ride along with salt +
        # overlap copies; float64 first so integer columns cannot overflow
        for col, sq in sq_cols.items():
            c = t[col].cast(pa.float64())
            t = t.append_column(sq, pc.multiply(c, c))
        return _salt_and_overlap(t, ordinal_col, chunk_rows, ovl, want_lead)

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    featured = grouped_map(
        tagged,
        [key, SALT_COL],
        kernel,
        sort_keys=list(order_cols),
        num_buckets=num_buckets,
    )
    if not (session_specs or expanding_specs or rownum_specs or ewma_specs):
        return featured.drop_columns([SALT_COL])

    # Phase 2: exact session-id repair — prefix-sum per-entity chunk start
    # counts (tiny aggregate), then add offsets.  The materialize() is the
    # phase checkpoint (== the parquet sink in the backfill path).
    import ray

    featured = featured.materialize()

    # Per-chunk aggregates the phase-2 repair needs, keyed by SPEC index
    # (the same column may appear in several Expanding specs).
    agg_ops: dict[str, str] = {}
    for spec in session_specs:
        agg_ops[f"__start_{spec.name}"] = "sum"
    for e, pfx, prims, sq in exp_plan:
        if "count" in prims:
            agg_ops[f"__ecnt_{pfx}"] = "sum"
        if "sum" in prims:
            agg_ops[f"__esum_{pfx}"] = "sum"
        if "sumsq" in prims:
            agg_ops[f"__esq_{pfx}"] = "sum"
        if "min" in prims:
            agg_ops[f"__emin_{pfx}"] = "min"
        if "max" in prims:
            agg_ops[f"__emax_{pfx}"] = "max"
        if "last" in prims:
            agg_ops[f"__elast_{pfx}"] = "last"
    if need_lrn:
        agg_ops["__nrows"] = "sum"
    for s in ewma_specs:
        agg_ops[f"__zend_{s.out}"] = "last"
        agg_ops[f"__xfirst_{s.out}"] = "first"

    def partial_counts(t: pa.Table) -> pa.Table:
        cols = {key: t[key], SALT_COL: t[SALT_COL]}
        for spec in session_specs:
            cols[f"__start_{spec.name}"] = t[f"__start_{spec.name}"]
        pdf = pa.table(cols).to_pandas()
        for e, pfx, prims, sq in exp_plan:
            ser = t[e.col].to_pandas()
            if "count" in prims:
                pdf[f"__ecnt_{pfx}"] = ser.notna().astype("int64")
            if "sum" in prims:
                pdf[f"__esum_{pfx}"] = ser.astype("float64").fillna(0.0)
            if "sumsq" in prims:
                sf = ser.astype("float64")
                pdf[f"__esq_{pfx}"] = (sf * sf).fillna(0.0)
            if "min" in prims:
                pdf[f"__emin_{pfx}"] = ser.astype("float64")
            if "max" in prims:
                pdf[f"__emax_{pfx}"] = ser.astype("float64")
            if "last" in prims:
                pdf[f"__elast_{pfx}"] = ser.astype("float64")
        if need_lrn:
            pdf["__nrows"] = np.ones(t.num_rows, dtype=np.int64)
        for s in ewma_specs:
            pdf[f"__zend_{s.out}"] = t[f"__z_{s.out}"].to_pandas()
            pdf[f"__xfirst_{s.out}"] = t[s.col].to_pandas().astype("float64")
        agg = pdf.groupby([key, SALT_COL], as_index=False).agg(agg_ops)
        return pa.Table.from_pandas(agg, preserve_index=False)

    meta = featured.map_batches(partial_counts, batch_format="pyarrow").to_pandas()
    meta = (
        meta.groupby([key, SALT_COL], as_index=False)
        .agg(agg_ops)
        .sort_values([key, SALT_COL])
        .reset_index(drop=True)
    )
    first_of_entity = ~meta[key].duplicated().to_numpy()
    off_df = meta[[key, SALT_COL]].copy()
    for spec in session_specs:
        col = f"__start_{spec.name}"
        off_df[f"__off_{spec.name}"] = (
            meta.groupby(key)[col].cumsum() - meta[col]
        ).astype(np.int64)
    g = meta.groupby(key)
    for e, pfx, prims, sq in exp_plan:
        if "count" in prims:
            c = f"__ecnt_{pfx}"
            off_df[f"__offcnt_{pfx}"] = (g[c].cumsum() - meta[c]).astype(np.int64)
        if "sum" in prims:
            c = f"__esum_{pfx}"
            off_df[f"__offsum_{pfx}"] = g[c].cumsum() - meta[c]
        if "sumsq" in prims:
            c = f"__esq_{pfx}"
            off_df[f"__offsq_{pfx}"] = g[c].cumsum() - meta[c]
        # An all-null chunk yields a NaN chunk aggregate; pandas cummin/cummax
        # would emit NaN AT that chunk, so shift(1) hands the NEXT chunk a NaN
        # prefix and the earlier running extremum is lost.  Fill with +/-inf so
        # the running extremum carries through null chunks, then map the
        # sentinel (and the per-entity first chunk) back to NaN.
        if "min" in prims:
            filled = meta[f"__emin_{pfx}"].fillna(np.inf)
            pre = filled.groupby(meta[key]).cummin().shift(1).to_numpy(dtype=float)
            pre[first_of_entity] = np.nan
            pre[np.isposinf(pre)] = np.nan
            off_df[f"__premin_{pfx}"] = pre
        if "max" in prims:
            filled = meta[f"__emax_{pfx}"].fillna(-np.inf)
            pre = filled.groupby(meta[key]).cummax().shift(1).to_numpy(dtype=float)
            pre[first_of_entity] = np.nan
            pre[np.isneginf(pre)] = np.nan
            off_df[f"__premax_{pfx}"] = pre
        # last: latest non-null chunk aggregate among PRECEDING chunks —
        # shift(1) within the entity, then ffill within the entity so
        # all-null chunks pass the carry through
        if "last" in prims:
            pre = g[f"__elast_{pfx}"].shift(1)
            pre = pre.groupby(meta[key]).ffill().to_numpy(dtype=float)
            off_df[f"__prelast_{pfx}"] = pre
    if need_lrn:
        off_df["__offrows"] = (
            g["__nrows"].cumsum() - meta["__nrows"]
        ).astype(np.int64)
    # Ewma composes per chunk as the linear map y_end = (1-a)^rows * y_in
    # + z_end; scan the maps per entity over the tiny metadata (one row per
    # entity-chunk).  y_in of the FIRST chunk is the entity's first value:
    # z_0 + (1-a)*x_0 = a*x_0 + (1-a)*x_0 = x_0, the unsalted seed.
    for s in ewma_specs:
        zend = meta[f"__zend_{s.out}"].to_numpy(dtype=float)
        xfirst = meta[f"__xfirst_{s.out}"].to_numpy(dtype=float)
        nrows = meta["__nrows"].to_numpy(dtype=np.int64)
        decay = 1.0 - s.alpha
        yin = np.empty(len(meta), dtype=float)
        prev_end = 0.0
        for i in range(len(meta)):
            yin[i] = xfirst[i] if first_of_entity[i] else prev_end
            prev_end = zend[i] + decay ** int(nrows[i]) * yin[i]
        off_df[f"__yin_{s.out}"] = yin
    off_ref = ray.put(off_df)

    def _np(arr) -> np.ndarray:
        return arr.combine_chunks().to_numpy(zero_copy_only=False)

    def finalize(t: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        # vectorized offset lookup: one hash-join per batch (no per-row dict)
        left = t.select([key, SALT_COL]).to_pandas()
        merged = left.merge(offs, on=[key, SALT_COL], how="left")
        out = t
        for spec in session_specs:
            local = out[f"__local_{spec.name}"].to_numpy()
            base = (
                merged[f"__off_{spec.name}"].fillna(0).to_numpy(dtype=np.int64)
            )
            out = out.append_column(spec.name, pa.array(base + local))
            out = out.drop_columns([f"__local_{spec.name}", f"__start_{spec.name}"])
        drop_internal: list[str] = []
        for e, pfx, prims, sq in exp_plan:
            local_cnt = _np(out[f"{pfx}_count"]).astype(np.int64)
            offcnt = merged[f"__offcnt_{pfx}"].fillna(0).to_numpy(dtype=np.int64)
            total_cnt = local_cnt + offcnt
            total_sum = total_q = None
            if "sum" in prims:
                lf = _np(out[f"{pfx}_sum"])
                offsum = merged[f"__offsum_{pfx}"].fillna(0.0).to_numpy(dtype=float)
                total_sum = np.where(np.isnan(lf), 0.0, lf) + offsum
            if "sumsq" in prims:
                lq = _np(out[f"{pfx}sq_sum"])
                offsq = merged[f"__offsq_{pfx}"].fillna(0.0).to_numpy(dtype=float)
                total_q = np.where(np.isnan(lq), 0.0, lq) + offsq
            for a in e.aggs:
                name = e.out(a)
                if a == "count":
                    out = out.append_column(name, pa.array(total_cnt))
                elif a == "sum":
                    out = out.append_column(
                        name, pa.array(total_sum, mask=total_cnt == 0)
                    )
                elif a == "mean":
                    with np.errstate(invalid="ignore", divide="ignore"):
                        v = total_sum / total_cnt
                    out = out.append_column(name, pa.array(v, mask=total_cnt == 0))
                elif a == "std":  # sample stddev — rolling_aggs' formula
                    with np.errstate(invalid="ignore", divide="ignore"):
                        var = np.maximum(
                            total_q - total_sum * total_sum / np.maximum(total_cnt, 1),
                            0.0,
                        ) / np.maximum(total_cnt - 1, 1)
                    out = out.append_column(
                        name, pa.array(np.sqrt(var), mask=total_cnt < 2)
                    )
                elif a == "min":
                    v = np.fmin(
                        _np(out[f"{pfx}_min"]),
                        merged[f"__premin_{pfx}"].to_numpy(dtype=float),
                    )
                    out = out.append_column(name, pa.array(v, mask=np.isnan(v)))
                elif a == "max":
                    v = np.fmax(
                        _np(out[f"{pfx}_max"]),
                        merged[f"__premax_{pfx}"].to_numpy(dtype=float),
                    )
                    out = out.append_column(name, pa.array(v, mask=np.isnan(v)))
                elif a == "last":
                    lf = _np(out[f"{pfx}_last"])
                    pre = merged[f"__prelast_{pfx}"].to_numpy(dtype=float)
                    v = np.where(np.isnan(lf), pre, lf)
                    out = out.append_column(name, pa.array(v, mask=np.isnan(v)))
            drop_internal += [f"{pfx}_{p}" for p in sorted(prims - {"sumsq"})]
            if sq is not None:
                drop_internal.append(f"{pfx}sq_sum")
        for rn in rownum_specs:
            lrn = _np(out["__lrn"]).astype(np.int64)
            offrows = merged["__offrows"].fillna(0).to_numpy(dtype=np.int64)
            out = out.append_column(rn.name, pa.array(lrn + offrows))
        for s in ewma_specs:
            z = _np(out[f"__z_{s.out}"])
            lrn = _np(out["__lrn"]).astype(np.int64)
            yin = merged[f"__yin_{s.out}"].fillna(0.0).to_numpy(dtype=float)
            y = z + np.power(1.0 - s.alpha, lrn.astype(np.float64)) * yin
            out = out.append_column(s.out, pa.array(y))
            drop_internal.append(f"__z_{s.out}")
        if need_lrn:
            drop_internal.append("__lrn")
        drop_internal += [c for c in sq_cols.values() if c in out.column_names]
        out = out.drop_columns([c for c in dict.fromkeys(drop_internal)])
        return out.drop_columns([SALT_COL])

    return featured.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def _check_rolling_time_bound(
    t: pa.Table, starts: np.ndarray, rt_specs, ts_col: str, ovl: int
) -> None:
    """Runtime guard for the caller-owned RollingTime rate bound: a REAL
    row in a non-first chunk whose time window reaches the chunk's FIRST
    available row has >= overlap_rows + 1 rows inside one delta window —
    the declared bound is violated and the window WOULD have been silently
    truncated (history beyond the shipped overlap is not visible here).
    Raise loudly instead.

    Exact for dense per-entity ordinals (the transcript contract: non-first
    chunks have full-sized predecessors); with sparse ordinals a predecessor
    smaller than overlap_rows ships entirely — detected via the group's
    shipped-overlap count — so only genuinely unverifiable windows raise.
    """
    from feast_ray.stages.windows import rolling_time_bounds

    ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    ovl_mask = t[OVL_COL].combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
    salt = t[SALT_COL].combine_chunks().to_numpy(zero_copy_only=False)
    gstart = starts_to_row_gstart(starts)
    # groups whose shipped overlap count is below the configured overlap had
    # a small predecessor shipped ENTIRELY -> windows there are exact
    n_ovl = np.add.reduceat(ovl_mask.astype(np.int64), starts[:-1])
    full_ovl_of_row = n_ovl[np.searchsorted(starts[:-1], gstart, side="right") - 1] >= ovl
    for spec in rt_specs:
        ws, _ = rolling_time_bounds(ts, starts, spec.delta_us)
        viol = (ws == gstart) & ~ovl_mask & (salt > 0) & full_ovl_of_row
        if viol.any():
            i = int(np.flatnonzero(viol)[0])
            raise ValueError(
                f"RollingTime(delta_us={spec.delta_us}) rate bound violated "
                f"under salting: a window holds more than overlap_rows={ovl} "
                f"rows (first at ts={ts[i]}); raise time_rows_bound / "
                "overlap_rows or chunk_rows — the result would otherwise be "
                "silently truncated at chunk boundaries"
            )


def _append_session_cols(tbl: pa.Table, session_specs, *, empty: bool) -> pa.Table:
    for spec in session_specs:
        tbl = tbl.append_column(f"__start_{spec.name}", pa.array([], type=pa.int64()))
        tbl = tbl.append_column(f"__local_{spec.name}", pa.array([], type=pa.int64()))
    return tbl


def salted_kernel_map(
    ds,
    key: str,
    kernel,
    *,
    lookback_rows: int,
    ordinal_col: str = "turn_idx",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    chunk_rows: int,
    num_buckets: Optional[int] = None,
):
    """Run an arbitrary per-entity window KERNEL under hot-entity salting.

    Contract: ``kernel(table, starts)`` appends columns and each row's
    value depends on at most ``lookback_rows`` PRECEDING rows of its entity
    (no leads, no unbounded state).  Rows are chunked by
    ``ordinal_col // chunk_rows``; the last ``lookback_rows`` rows of chunk
    c ride along into chunk c+1 flagged ``__ovl`` and are dropped on emit,
    so every real row sees its exact trailing history — identical results
    to the unsalted ``grouped_map(ds, [key], kernel)``."""
    if lookback_rows >= chunk_rows:
        raise ValueError(
            f"lookback_rows ({lookback_rows}) must be < chunk_rows ({chunk_rows})"
        )

    def wrapped(t: pa.Table, starts: np.ndarray) -> pa.Table:
        out = kernel(t, starts)
        if out.num_rows:
            ovl = out[OVL_COL].combine_chunks().to_numpy(zero_copy_only=False)
            out = out.filter(pa.array(ovl == 0))
        return out.drop_columns(
            [c for c in (SALT_COL, OVL_COL) if c in out.column_names]
        )

    tagged = ds.map_batches(
        lambda t: _salt_and_overlap(t, ordinal_col, chunk_rows, lookback_rows, False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_map(
        tagged, [key, SALT_COL], wrapped,
        sort_keys=list(order_cols), num_buckets=num_buckets,
    )


def salted_rolling_corr(
    ds,
    key: str,
    x_col: str,
    y_col: str,
    *,
    k: int,
    chunk_rows: int,
    ordinal_col: str = "turn_idx",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    out_col: str = "rolling_corr",
    num_buckets: Optional[int] = None,
):
    """Hot-entity-salted twin of ``stats.add_group_rolling_corr`` — same
    kernel, exact (k-row windows look back k-1 rows <= overlap)."""
    from feast_ray.stages.stats import rolling_corr_kernel

    return salted_kernel_map(
        ds, key, rolling_corr_kernel(x_col, y_col, k, out_col),
        lookback_rows=k - 1, ordinal_col=ordinal_col, order_cols=order_cols,
        chunk_rows=chunk_rows, num_buckets=num_buckets,
    )


def salted_rolling_zscore(
    ds,
    key: str,
    int_col: str,
    *,
    k: int,
    chunk_rows: int,
    ordinal_col: str = "turn_idx",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    out_col: str = "rolling_z",
    num_buckets: Optional[int] = None,
):
    """Hot-entity-salted twin of ``stats.add_group_rolling_zscore``."""
    from feast_ray.stages.stats import rolling_zscore_kernel

    return salted_kernel_map(
        ds, key, rolling_zscore_kernel(int_col, k, out_col),
        lookback_rows=k - 1, ordinal_col=ordinal_col, order_cols=order_cols,
        chunk_rows=chunk_rows, num_buckets=num_buckets,
    )
