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
- ``Expanding(col, aggs ⊆ {count, sum, min, max})`` (running extrema /
  cumulative counters): chunk-LOCAL expanding over real rows only, then the
  same tiny second phase carries per-entity prefix state across chunks
  (cumsum offsets for count/sum, exclusive cummin/cummax for min/max).
  Exact for integer-valued columns; float sums reproduce the unsalted
  result up to reassociation at chunk boundaries.  Expanding mean/std/last
  (and Ewma/RowNumber) stay rejected.

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
    _EXP_OK = {"count", "sum", "min", "max"}
    expanding_specs = [
        s for s in specs
        if isinstance(s, Expanding) and set(s.aggs) <= _EXP_OK
    ]
    bad = [
        s for s in specs
        if isinstance(s, (Ewma, RowNumber))
        or (isinstance(s, Expanding) and not set(s.aggs) <= _EXP_OK)
    ]
    if bad:
        raise ValueError(
            f"{[type(s).__name__ for s in bad]} need full entity history and "
            "cannot run under bounded-overlap salting (Expanding is salted "
            "only for the prefix-combinable aggs count/sum/min/max — the "
            "running-extrema / cumulative family); compute the rest on the "
            "unsalted path (their state is O(1) per entity, not O(rows))"
        )
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
        s for s in specs if not isinstance(s, (Sessionize, Expanding))
    ]
    want_lead = any(isinstance(s, Lead) for s in specs)
    rolling_time_specs = [s for s in specs if isinstance(s, RollingTime)]
    wk = make_window_kernel(plain_specs, ts_col) if plain_specs else None
    # chunk-local expanding runs over REAL rows only (overlap copies would
    # double-count prefix state); "sum" needs the running valid-count for
    # its null mask, so count is always computed internally
    exp_internal = [
        Expanding(
            e.col,
            aggs=tuple(
                list(e.aggs) + (["count"] if "count" not in e.aggs else [])
            ),
            prefix=e.prefix,
        )
        for e in expanding_specs
    ]
    wk_exp = make_window_kernel(exp_internal, ts_col) if exp_internal else None

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if rolling_time_specs and t.num_rows:
            _check_rolling_time_bound(t, starts, rolling_time_specs, ts_col, ovl)
        out = wk(t, starts) if wk is not None else t
        n = out.num_rows
        if n == 0:
            out = _append_session_cols(out, session_specs, empty=True)
            if exp_internal:
                out = _empty_with_spec_columns(out, exp_internal)
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
        if exp_internal:
            if out.num_rows:
                change = np.flatnonzero(kept_group[1:] != kept_group[:-1]) + 1
                starts_kept = np.concatenate(
                    ([0], change, [out.num_rows])
                ).astype(np.int64)
                out = wk_exp(out, starts_kept)
            else:
                out = _empty_with_spec_columns(out, exp_internal)
        if session_specs and out.num_rows:
            m = out.num_rows
            first_of_group = np.ones(m, dtype=bool)
            first_of_group[1:] = kept_group[1:] != kept_group[:-1]
            for spec in session_specs:
                sf = out[f"__start_{spec.name}"].combine_chunks().to_numpy(zero_copy_only=False)
                cs = np.cumsum(sf)
                # starts seen before this row's chunk (cs is bucket-global)
                base = np.maximum.accumulate(np.where(first_of_group, cs - sf, 0))
                out = out.append_column(f"__local_{spec.name}", pa.array(cs - base - 1))
        return out.drop_columns([OVL_COL])

    tagged = ds.map_batches(
        lambda t: _salt_and_overlap(t, ordinal_col, chunk_rows, ovl, want_lead),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    featured = grouped_map(
        tagged,
        [key, SALT_COL],
        kernel,
        sort_keys=list(order_cols),
        num_buckets=num_buckets,
    )
    if not session_specs and not expanding_specs:
        return featured.drop_columns([SALT_COL])

    # Phase 2: exact session-id repair — prefix-sum per-entity chunk start
    # counts (tiny aggregate), then add offsets.  The materialize() is the
    # phase checkpoint (== the parquet sink in the backfill path).
    import ray

    featured = featured.materialize()

    # per-column chunk aggregates the expanding repair needs
    exp_needs: dict[str, set] = {}
    for e in expanding_specs:
        need = exp_needs.setdefault(e.col, set())
        need.update(e.aggs)
        if "sum" in e.aggs or "count" in e.aggs:
            need.add("count")

    agg_ops: dict[str, str] = {}
    for spec in session_specs:
        agg_ops[f"__start_{spec.name}"] = "sum"
    for col, need in exp_needs.items():
        if "count" in need:
            agg_ops[f"__ecnt_{col}"] = "sum"
        if "sum" in need:
            agg_ops[f"__esum_{col}"] = "sum"
        if "min" in need:
            agg_ops[f"__emin_{col}"] = "min"
        if "max" in need:
            agg_ops[f"__emax_{col}"] = "max"

    def partial_counts(t: pa.Table) -> pa.Table:
        cols = {key: t[key], SALT_COL: t[SALT_COL]}
        for spec in session_specs:
            cols[f"__start_{spec.name}"] = t[f"__start_{spec.name}"]
        pdf = pa.table(cols).to_pandas()
        for col, need in exp_needs.items():
            ser = t[col].to_pandas()
            if "count" in need:
                pdf[f"__ecnt_{col}"] = ser.notna().astype("int64")
            if "sum" in need:
                pdf[f"__esum_{col}"] = ser.astype("float64").fillna(0.0)
            if "min" in need:
                pdf[f"__emin_{col}"] = ser.astype("float64")
            if "max" in need:
                pdf[f"__emax_{col}"] = ser.astype("float64")
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
    for col, need in exp_needs.items():
        g = meta.groupby(key)
        if "count" in need:
            c = f"__ecnt_{col}"
            off_df[f"__offcnt_{col}"] = (g[c].cumsum() - meta[c]).astype(np.int64)
        if "sum" in need:
            c = f"__esum_{col}"
            off_df[f"__offsum_{col}"] = g[c].cumsum() - meta[c]
        # An all-null chunk yields a NaN chunk aggregate; pandas cummin/cummax
        # would emit NaN AT that chunk, so shift(1) hands the NEXT chunk a NaN
        # prefix and the earlier running extremum is lost.  Fill with +/-inf so
        # the running extremum carries through null chunks, then map the
        # sentinel (and the per-entity first chunk) back to NaN.
        if "min" in need:
            filled = meta[f"__emin_{col}"].fillna(np.inf)
            pre = filled.groupby(meta[key]).cummin().shift(1).to_numpy(dtype=float)
            pre[first_of_entity] = np.nan
            pre[np.isposinf(pre)] = np.nan
            off_df[f"__premin_{col}"] = pre
        if "max" in need:
            filled = meta[f"__emax_{col}"].fillna(-np.inf)
            pre = filled.groupby(meta[key]).cummax().shift(1).to_numpy(dtype=float)
            pre[first_of_entity] = np.nan
            pre[np.isneginf(pre)] = np.nan
            off_df[f"__premax_{col}"] = pre
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
        for e in expanding_specs:
            cnt_name = e.out("count")
            local_cnt = _np(out[cnt_name]).astype(np.int64)
            offcnt = (
                merged[f"__offcnt_{e.col}"].fillna(0).to_numpy(dtype=np.int64)
                if f"__offcnt_{e.col}" in merged
                else np.zeros(out.num_rows, np.int64)
            )
            total_cnt = local_cnt + offcnt
            for a in e.aggs:
                name = e.out(a)
                i = out.column_names.index(name)
                if a == "count":
                    out = out.set_column(i, name, pa.array(total_cnt))
                elif a == "sum":
                    lf = _np(out[name])
                    offsum = merged[f"__offsum_{e.col}"].fillna(0.0).to_numpy(dtype=float)
                    v = np.where(np.isnan(lf), 0.0, lf) + offsum
                    out = out.set_column(i, name, pa.array(v, mask=total_cnt == 0))
                elif a == "min":
                    v = np.fmin(_np(out[name]), merged[f"__premin_{e.col}"].to_numpy(dtype=float))
                    out = out.set_column(i, name, pa.array(v, mask=np.isnan(v)))
                elif a == "max":
                    v = np.fmax(_np(out[name]), merged[f"__premax_{e.col}"].to_numpy(dtype=float))
                    out = out.set_column(i, name, pa.array(v, mask=np.isnan(v)))
            if "count" not in e.aggs:
                out = out.drop_columns([cnt_name])
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
