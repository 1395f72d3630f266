"""Windowed per-entity feature kernels: lag/lead, rolling aggregates,
sessionization — computed for ALL requested features in ONE shuffle.

Semantics (pinned; see tests/test_windows.py):

- Ordering: rows of an entity are processed sorted by ``order_cols`` (e.g.
  ``(ts, turn_idx)`` or ``(ts, event_id)``) — the "stable turn ordering"
  invariant (BASELINE.json:15).  Ties beyond the order columns must not exist
  (callers include a unique tie-break column).
- ``Lag(col, k)`` / ``Lead(col, k)``: value k rows before/after within the
  entity; null at edges.  Equivalent SQL: ``LAG(col, k) OVER (PARTITION BY
  key ORDER BY ...)``.
- ``RollingRows(col, k, aggs)``: window = last k rows ending at the current
  row (``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``), clamped to the
  entity start.  ``count`` counts non-null values (SQL ``COUNT(col)``),
  ``mean`` is null when count==0, ``last`` is the most recent non-null value
  in the window.
- ``RollingTime(col, delta_us, aggs)``: window = rows with
  ``ts in [t - delta, t]`` **including peers of t that sort after the
  current row** — matching SQL ``RANGE BETWEEN delta PRECEDING AND CURRENT
  ROW`` peer semantics.
- ``Sessionize(gap_us)``: a new session starts when ``ts - prev_ts > gap``
  (strictly greater — a gap exactly equal to the threshold stays in the
  session); ``session_id`` is 0-based per entity.

The reference declares these aggregations but delegates execution to a
stream engine (upstream ``sdk/python/feast/aggregation.py::Aggregation``,
``stream_feature_view.py::StreamFeatureView``); lag/lead and sessionization
are required by BASELINE.json:6/14 (SURVEY §2.5 A1–A4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import (
    grouped_map,
    starts_to_group_index,
    starts_to_row_gstart,
)

# ---------------------------------------------------------------------------
# Window specs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Lag:
    col: str
    k: int = 1
    name: Optional[str] = None

    @property
    def out(self) -> str:
        return self.name or f"lag{self.k}_{self.col}"


@dataclass(frozen=True)
class Lead:
    col: str
    k: int = 1
    name: Optional[str] = None

    @property
    def out(self) -> str:
        return self.name or f"lead{self.k}_{self.col}"


@dataclass(frozen=True)
class RollingRows:
    """Aggregates over the trailing k-row window (incl. current row)."""

    col: str
    k: int
    aggs: tuple[str, ...] = ("count", "sum", "mean")
    prefix: Optional[str] = None

    def out(self, agg: str) -> str:
        p = self.prefix or f"{self.col}_r{self.k}"
        return f"{p}_{agg}"


@dataclass(frozen=True)
class RollingTime:
    """Aggregates over the trailing time window [t - delta, t] (peers incl.)."""

    col: str
    delta_us: int
    aggs: tuple[str, ...] = ("count", "sum", "mean")
    prefix: Optional[str] = None

    def out(self, agg: str) -> str:
        p = self.prefix or f"{self.col}_t{self.delta_us}"
        return f"{p}_{agg}"


@dataclass(frozen=True)
class Sessionize:
    gap_us: int
    name: str = "session_id"


@dataclass(frozen=True)
class Expanding:
    """Cumulative aggregates from the entity's first row to the current row
    (SQL ``ROWS UNBOUNDED PRECEDING``)."""

    col: str
    aggs: tuple[str, ...] = ("count", "sum")
    prefix: Optional[str] = None

    def out(self, agg: str) -> str:
        return f"{self.prefix or f'{self.col}_cum'}_{agg}"


@dataclass(frozen=True)
class Ewma:
    """Exponentially weighted moving average in row order (adjust=False):
    y_0 = x_0; y_i = alpha*x_i + (1-alpha)*y_{i-1}.  NULL values are
    rejected (they would poison the entity's tail).  Pick a dyadic alpha
    for bit-exact SQL recursive-CTE twins."""

    col: str
    alpha: float
    name: Optional[str] = None

    @property
    def out(self) -> str:
        return self.name or f"ewma_{self.col}"


@dataclass(frozen=True)
class RowNumber:
    """1-based ordinal within the entity under the sort order."""

    name: str = "row_number"


WindowSpec = object  # union of the above


# ---------------------------------------------------------------------------
# Pure kernels (numpy; unit-testable without Ray)
# ---------------------------------------------------------------------------


def _col_array(tbl: pa.Table, name: str) -> pa.Array:
    col = tbl[name]
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _numeric_np(tbl: pa.Table, name: str) -> np.ndarray:
    """Column as float64 numpy with NaN for nulls."""
    arr = _col_array(tbl, name)
    return arr.cast(pa.float64()).to_numpy(zero_copy_only=False)


def _ts_np(tbl: pa.Table, name: str) -> np.ndarray:
    arr = _col_array(tbl, name)
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def shift_indices(n: int, gstart: np.ndarray, gend: np.ndarray, k: int) -> pa.Array:
    """Take-indices implementing lag (k>0) / lead (k<0) with group edges null."""
    ar = np.arange(n, dtype=np.int64)
    idx = ar - k
    invalid = (idx < gstart) | (idx >= gend)
    return pa.array(idx, type=pa.int64(), mask=invalid)


def rolling_rows_bounds(n: int, gstart: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    ar = np.arange(n, dtype=np.int64)
    wstart = np.maximum(ar - (k - 1), gstart)
    wend = ar + 1
    return wstart, wend


def rolling_time_bounds(
    ts: np.ndarray, starts: np.ndarray, delta_us: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row [wstart, wend) covering ts in [t - delta, t], peers included.

    Vectorized across ALL groups in one pass: per-group timestamps are
    rebased to 0 and shifted onto disjoint key ranges separated by more
    than ``delta`` — a single global ``searchsorted`` then cannot cross a
    group boundary.  Falls back to a per-group loop only if the combined
    key space would overflow int64 (pathological multi-millennium spans)."""
    n = len(ts)
    wstart = np.empty(n, dtype=np.int64)
    wend = np.empty(n, dtype=np.int64)
    if n == 0:
        return wstart, wend
    sizes = np.diff(starts)
    tmin = ts[starts[:-1]]
    ranges = ts[starts[1:] - 1] - tmin  # per-group span (ts sorted asc)
    span_est = float(ranges.astype(np.float64).sum()) + (float(delta_us) + 2.0) * len(sizes)
    if span_est < 2**62:
        rel = ts - np.repeat(tmin, sizes)
        offs = np.concatenate(([0], np.cumsum(ranges + delta_us + 2)))[:-1]
        key = rel + np.repeat(offs, sizes)
        wstart[:] = np.searchsorted(key, key - delta_us, side="left")
        wend[:] = np.searchsorted(key, key, side="right")
        return wstart, wend
    for g in range(len(starts) - 1):
        lo, hi = starts[g], starts[g + 1]
        seg = ts[lo:hi]
        wstart[lo:hi] = lo + np.searchsorted(seg, seg - delta_us, side="left")
        wend[lo:hi] = lo + np.searchsorted(seg, seg, side="right")
    return wstart, wend


def rolling_aggs(
    v: np.ndarray,
    wstart: np.ndarray,
    wend: np.ndarray,
    aggs: Sequence[str],
    k_rows: Optional[int] = None,
) -> dict[str, pa.Array]:
    """Windowed count/sum/mean/std/last(min/max for row windows) via prefix sums."""
    valid = ~np.isnan(v)
    v0 = np.where(valid, v, 0.0)
    cs = np.concatenate(([0.0], np.cumsum(v0)))
    cc = np.concatenate(([0], np.cumsum(valid)))
    c = cc[wend] - cc[wstart]
    s = cs[wend] - cs[wstart]
    out: dict[str, pa.Array] = {}
    none = c == 0
    for a in aggs:
        if a == "count":
            out[a] = pa.array(c.astype(np.int64))
        elif a == "sum":
            out[a] = pa.array(s, mask=none)
        elif a == "mean":
            with np.errstate(invalid="ignore", divide="ignore"):
                m = s / c
            out[a] = pa.array(m, mask=none)
        elif a == "std":  # sample stddev, SQL STDDEV_SAMP
            ss = np.concatenate(([0.0], np.cumsum(np.where(valid, v * v, 0.0))))
            q = ss[wend] - ss[wstart]
            with np.errstate(invalid="ignore", divide="ignore"):
                var = np.maximum(q - s * s / np.maximum(c, 1), 0.0) / np.maximum(c - 1, 1)
            out[a] = pa.array(np.sqrt(var), mask=c < 2)
        elif a == "last":
            ar = np.arange(len(v), dtype=np.int64)
            lastvalid = np.maximum.accumulate(np.where(valid, ar, -1))
            j = lastvalid[wend - 1]
            miss = j < wstart
            out[a] = pa.array(v[np.maximum(j, 0)], mask=miss)
        elif a in ("min", "max"):
            out[a] = _range_minmax(v, valid, wstart, wend, a)
        elif a == "median" or (
            len(a) in (2, 3) and a[0] == "p" and a[1:].isdigit()
        ):
            # discrete quantile (SQL quantile_disc): the element at 0-based
            # sorted index ceil(q*n_valid)-1 — an EXISTING value, so no
            # interpolation arithmetic and the SQL twin is bit-exact.
            # ROWS windows only: the sorted-window view is O(n x k); a
            # RANGE variant needs a different structure (not needed by the
            # reference's aggregate surface).
            if k_rows is None:
                raise ValueError(
                    f"discrete quantile {a!r} requires a ROWS window "
                    "(bounded k); RANGE/expanding windows are unsupported"
                )
            q = 0.5 if a == "median" else int(a[1:]) / 100.0
            if not 0.0 < q <= 1.0:
                raise ValueError(f"quantile {a!r} outside (0, 1]")
            n = len(v)
            k = int(k_rows)
            vp = np.concatenate((np.full(k - 1, np.nan), np.where(valid, v, np.nan)))
            sw = np.lib.stride_tricks.sliding_window_view(vp, k)
            # blank positions before the entity's first row (window clipped
            # at the group edge): window slot j maps to global row i-k+1+j
            lead = wstart - (np.arange(n, dtype=np.int64) - (k - 1))
            w = np.where(
                np.arange(k, dtype=np.int64)[None, :] < lead[:, None], np.nan, sw
            )
            ws_sorted = np.sort(w, axis=1)  # NaN sorts last
            idx = np.maximum(np.ceil(q * c).astype(np.int64) - 1, 0)
            res = ws_sorted[np.arange(n), idx]
            out[a] = pa.array(np.where(none, 0.0, res), mask=none)
        else:
            raise ValueError(f"unknown rolling agg {a!r}")
    return out


def _range_minmax(
    v: np.ndarray, valid: np.ndarray, wstart: np.ndarray, wend: np.ndarray, which: str
) -> pa.Array:
    """min/max over arbitrary [wstart, wend) windows via a sparse table
    (vectorized range-extrema: O(n log W) build for max window length W,
    two lookups per row).  Covers rows windows, time windows (matching SQL
    ``RANGE ... PRECEDING`` incl. peers), and expanding windows uniformly —
    upstream Feast declares min/max over ``time_window`` in
    ``aggregation.py::Aggregation``."""
    n = len(v)
    fill = np.inf if which == "min" else -np.inf
    vv = np.where(valid, v, fill)
    reduce2 = np.minimum if which == "min" else np.maximum
    lens = wend - wstart  # >= 1: every window contains the current row
    maxlen = int(lens.max()) if n else 0
    # level tables: sp[j][i] = extremum of vv[i : i + 2^j]
    sp = [vv]
    j = 1
    while (1 << j) <= maxlen:
        half = 1 << (j - 1)
        prev = sp[-1]
        m = n - (1 << j) + 1
        sp.append(reduce2(prev[:m], prev[half : half + m]))
        j += 1
    lev = np.zeros(n, dtype=np.int64)
    if n:
        # floor(log2(len)) via bit_length: levels are few, assign per level
        lev = (np.floor(np.log2(np.maximum(lens, 1)))).astype(np.int64)
        lev = np.minimum(lev, len(sp) - 1)
    res = np.full(n, fill)
    for jj in range(len(sp)):
        m = lev == jj
        if not m.any():
            continue
        w = 1 << jj
        a = wstart[m]
        b = wend[m] - w
        res[m] = reduce2(sp[jj][a], sp[jj][b])
    miss = ~np.isfinite(res)
    return pa.array(np.where(miss, 0.0, res), mask=miss)


def sessionize_ids(ts: np.ndarray, starts: np.ndarray, gap_us: int) -> np.ndarray:
    """0-based session id per entity; new session when ts - prev_ts > gap."""
    n = len(ts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    gstart = starts_to_row_gstart(starts)
    ar = np.arange(n, dtype=np.int64)
    new = np.ones(n, dtype=np.int64)
    intra = ar > gstart  # not first row of its entity
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    gaps[1:] = ts[1:] - ts[:-1]
    new[1:] = np.where(intra[1:] & (gaps[1:] <= gap_us), 0, 1)
    cum = np.cumsum(new)
    return cum - cum[gstart]  # 0-based within entity


def ewma_walk(x: np.ndarray, starts: np.ndarray, alpha: float) -> np.ndarray:
    """Rank-walk EWMA across ALL groups at once: step r updates row r of
    every group (two multiplies + add over shrinking index arrays), so
    Python iterations = max rows per group.  Fixed ``alpha*x +
    (1-alpha)*y_prev`` float schedule (SQL-reproducible for dyadic alpha)."""
    a, b = float(alpha), 1.0 - float(alpha)
    sizes = np.diff(starts)
    out = np.empty_like(x, dtype=np.float64)
    heads = starts[:-1][sizes > 0]
    out[heads] = x[heads]
    live, live_sizes = starts[:-1], sizes
    for r in range(1, int(sizes.max(initial=0))):
        m = live_sizes > r
        live, live_sizes = live[m], live_sizes[m]
        idx = live + r
        out[idx] = a * x[idx] + b * out[idx - 1]
    return out


# ---------------------------------------------------------------------------
# Kernel assembly + Dataset wrapper
# ---------------------------------------------------------------------------


def make_window_kernel(specs: Sequence[WindowSpec], ts_col: str):
    """Build a grouped-map kernel computing every spec in one pass."""

    def kernel(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return _empty_with_spec_columns(tbl, specs)
        gstart = starts_to_row_gstart(starts)
        sizes = np.diff(starts)
        gend = np.repeat(starts[1:], sizes)
        ts = None
        out = tbl
        for spec in specs:
            if isinstance(spec, Lag):
                idx = shift_indices(n, gstart, gend, spec.k)
                out = out.append_column(spec.out, pc.take(_col_array(tbl, spec.col), idx))
            elif isinstance(spec, Lead):
                idx = shift_indices(n, gstart, gend, -spec.k)
                out = out.append_column(spec.out, pc.take(_col_array(tbl, spec.col), idx))
            elif isinstance(spec, RollingRows):
                v = _numeric_np(tbl, spec.col)
                ws, we = rolling_rows_bounds(n, gstart, spec.k)
                for a, arr in rolling_aggs(v, ws, we, spec.aggs, k_rows=spec.k).items():
                    out = out.append_column(spec.out(a), arr)
            elif isinstance(spec, RollingTime):
                if ts is None:
                    ts = _ts_np(tbl, ts_col)
                v = _numeric_np(tbl, spec.col)
                ws, we = rolling_time_bounds(ts, starts, spec.delta_us)
                for a, arr in rolling_aggs(v, ws, we, spec.aggs).items():
                    out = out.append_column(spec.out(a), arr)
            elif isinstance(spec, Sessionize):
                if ts is None:
                    ts = _ts_np(tbl, ts_col)
                sid = sessionize_ids(ts, starts, spec.gap_us)
                out = out.append_column(spec.name, pa.array(sid))
            elif isinstance(spec, Expanding):
                v = _numeric_np(tbl, spec.col)
                ws = gstart
                we = np.arange(n, dtype=np.int64) + 1
                for a, arr in rolling_aggs(v, ws, we, spec.aggs).items():
                    out = out.append_column(spec.out(a), arr)
            elif isinstance(spec, Ewma):
                if not 0.0 < spec.alpha <= 1.0:
                    raise ValueError("Ewma.alpha must be in (0, 1]")
                col = _col_array(tbl, spec.col)
                if col.null_count:
                    raise ValueError(
                        f"{spec.col} has nulls; ewma over nulls is undefined"
                    )
                x = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
                out = out.append_column(spec.out, pa.array(ewma_walk(x, starts, spec.alpha)))
            elif isinstance(spec, RowNumber):
                rn = np.arange(n, dtype=np.int64) - gstart + 1
                out = out.append_column(spec.name, pa.array(rn))
            else:
                raise TypeError(f"unknown window spec {spec!r}")
        return out

    return kernel


def _empty_with_spec_columns(tbl: pa.Table, specs: Sequence[WindowSpec]) -> pa.Table:
    out = tbl
    for spec in specs:
        if isinstance(spec, (Lag, Lead)):
            out = out.append_column(
                spec.out, pa.array([], type=tbl.schema.field(spec.col).type)
            )
        elif isinstance(spec, (RollingRows, RollingTime, Expanding)):
            for a in spec.aggs:
                t = pa.int64() if a == "count" else pa.float64()
                out = out.append_column(spec.out(a), pa.array([], type=t))
        elif isinstance(spec, Ewma):
            out = out.append_column(spec.out, pa.array([], type=pa.float64()))
        elif isinstance(spec, (Sessionize, RowNumber)):
            out = out.append_column(spec.name, pa.array([], type=pa.int64()))
    return out


def add_window_features(
    ds,
    *,
    key: str | Sequence[str],
    ts_col: str,
    order_cols: Sequence[str],
    specs: Sequence[WindowSpec],
    num_buckets: Optional[int] = None,
):
    """All window features in one bucketed shuffle (SURVEY §7.3: one logical
    shuffle shared by every per-entity operator)."""
    keys = [key] if isinstance(key, str) else list(key)
    return grouped_map(
        ds,
        keys,
        make_window_kernel(specs, ts_col),
        sort_keys=list(order_cols),
        num_buckets=num_buckets,
    )


@dataclass(frozen=True)
class Aggregation:
    """Declarative aggregation spec — the executable mirror of upstream
    Feast's ``sdk/python/feast/aggregation.py::Aggregation(column,
    function, time_window, slide_interval)`` (SURVEY §2.5 A1; Feast core
    only DECLARES these and delegates execution to a stream engine).

    ``function``: count / sum / min / max / avg|mean / stddev|std / last.
    ``time_window_us`` None declares a lifetime (expanding) aggregate.
    ``slide_interval_us`` equal to the window (or None) keeps the per-event
    trailing-window reading; a smaller slide declares a GRID of windows —
    that shape changes the output's row identity, so it is routed to
    ``hopping_window_agg`` explicitly rather than silently compiled here.
    """

    column: str
    function: str
    time_window_us: Optional[int] = None
    slide_interval_us: Optional[int] = None
    name: Optional[str] = None

    @property
    def out(self) -> str:
        if self.name:
            return self.name
        if self.time_window_us is None:
            return f"{self.column}_{self.function}"
        return f"{self.column}_{self.function}_{self.time_window_us // 1_000_000}s"


_AGG_FN_MAP = {
    "count": "count", "sum": "sum", "min": "min", "max": "max",
    "avg": "mean", "mean": "mean", "stddev": "std", "std": "std",
    "last": "last",
}


def compile_aggregations(
    aggs: Sequence[Aggregation],
) -> tuple[list[WindowSpec], dict[str, list[str]]]:
    """Compile declarative ``Aggregation`` specs to this engine's window
    specs: aggregates sharing (column, window) merge into ONE
    RollingTime/Expanding spec (one prefix-sum pass each inside the single
    grouped shuffle).  Returns ``(specs, rename)`` where ``rename`` maps
    each spec's internal output name to the (possibly several) declared
    feature names — two Aggregations with the same (column, window,
    function) but different declared names share one physical pass and the
    column is emitted once per declared name.  Two Aggregations declaring
    the SAME output name is ambiguous and raises."""
    merged: dict[tuple[str, Optional[int]], list[Aggregation]] = {}
    for a in aggs:
        fn = _AGG_FN_MAP.get(a.function.lower())
        if fn is None:
            raise ValueError(
                f"Aggregation function {a.function!r} is not one of "
                f"{sorted(set(_AGG_FN_MAP))}"
            )
        if (
            a.slide_interval_us is not None
            and a.slide_interval_us != a.time_window_us
        ):
            raise ValueError(
                f"Aggregation({a.column!r}, {a.function!r}): slide_interval "
                "< time_window declares a window GRID (one row per window, "
                "not per event) — use stages.windows.hopping_window_agg"
            )
        merged.setdefault((a.column, a.time_window_us), []).append(a)

    specs: list[WindowSpec] = []
    rename: dict[str, list[str]] = {}
    declared: set[str] = set()
    for (col, win), group in merged.items():
        fns: list[str] = []
        for a in group:
            fn = _AGG_FN_MAP[a.function.lower()]
            if fn not in fns:
                fns.append(fn)
        prefix = f"__agg_{col}_{'life' if win is None else win}"
        if win is None:
            spec: WindowSpec = Expanding(col, aggs=tuple(fns), prefix=prefix)
        else:
            spec = RollingTime(col, win, aggs=tuple(fns), prefix=prefix)
        specs.append(spec)
        for a in group:
            if a.out in declared:
                raise ValueError(
                    f"duplicate declared feature name {a.out!r} — two "
                    "Aggregations map to the same output column"
                )
            declared.add(a.out)
            rename.setdefault(
                f"{prefix}_{_AGG_FN_MAP[a.function.lower()]}", []
            ).append(a.out)
    return specs, rename


def add_declared_aggregations(
    ds,
    *,
    key: str | Sequence[str],
    ts_col: str,
    order_cols: Sequence[str],
    aggs: Sequence[Aggregation],
    num_buckets: Optional[int] = None,
):
    """Materialize declarative ``Aggregation`` features per entity: compile
    to window specs, run them all in the ONE grouped shuffle, rename to the
    declared feature names (rename runs as a zero-copy map stage —
    ``Dataset.rename_columns`` would probe the unknown post-exchange schema
    with a limit(1) execution)."""
    specs, rename = compile_aggregations(aggs)
    out = add_window_features(
        ds, key=key, ts_col=ts_col, order_cols=order_cols, specs=specs,
        num_buckets=num_buckets,
    )
    if not rename:
        return out

    def _rename(t: pa.Table) -> pa.Table:
        # one physical window column may back several declared features:
        # emit it once under each declared name (zero-copy column refs)
        names: list[str] = []
        arrays = []
        for c, arr in zip(t.column_names, t.columns):
            outs = rename.get(c)
            if outs is None:
                names.append(c)
                arrays.append(arr)
            else:
                for o in outs:
                    names.append(o)
                    arrays.append(arr)
        return pa.table(arrays, names=names)

    return out.map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)


def hopping_window_agg(
    ds,
    key: str | Sequence[str],
    ts_col: str,
    int_col: str,
    *,
    window_us: int,
    slide_us: int,
    out_prefix: str = "w",
):
    """Hopping (sliding-interval) window aggregate per entity: count and
    exact int64 sum of ``int_col`` for every window ``[start, start +
    window_us)`` with starts at multiples of ``slide_us`` — the executable
    form of the reference's declared ``Aggregation(time_window,
    slide_interval)`` (upstream ``aggregation.py::Aggregation`` +
    ``stream_feature_view.py``; Feast core only declares it and delegates
    to a stream engine).

    ``window_us`` must be a multiple of ``slide_us``; each event belongs to
    exactly ``window_us // slide_us`` windows, materialized by one
    vectorized k-fold expansion in the map stage (np.repeat/tile — the
    standard replicate-then-group plan), then ONE grouped exchange on
    (key, window_start) sums int64-exact.  Output rows are windows with at
    least one event; window_start is emitted in epoch microseconds.
    Shuffle volume is k x input rows of int64 columns — choose the
    window/slide ratio with that in mind.
    """
    if window_us <= 0 or slide_us <= 0 or window_us % slide_us != 0:
        raise ValueError("need window_us > 0, slide_us > 0, window_us % slide_us == 0")
    k = window_us // slide_us
    keys = [key] if isinstance(key, str) else list(key)

    from feast_ray.grouped import grouped_aggregate

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {kk: pa.array([], t[kk].type) for kk in keys}
        cols["wstart"] = pa.array([], pa.int64())
        cols["v"] = pa.array([], pa.int64())
        if n == 0:
            return pa.table(cols)
        us = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[int_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        # windows containing ts: starts slide*(floor(ts/slide) - k + 1 .. floor(ts/slide))
        base = us // slide_us
        starts = (
            np.repeat(base, k) - np.tile(np.arange(k - 1, -1, -1, dtype=np.int64), n)
        ) * slide_us
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        out = {kk: pc.take(t[kk].combine_chunks(), idx) for kk in keys}
        out["wstart"] = pa.array(starts)
        out["v"] = pa.array(np.repeat(v, k))
        return pa.table(out)

    expanded = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_aggregate(
        expanded,
        keys + ["wstart"],
        {f"{out_prefix}_count": ("count", None), f"{out_prefix}_sum": ("sum", "v")},
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {n_: t[n_] for n_ in t.column_names}
        cols[f"{out_prefix}_count"] = t[f"{out_prefix}_count"].cast(pa.int64())
        cols[f"{out_prefix}_sum"] = t[f"{out_prefix}_sum"].cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def densify_calendar(
    ds,
    key: str | Sequence[str],
    bucket_col: str,
    *,
    count_name: str = "n",
    num_buckets: Optional[int] = None,
):
    """Zero-filled regular time grid per entity: one output row for EVERY
    integer bucket (e.g. UTC day) in ``[min_bucket, max_bucket]`` of each
    key group, with the group's row count in that bucket (0 where the
    entity was silent) — the gap-filling / resample step that turns sparse
    event streams into the dense grids sequence models train on (SQL:
    generate_series per entity LEFT JOIN counts).

    One grouped exchange of (key, bucket) rows; the kernel detects
    per-bucket runs, expands each group's full range with one
    repeat/cumsum arange, and scatters the observed counts — no per-group
    Python.  Output rows = sum of spans: an entity active on day 1 and day
    10{,}000 emits 10k rows — bound the span upstream (filter a date
    window) when entities can be long-lived.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        key_cols = {k: t[k].combine_chunks() for k in keys}
        if n == 0:
            cols = {k: key_cols[k].slice(0, 0) for k in keys}
            cols[bucket_col] = pa.array([], pa.int64())
            cols[count_name] = pa.array([], pa.int64())
            return pa.table(cols)
        d = t[bucket_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_groups = len(starts) - 1
        firsts, lasts = starts[:-1], starts[1:] - 1
        dmin, dmax = d[firsts], d[lasts]  # sorted by (keys, bucket)
        span = dmax - dmin + 1
        total = int(span.sum())
        off = np.concatenate(([0], np.cumsum(span)[:-1]))
        g_out = np.repeat(np.arange(n_groups, dtype=np.int64), span)
        day_out = (
            np.arange(total, dtype=np.int64) - np.repeat(off, span) + np.repeat(dmin, span)
        )
        cnt_out = np.zeros(total, dtype=np.int64)
        # observed (group, bucket) runs -> scatter counts into the grid
        gidx = starts_to_group_index(starts)
        newrun = np.ones(n, dtype=bool)
        newrun[1:] = (d[1:] != d[:-1]) | (gidx[1:] != gidx[:-1])
        run_start = np.flatnonzero(newrun)
        run_len = np.diff(np.concatenate((run_start, [n])))
        rg = gidx[run_start]
        cnt_out[off[rg] + d[run_start] - dmin[rg]] = run_len
        take = pa.array(firsts[g_out])
        cols = {k: pc.take(key_cols[k], take) for k in keys}
        cols[bucket_col] = pa.array(day_out)
        cols[count_name] = pa.array(cnt_out)
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=[bucket_col], num_buckets=num_buckets)


def funnel_steps(
    ds,
    key: str | Sequence[str],
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    *,
    out_prefix: str = "t_step",
    converted_name: str = "converted",
    num_buckets: Optional[int] = None,
):
    """Ordered event-sequence funnel per entity: the earliest completion
    chain of ``steps`` (each next step STRICTLY later in time), one row
    per entity with ``{out_prefix}_i`` timestamps (NULL from the first
    unreached step) and a ``converted`` flag — the product-analytics
    funnel, SQL-expressible as nested ``MIN(ts) > previous`` joins.
    The greedy earliest chain is optimal: taking the earliest valid event
    at every step minimizes the bound on the next.

    One grouped exchange; step i resolves with ONE global searchsorted of
    every entity's current bound against the group-rebased packed
    timestamps of that step's events (same packing as the overlap join) —
    O(steps * n log n) per bucket, no per-entity Python.
    """
    keys = [key] if isinstance(key, str) else list(key)
    steps = list(steps)
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take = pa.array(firsts)
        n = t.num_rows
        n_groups = len(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take) for k in keys
        }
        ts_arr = t[ts_col].combine_chunks()
        ts_type = ts_arr.type
        out_type = (
            pa.timestamp("us", tz=ts_type.tz)
            if pa.types.is_timestamp(ts_type)
            else pa.int64()
        )
        us = _ts_us(ts_arr)
        tv = t[type_col].combine_chunks()
        if n == 0:
            for i in range(1, len(steps) + 1):
                cols[f"{out_prefix}_{i}"] = pa.array([], type=out_type)
            cols[converted_name] = pa.array([], type=pa.bool_())
            return pa.table(cols)
        gidx = starts_to_group_index(starts)
        lasts = starts[1:] - 1
        base = us[firsts]  # bucket sorted by (keys, ts): group min
        span = us[lasts] - base
        offset = int(span.max()) + 2
        if n_groups * offset >= 2**62:
            raise ValueError("timestamp spans too large for the packed key space")
        bound_us = base - 1  # "strictly after bound" starts before everything
        alive = np.ones(n_groups, dtype=bool)
        for i, step in enumerate(steps, start=1):
            mask = pc.equal(tv, step).fill_null(False).to_numpy(zero_copy_only=False)
            pos = np.flatnonzero(mask)
            if len(pos) == 0:
                alive = np.zeros(n_groups, dtype=bool)
                cols[f"{out_prefix}_{i}"] = pa.nulls(n_groups, type=out_type)
                for j in range(i + 1, len(steps) + 1):
                    cols[f"{out_prefix}_{j}"] = pa.nulls(n_groups, type=out_type)
                break
            sg, sus = gidx[pos], us[pos]
            packed = sg * offset + (sus - base[sg])
            s_end = np.searchsorted(sg, np.arange(n_groups), side="right")
            q = np.arange(n_groups) * offset + np.clip(
                bound_us - base, -1, offset - 1
            )
            idx = np.searchsorted(packed, q, side="right")
            safe = np.minimum(idx, len(pos) - 1)
            hit = alive & (idx < s_end) & (idx < len(pos)) & (
                sg[safe] == np.arange(n_groups)
            )
            step_ts = np.where(hit, sus[safe], 0)
            arr = pa.array(step_ts.astype(np.int64), type=pa.int64(), mask=~hit)
            if pa.types.is_timestamp(ts_type):
                arr = arr.cast(out_type)
            cols[f"{out_prefix}_{i}"] = arr
            bound_us = np.where(hit, step_ts, bound_us)
            alive = hit
        cols[converted_name] = pa.array(alive)
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=[ts_col], num_buckets=num_buckets)


def _ts_us(col: pa.Array) -> np.ndarray:
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.timestamp("us", tz=t.tz))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def rolling_distinct(
    ds,
    *,
    key,
    cat_col: str,
    window: int,
    order_cols,
    out_name: str = "n_distinct",
    num_buckets=None,
):
    """Sliding-window distinct count per entity: for every row, the number
    of distinct non-NULL ``cat_col`` values among the entity's last
    ``window`` rows (inclusive) in ``order_cols`` order — SQL
    ``COUNT(DISTINCT cat) OVER (PARTITION BY key ORDER BY ... ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)``, the behavioral-variety
    feature (how many different actions in the user's recent history).

    Distinct-in-window is not decomposable into running sums, so the
    kernel uses the offline interval-contribution identity instead of a
    per-window set: row ``j`` is counted by window ``i`` iff ``j`` lies in
    the window AND ``j``'s previous same-value occurrence does not — i.e.
    ``j`` contributes +1 to exactly the contiguous index range
    ``[max(j, prev_j + window), j + window - 1]``.  Scatter those
    intervals into a difference array and prefix-sum: O(n) per bucket
    after the exchange's sort, zero per-row Python, no hashing.  ONE
    grouped exchange.
    """
    from feast_ray.grouped import grouped_map, starts_to_row_gstart

    keys = [key] if isinstance(key, str) else list(key)
    if window < 1:
        raise ValueError("window must be >= 1")
    w = np.int64(window)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_name, pa.array([], pa.int64()))
        gstart = starts_to_row_gstart(starts)
        sizes = np.diff(starts)
        gend = np.repeat(starts[1:], sizes)  # exclusive group end per row
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        codes = (
            t[cat_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = np.arange(n, dtype=np.int64)
        # previous same-(group, code) occurrence via one lexsort
        order = np.lexsort((pos, codes, gidx))
        so_g, so_c, so_p = gidx[order], codes[order], pos[order]
        prev_sorted = np.full(n, -np.int64(1) - w, dtype=np.int64)  # "none" sentinel
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = (so_g[1:] == so_g[:-1]) & (so_c[1:] == so_c[:-1])
        prev_sorted[same] = so_p[np.flatnonzero(same) - 1]
        prev = np.empty(n, dtype=np.int64)
        prev[order] = prev_sorted
        # local coordinates
        j_loc = pos - gstart
        prev_loc = np.where(prev >= 0, prev - gstart, -w)  # none -> always outside
        lo = gstart + np.maximum(j_loc, prev_loc + w)
        hi = gstart + np.minimum(j_loc + w - 1, (gend - gstart) - 1)
        valid = (codes >= 0) & (lo <= hi)
        diff = (
            np.bincount(lo[valid], minlength=n + 1)
            - np.bincount(hi[valid] + 1, minlength=n + 1)
        )
        counts = np.cumsum(diff)[:n]
        return t.append_column(out_name, pa.array(counts.astype(np.int64)))

    return grouped_map(ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets)


def rolling_distinct_time(
    ds,
    *,
    key,
    cat_col: str,
    ts_col: str,
    delta_us: int,
    order_cols,
    out_name: str = "n_distinct",
    num_buckets=None,
):
    """Time-windowed distinct count per entity: distinct non-NULL
    ``cat_col`` values among the entity's rows with ``ts`` in
    ``[t - delta, t]`` — SQL ``COUNT(DISTINCT cat) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN delta PRECEDING AND CURRENT ROW)``, peers
    (equal-ts rows) included per RANGE semantics.

    Same interval-contribution identity as :func:`rolling_distinct`,
    generalized to the monotone per-row windows ``[ws_i, we_i)`` that
    :func:`rolling_time_bounds` yields: row ``j`` (first occurrence of its
    value inside window ``i`` iff ``prev_j < ws_i <= j < we_i``)
    contributes +1 to the contiguous ``i`` range
    ``[max(searchsorted(we, j, right), searchsorted(ws, prev_j, right)),
    searchsorted(ws, j, right) - 1]`` — three global searchsorteds over
    the (globally nondecreasing) bounds arrays, one difference array, one
    prefix sum.  ONE grouped exchange, zero per-row Python.
    """
    from feast_ray.grouped import grouped_map

    keys = [key] if isinstance(key, str) else list(key)
    if delta_us < 0:
        raise ValueError("delta_us must be >= 0")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_name, pa.array([], pa.int64()))
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        ts = _ts_us(t[ts_col].combine_chunks())
        ws, we = rolling_time_bounds(ts, starts, delta_us)
        codes = (
            t[cat_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = np.arange(n, dtype=np.int64)
        order = np.lexsort((pos, codes, gidx))
        so_g, so_c, so_p = gidx[order], codes[order], pos[order]
        prev_sorted = np.full(n, -1, dtype=np.int64)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = (so_g[1:] == so_g[:-1]) & (so_c[1:] == so_c[:-1])
        prev_sorted[same] = so_p[np.flatnonzero(same) - 1]
        prev = np.empty(n, dtype=np.int64)
        prev[order] = prev_sorted
        # i ranges (windows counting row j): we_i > j, ws_i <= j, ws_i > prev_j
        lo1 = np.searchsorted(we, pos, side="right")
        hi = np.searchsorted(ws, pos, side="right") - 1
        lo2 = np.searchsorted(ws, prev, side="right")  # prev=-1 -> 0
        lo = np.maximum(lo1, lo2)
        valid = (codes >= 0) & (lo <= hi)
        diff = (
            np.bincount(lo[valid], minlength=n + 1)
            - np.bincount(hi[valid] + 1, minlength=n + 1)
        )
        counts = np.cumsum(diff)[:n]
        return t.append_column(out_name, pa.array(counts.astype(np.int64)))

    return grouped_map(ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets)


def add_group_centered_mean(
    ds,
    key: str | Sequence[str],
    val_col: str,
    *,
    order_cols: Sequence[str],
    before: int = 2,
    after: int = 2,
    out_col: str = "c_ma",
    n_col: str = "w_n",
    num_buckets=None,
):
    """Centered moving average per entity (SQL ``AVG(v) OVER (... ROWS
    BETWEEN before PRECEDING AND after FOLLOWING)``) — the smoothing /
    trend-extraction window (look-AHEAD allowed) used for offline label
    denoising and seasonality removal, as opposed to the engine's causal
    rolling features.  Windows clip at entity edges (SQL semantics).

    Kernel: one grouped exchange; window sums are two lookups into a
    per-bucket int64 prefix sum (``val_col`` must be integer fixed-point,
    so sums are exact) and the mean is one IEEE double divide — bit-equal
    to ``CAST(SUM(..) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)``.
    Appends ``out_col`` (double) and ``n_col`` (int64 window size).
    """
    from feast_ray.grouped import grouped_map

    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.float64())) \
                    .append_column(n_col, pa.array([], pa.int64()))
        v = (
            t[val_col].combine_chunks().cast(pa.int64()).fill_null(0)
            .to_numpy(zero_copy_only=False)
        )
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        gend = np.repeat(starts[1:], sizes)
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(gstart, idx - before)
        hi = np.minimum(gend - 1, idx + after)
        cs = np.concatenate(([0], np.cumsum(v)))
        wsum = cs[hi + 1] - cs[lo]
        wn = (hi - lo + 1).astype(np.int64)
        ma = wsum.astype(np.float64) / wn.astype(np.float64)
        return t.append_column(out_col, pa.array(ma)) \
                .append_column(n_col, pa.array(wn))

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )
