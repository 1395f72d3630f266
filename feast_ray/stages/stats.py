"""Grouped order statistics and distribution features: exact per-entity
quantiles, per-entity z-score normalization, and categorical pivot counts.

Reference scope: upstream Feast declares only count/sum/min/max/avg/stddev
(``aggregation.py::Aggregation``); quantiles / normalization / pivots are the
extra distribution features a training-data pipeline needs (feature scaling,
per-entity behavior profiles).  All three run on the engine's single-shuffle
grouped exchange with vectorized multi-group kernels:

- ``grouped_quantile``: the bucket arrives sorted by ``(keys, value)`` (the
  exchange's local sort), so every group's order statistics are pure index
  arithmetic over the group-boundary offsets — no per-group slicing.
  ``method="disc"`` picks the element at 1-based rank ``ceil(q*n)`` (SQL
  ``quantile_disc``); ``method="cont"`` linearly interpolates at rank
  ``q*(n-1)`` (SQL ``quantile_cont`` / ``median``).
- ``add_group_zscore``: sums and sums-of-squares accumulate in exact int64
  (caller supplies a fixed-point integer column), so the mean/variance are
  bit-deterministic regardless of accumulation order — the float division
  and sqrt happen once per group, in a fixed operation order that a SQL
  twin can reproduce exactly.
- ``pivot_counts``: per-batch bincount over (key, category) is the map-side
  combiner; the shuffle carries one wide row per distinct key per batch.

Scale notes: one all-to-all each, O(rows) kernels, int64-exact partial
aggregation; a hot entity costs its row count vectorized.  For quantiles
over groups too large for one bucket, pre-aggregate to a fixed-width
histogram per (key, bin) first — exactness bounds then come from bin width.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map, starts_to_group_index


def grouped_quantile(
    ds,
    keys: Sequence[str],
    col: str,
    quantiles: dict[str, tuple[float, str]],
    *,
    num_buckets: Optional[int] = None,
    count_name: Optional[str] = None,
):
    """One row per key group with exact order-statistic columns.

    ``quantiles`` maps output column -> (q, method); method ``"disc"``
    (SQL ``quantile_disc``: element at rank ``ceil(q*n)``) or ``"cont"``
    (SQL ``quantile_cont``: linear interpolation at position ``q*(n-1)``).
    NULL values in ``col`` are excluded (SQL aggregate semantics); a group
    that is all-NULL emits NULL quantiles.  ``count_name`` additionally
    emits the non-null count per group (SQL ``COUNT(col)``).
    """
    keys = list(keys)
    for out, (q, method) in quantiles.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"{out!r}: q must be in [0, 1], got {q}")
        if method not in ("disc", "cont"):
            raise ValueError(f"{out!r}: method must be 'disc' or 'cont', got {method!r}")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take_first = pa.array(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take_first) for k in keys
        }
        arr = t[col].combine_chunks()
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        v = arr.cast(pa.float64()).fill_null(0.0).to_numpy(zero_copy_only=False)
        # nulls sort last within each group: the first cnt[g] slots are valid
        cnt = np.add.reduceat(valid.astype(np.int64), firsts)
        cnt = np.where(np.diff(starts) == 0, 0, cnt)  # guard empty trailing
        empty = cnt == 0
        safe_n = np.maximum(cnt, 1)
        if count_name is not None:
            cols[count_name] = pa.array(cnt.astype(np.int64))
        for out, (q, method) in quantiles.items():
            if method == "disc":
                rank = np.ceil(q * safe_n).astype(np.int64)
                idx = firsts + np.maximum(rank, 1) - 1
                vals = v[idx]
            else:
                pos = q * (safe_n - 1)
                lo = np.floor(pos).astype(np.int64)
                frac = pos - lo
                hi = np.minimum(lo + 1, safe_n - 1)
                vlo = v[firsts + lo]
                vhi = v[firsts + hi]
                vals = vlo + (vhi - vlo) * frac
            cols[out] = pa.array(vals, mask=empty)
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=[col], num_buckets=num_buckets)


def add_group_zscore(
    ds,
    key: str | Sequence[str],
    int_col: str,
    *,
    out_col: str = "zscore",
    scale: float = 1.0,
    num_buckets: Optional[int] = None,
):
    """Append per-row z-score of ``int_col`` within its ``key`` group.

    ``int_col`` must be an exact integer column (e.g. fixed-point cents) —
    sums and sums-of-squares then accumulate exactly in int64, making the
    result independent of accumulation order.  The float schedule is fixed
    and SQL-reproducible:

        mean = float(sum) / float(n)
        var  = float(sum_sq * n - sum * sum) / float(n * n)
        z    = (x - mean) / sqrt(var)          # NULL when n < 2 or var == 0

    ``scale`` divides x and mean back to original units BEFORE the division
    (z is scale-invariant; the parameter exists only if callers want the
    intermediate columns someday).  Intermediate products must stay within
    int64 / 2^53: sum_sq * n < 2^63 — holds for fixed-point values up to
    ~1e4 with ~1e5 rows per entity; salt hotter groups first.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        x = t[int_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        firsts = starts[:-1]
        n = np.diff(starts)
        s = np.add.reduceat(x, firsts)
        ssq = np.add.reduceat(x * x, firsts)
        n = np.where(n == 0, 1, n)
        mean = s.astype(np.float64) / n.astype(np.float64)
        var = (ssq * n - s * s).astype(np.float64) / (n * n).astype(np.float64)
        gidx = starts_to_group_index(starts)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (x.astype(np.float64) - mean[gidx]) / np.sqrt(var[gidx])
        bad = (n[gidx] < 2) | (var[gidx] <= 0)
        return t.append_column(out_col, pa.array(z, mask=bad))

    return grouped_map(ds, keys, kernel, num_buckets=num_buckets)


def pivot_counts(
    ds,
    keys: Sequence[str],
    cat_col: str,
    categories: Sequence[str],
    *,
    prefix: str = "n_",
    num_buckets: Optional[int] = None,
):
    """One row per key group with a count column per category (SQL
    ``COUNT(*) FILTER (WHERE cat = ...)`` pivot).  Values of ``cat_col``
    outside ``categories`` are ignored; categories must be declared because
    the output schema depends on them (discover them first with a distinct
    query when unknown).
    """
    keys = list(keys)
    cats = list(categories)
    out_cols = [f"{prefix}{c}" for c in cats]
    kcount = len(cats)
    cat_arr = pa.array(cats, pa.string())

    def partial(t: pa.Table) -> pa.Table:
        code_arr = pc.index_in(t[cat_col], value_set=cat_arr)
        codes = code_arr.combine_chunks().fill_null(-1).to_numpy(zero_copy_only=False) \
            if isinstance(code_arr, pa.ChunkedArray) else code_arr.fill_null(-1).to_numpy(zero_copy_only=False)
        keep = codes >= 0
        kt = t.select(keys).filter(pa.array(keep))
        codes = codes[keep]
        if kt.num_rows == 0:
            return pa.table(
                {**{k: t[k].slice(0, 0) for k in keys},
                 **{c: pa.array([], pa.int64()) for c in out_cols}}
            )
        # factorize the (possibly composite) key within the batch
        kcodes = pd_factorize_frame(kt.select(keys).to_pandas())
        n_u = int(kcodes.max()) + 1
        counts = np.bincount(kcodes * kcount + codes, minlength=n_u * kcount)
        counts = counts.reshape(n_u, kcount)
        _, first_idx = np.unique(kcodes, return_index=True)
        take = pa.array(first_idx.astype(np.int64))
        cols = {k: pc.take(kt[k].combine_chunks(), take) for k in keys}
        for j, c in enumerate(out_cols):
            cols[c] = pa.array(counts[:, j].astype(np.int64))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def sum_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take_first = pa.array(firsts)
        cols = {k: pc.take(t[k].combine_chunks(), take_first) for k in keys}
        for c in out_cols:
            v = t[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            cols[c] = pa.array(np.add.reduceat(v, firsts)) if len(v) else pa.array([], pa.int64())
        return pa.table(cols)

    return grouped_map(partials, keys, sum_kernel, num_buckets=num_buckets)


def pd_factorize_frame(df) -> np.ndarray:
    """Dense int codes for the rows of a small key frame (batch-local)."""
    import pandas as pd

    if df.shape[1] == 1:
        codes, _ = pd.factorize(df.iloc[:, 0], sort=False)
        return codes
    codes, _ = pd.factorize(pd.MultiIndex.from_frame(df), sort=False)
    return codes


def add_group_rank(
    ds,
    key: str | Sequence[str],
    col: str,
    *,
    tiebreak: Sequence[str] = (),
    ntile: Optional[int] = None,
    num_buckets: Optional[int] = None,
):
    """Append SQL ranking functions over ``col`` ascending within each key
    group: ``rank`` (peers share the min rank), ``dense_rank``,
    ``percent_rank`` = (rank-1)/(n-1) (0.0 for single-row groups), and —
    when ``ntile`` is set — ``ntile_<b>`` (first n%b tiles one row larger,
    row order ``(col, *tiebreak)``; pass a unique tiebreak for
    engine-independent tiles).

    One grouped shuffle; the bucket arrives sorted by ``(keys, col,
    tiebreak)``, so ranks are run-detection + cumulative index arithmetic
    over the whole bucket (no per-group pass).
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            out = t
            for c in ["rank", "dense_rank", "percent_rank"] + (
                [f"ntile_{ntile}"] if ntile else []
            ):
                typ = pa.float64() if c == "percent_rank" else pa.int64()
                out = out.append_column(c, pa.array([], typ))
            return out
        v = t[col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        gpos = np.arange(n, dtype=np.int64)
        gstart_row = np.repeat(starts[:-1], np.diff(starts))
        pos = gpos - gstart_row
        newrun = np.empty(n, dtype=bool)
        newrun[0] = True
        newrun[1:] = (v[1:] != v[:-1]) | (gpos[1:] == gstart_row[1:])
        run_start = np.maximum.accumulate(np.where(newrun, gpos, -1))
        rank = run_start - gstart_row + 1
        cum = np.cumsum(newrun)
        dense = cum - cum[gstart_row] + 1
        sizes = np.diff(starts)
        n_g = np.repeat(sizes, sizes)
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(n_g > 1, (rank - 1) / np.maximum(n_g - 1, 1), 0.0)
        out = (
            t.append_column("rank", pa.array(rank))
            .append_column("dense_rank", pa.array(dense))
            .append_column("percent_rank", pa.array(pr))
        )
        if ntile:
            b = int(ntile)
            size = n_g // b
            rem = n_g % b
            big_span = rem * (size + 1)
            small = np.maximum(size, 1)
            tile = np.where(
                pos < big_span, pos // (size + 1), rem + (pos - big_span) // small
            )
            out = out.append_column(f"ntile_{b}", pa.array((tile + 1).astype(np.int64)))
        return out

    return grouped_map(
        ds, keys, kernel, sort_keys=[col, *tiebreak], num_buckets=num_buckets
    )


def fixed_histogram(
    ds,
    col: str,
    *,
    lo: int,
    hi: int,
    n_bins: int,
    num_buckets: Optional[int] = None,
):
    """Global fixed-width histogram of an integer column over ``[lo, hi)``:
    bin = (x - lo) * n_bins // (hi - lo), rows outside the range dropped.
    Pure integer arithmetic — a SQL twin reproduces it exactly.

    Per-batch ``bincount`` is the map-side combiner (the shuffle carries at
    most ``n_bins`` rows per batch); one grouped int64 sum finishes.  Empty
    bins are absent from the output (join a bin spine if needed).
    """
    span = hi - lo
    if span <= 0 or n_bins <= 0:
        raise ValueError("need hi > lo and n_bins > 0")

    def partial(t: pa.Table) -> pa.Table:
        x = t[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        x = x[(x >= lo) & (x < hi)]
        if len(x) == 0:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        b = (x - lo) * n_bins // span
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)), "cnt": pa.array(counts[nz].astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def sum_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        firsts = starts[:-1]
        c = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": pc.take(t["bin"].combine_chunks(), pa.array(firsts)),
                "cnt": pa.array(np.add.reduceat(c, firsts)),
            }
        )

    return grouped_map(partials, ["bin"], sum_kernel, num_buckets=num_buckets)


def add_group_expanding_distinct(
    ds,
    key: str | Sequence[str],
    cat_col: str,
    *,
    order_cols: Sequence[str],
    out_col: str = "n_distinct_so_far",
    num_buckets: Optional[int] = None,
):
    """Running COUNT(DISTINCT cat) per entity in event-time order — the
    cumulative-vocabulary / behavioral-novelty feature (SQL spells it as a
    first-occurrence flag summed over an expanding window; there is no
    native distinct window aggregate).

    Kernel over the exchange's sorted buckets: dictionary-encode the
    category, form (group, code) pair keys, ``np.unique(return_index)``
    marks each pair's EARLIEST row (buckets are time-ordered within group),
    then one cumsum rebased at group starts.  O(n log n) vectorized, no
    per-group Python.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        codes = (
            t[cat_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        vocab = int(codes.max()) + 1
        _, first_idx = np.unique(gidx * vocab + codes, return_index=True)
        is_first = np.zeros(n, dtype=np.int64)
        is_first[first_idx] = 1
        cum = np.cumsum(is_first)
        base = np.repeat(cum[starts[:-1]] - is_first[starts[:-1]], sizes)
        return t.append_column(out_col, pa.array(cum - base))

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def grouped_corr(
    ds,
    key: str | Sequence[str],
    x_col: str,
    y_col: str,
    *,
    out_col: str = "corr",
    count_col: Optional[str] = "n",
    num_buckets: Optional[int] = None,
):
    """One row per key group with the exact Pearson correlation of two
    integer columns (SQL ``corr(x, y)`` restated over exact sums).

    Both columns must be exact integers (fixed-point upstream) so the five
    moment sums accumulate exactly in int64 and the result is independent
    of accumulation order.  The float schedule is fixed and
    SQL-reproducible:

        corr = float(n*Sxy - Sx*Sy)
               / (sqrt(float(n*Sxx - Sx^2)) * sqrt(float(n*Syy - Sy^2)))

    NULL when n < 2 or either variance term is 0.  Overflow guard: each
    int64 product (n * sum of squares) must stay below 2^63 — holds for
    values up to ~1e4 with ~1e5 rows per entity; salt hotter groups first.
    One grouped exchange, reduceat kernel, no per-group Python.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take_first = pa.array(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take_first) for k in keys
        }
        x = t[x_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(starts)
        sx = np.add.reduceat(x, firsts) if len(x) else np.zeros(0, np.int64)
        sy = np.add.reduceat(y, firsts) if len(y) else np.zeros(0, np.int64)
        sxx = np.add.reduceat(x * x, firsts) if len(x) else np.zeros(0, np.int64)
        syy = np.add.reduceat(y * y, firsts) if len(y) else np.zeros(0, np.int64)
        sxy = np.add.reduceat(x * y, firsts) if len(x) else np.zeros(0, np.int64)
        cov = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = cov / (np.sqrt(vx) * np.sqrt(vy))
        bad = (n < 2) | (vx <= 0) | (vy <= 0)
        cols[out_col] = pa.array(r, mask=bad)
        if count_col is not None:
            cols[count_col] = pa.array(n.astype(np.int64))
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, num_buckets=num_buckets)


def grouped_autocorr(
    ds,
    key: str | Sequence[str],
    val_col: str,
    *,
    order_cols: Sequence[str],
    out_col: str = "autocorr1",
    count_col: str = "n_pairs",
    num_buckets: Optional[int] = None,
):
    """Lag-1 autocorrelation per entity: the exact Pearson correlation of
    ``(v_t, v_{t+1})`` over the entity's values in ``order_cols`` order —
    the "is this series sticky or mean-reverting" feature of behavioral
    and time-series models.  SQL twin: ``corr(v, lead(v) over w)``.

    Same exactness contract as :func:`grouped_corr` (``val_col`` integer
    fixed-point, five int64 moment sums over the consecutive pairs, one
    fixed float schedule), same overflow guard.  Entities with < 1 pair
    (fewer than two rows) emit nothing, matching the SQL aggregate over
    the non-NULL lead pairs.  ONE grouped exchange — pairs are formed
    positionally inside the kernel, never materialized as rows.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        sizes = np.diff(starts)
        v = t[val_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n_rows = len(v)
        # pair i = (v[i], v[i+1]) for every i that is not its group's last row
        pair_mask = np.ones(max(n_rows - 1, 0), dtype=bool)
        last_rows = starts[1:] - 1
        pair_mask[last_rows[last_rows < n_rows - 1]] = False
        x = v[:-1][pair_mask]
        y = v[1:][pair_mask]
        pair_sizes = np.maximum(sizes - 1, 0)
        keep = pair_sizes > 0  # groups contributing >= 1 pair
        if not keep.any():
            cols = {k: t[k].combine_chunks().slice(0, 0) for k in keys}
            cols[count_col] = pa.array([], pa.int64())
            cols[out_col] = pa.array([], pa.float64())
            return pa.table(cols)
        pair_firsts = np.concatenate(([0], np.cumsum(pair_sizes)))[:-1][keep]
        n = pair_sizes[keep]
        sx = np.add.reduceat(x, pair_firsts)
        sy = np.add.reduceat(y, pair_firsts)
        sxx = np.add.reduceat(x * x, pair_firsts)
        syy = np.add.reduceat(y * y, pair_firsts)
        sxy = np.add.reduceat(x * y, pair_firsts)
        cov = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = cov / (np.sqrt(vx) * np.sqrt(vy))
        bad = (n < 2) | (vx <= 0) | (vy <= 0)
        take_first = pa.array(firsts[keep])
        cols = {k: pc.take(t[k].combine_chunks(), take_first) for k in keys}
        cols[count_col] = pa.array(n.astype(np.int64))
        cols[out_col] = pa.array(r, mask=bad)
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets)


def approx_group_quantile(
    ds,
    key: str | Sequence[str],
    int_col: str,
    quantiles: dict[str, float],
    *,
    lo: int,
    hi: int,
    n_bins: int,
    num_buckets: Optional[int] = None,
):
    """Histogram-sketch quantiles per entity — the SCALE path for groups too
    large to co-locate (the exact ``grouped_quantile`` docstring points
    here): per-batch (key, bin, count) partials bound the shuffle to
    ``n_bins`` rows per key per batch regardless of group size, and the
    answer is exact "to the bin": each output is the LOWER EDGE of the bin
    holding rank ``ceil(q*n)`` — i.e. precisely ``quantile_disc`` over the
    bin-floored values, so a SQL twin reproduces it bit-exactly and the
    error bound is the bin width.

    Values are clamped into the edge bins; NULLs are dropped; ``hi - lo``
    must divide by ``n_bins`` so the integer bin algebra matches SQL.  One
    grouped exchange; the rank lookup is a single searchsorted over
    group-rebased cumulative counts.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if hi <= lo or n_bins <= 0 or (hi - lo) % n_bins != 0:
        raise ValueError("need hi > lo and (hi - lo) divisible by n_bins")
    width = (hi - lo) // n_bins
    for out, q in quantiles.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"{out!r}: q must be in [0, 1], got {q}")

    def partial(t: pa.Table) -> pa.Table:
        cols = {k: pa.array([], t[k].type) for k in keys}
        cols["bin"] = pa.array([], pa.int64())
        cols["cnt"] = pa.array([], pa.int64())
        arr = t[int_col].combine_chunks()
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        if not valid.any():
            return pa.table(cols)
        sub = t.filter(pa.array(valid))
        v = sub[int_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip((v - lo) * n_bins // (hi - lo), 0, n_bins - 1)
        import pandas as pd

        kf = pd.DataFrame({k: sub[k].combine_chunks().to_pandas() for k in keys})
        kf["bin"] = b
        codes, uniq = pd.factorize(pd.MultiIndex.from_frame(kf), sort=False)
        cnt = np.bincount(codes)
        _, first_idx = np.unique(codes, return_index=True)
        take = pa.array(first_idx.astype(np.int64))
        out_cols = {k: pc.take(sub[k].combine_chunks(), take) for k in keys}
        out_cols["bin"] = pa.array(b[first_idx])
        out_cols["cnt"] = pa.array(cnt.astype(np.int64))
        return pa.table(out_cols)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take = pa.array(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take) for k in keys
        }
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        bins = t["bin"].combine_chunks().to_numpy(zero_copy_only=False)
        n_groups = len(firsts)
        if t.num_rows == 0:
            for out in quantiles:
                cols[out] = pa.array([], pa.int64())
            return pa.table(cols)
        cum = np.cumsum(cnt)
        base = np.where(firsts > 0, cum[np.maximum(firsts - 1, 0)], 0)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(n_groups, dtype=np.int64), sizes)
        rebased = cum - base[gidx]
        totals = rebased[starts[1:] - 1]
        offset = int(totals.max()) + 1
        skey = gidx * offset + rebased
        for out, q in quantiles.items():
            rank = np.maximum(np.ceil(q * totals), 1).astype(np.int64)
            idx = np.searchsorted(skey, np.arange(n_groups) * offset + rank, side="left")
            cols[out] = pa.array(lo + bins[idx] * width)
        return pa.table(cols)

    return grouped_map(parts, keys, kernel, sort_keys=["bin"], num_buckets=num_buckets)


def add_group_minmax_scale(
    ds,
    key: str | Sequence[str],
    int_col: str,
    *,
    out_col: str = "scaled",
    num_buckets: Optional[int] = None,
):
    """Per-entity min-max normalization of an exact integer column to
    [0, 1]: ``(x - min) / (max - min)`` with ONE float division per row in
    a fixed order (SQL-reproducible bit-exactly); constant groups emit
    NULL.  Same one-exchange reduceat shape as the z-score kernel."""
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        x = t[int_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        firsts = starts[:-1]
        gmin = np.minimum.reduceat(x, firsts) if len(x) else np.zeros(0, np.int64)
        gmax = np.maximum.reduceat(x, firsts) if len(x) else np.zeros(0, np.int64)
        gidx = starts_to_group_index(starts)
        span = (gmax - gmin)[gidx]
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (x - gmin[gidx]).astype(np.float64) / span.astype(np.float64)
        return t.append_column(out_col, pa.array(s, mask=span == 0))

    return grouped_map(ds, keys, kernel, num_buckets=num_buckets)


def melt(
    ds,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    var_col: str = "variable",
    value_col: str = "value",
    value_type: Optional[pa.DataType] = None,
):
    """Unpivot wide columns to long rows (the inverse of
    :func:`pivot_counts`; SQL ``UNPIVOT`` / stacked ``UNION ALL``): each
    input row yields one output row per entry of ``value_cols``.
    Embarrassingly parallel — one vectorized take/tile per batch, k-fold
    row expansion, no shuffle."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = len(value_cols)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        cols = {c: pc.take(t[c].combine_chunks(), idx) for c in id_cols}
        cols[var_col] = pa.array(
            np.tile(np.asarray(value_cols, dtype=object), n), type=pa.string()
        )
        vals = []
        for c in value_cols:
            v = t[c].combine_chunks()
            if value_type is not None:
                v = v.cast(value_type)
            vals.append(v if isinstance(v, pa.Array) else v.combine_chunks())
        # stacked is column-major ([all of col0, all of col1, ...]); one
        # strided take interleaves it row-major (k is a small constant)
        stacked = pa.concat_arrays(vals)
        take_idx = np.empty(n * k, dtype=np.int64)
        for j in range(k):
            take_idx[j::k] = np.arange(n, dtype=np.int64) + j * n
        cols[value_col] = pc.take(stacked, pa.array(take_idx))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def add_group_ewma(
    ds,
    key: str | Sequence[str],
    val_col: str,
    *,
    alpha: float,
    order_cols: Sequence[str],
    out_col: str = "ewma",
    num_buckets: Optional[int] = None,
):
    """Per-entity exponentially weighted moving average in event-time order
    (the time-decay feature upstream Feast's ``aggregation.py::Aggregation``
    family implies but never ships; pandas ``groupby().ewm(adjust=False)``):

        y_0 = x_0;   y_i = alpha * x_i + (1 - alpha) * y_{i-1}

    The recurrence is sequential per entity but the kernel walks RANKS, not
    rows: step r updates row r of EVERY group in the bucket at once (mask +
    two multiplies + add over index arrays), so Python-level iterations =
    max rows per entity in the bucket, each fully vectorized across groups.
    The float schedule is exactly ``alpha * x + (1 - alpha) * y_prev`` in
    that operation order, so a SQL recursive-CTE twin reproduces it
    bit-for-bit; pick a dyadic ``alpha`` (0.25, 0.5, ...) so the SQL literal
    ``1 - alpha`` is the same double.

    Scale: one grouped exchange; a hot entity with m rows costs m vectorized
    steps over a shrinking index set — acceptable to ~1e5 rows/entity, salt
    beyond.  Null values are rejected (a NULL would poison the tail of its
    entity in SQL but turn into NaN here — no silent divergence).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    a = float(alpha)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        from feast_ray.stages.windows import ewma_walk

        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.float64()))
        col = t[val_col].combine_chunks()
        if col.null_count:
            raise ValueError(f"{val_col} has nulls; ewma over nulls is undefined")
        x = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        return t.append_column(out_col, pa.array(ewma_walk(x, starts, a)))

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def rollup_agg(
    ds,
    keys: Sequence[str],
    val_col: str,
    *,
    count_name: str = "n",
    sum_name: str = "s",
):
    """Multi-level ROLLUP aggregate (SQL ``GROUP BY ROLLUP(k1, .., km)``):
    count + exact int64 sum at every key prefix, rolled-up key columns
    NULL.  The input is scanned ONCE — the finest level is a map-side
    combiner + one exchange (:func:`partial_count_sum`); every coarser
    level re-aggregates the (distinct-keys-sized) finest result, and the
    grand total reduces it to one driver-side row.  At 100 TB the raw data feeds
    exactly one exchange; the level cascade moves only aggregate rows.

    ``val_col`` must be integer (fixed point) so level sums are exact and
    independent of combination order.
    """
    from ray.data.aggregate import Sum

    import ray.data as rd

    from feast_ray.grouped import dataset_schema

    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    schema = dataset_schema(ds)
    if not pa.types.is_integer(schema.field(val_col).type):
        raise ValueError("val_col must be an integer (fixed-point) column")
    key_fields = [pa.field(k, schema.field(k).type) for k in keys]
    out_schema = pa.schema(
        key_fields + [pa.field(count_name, pa.int64()), pa.field(sum_name, pa.int64())]
    )

    def canon(level: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for i, fld in enumerate(key_fields):
                if i < level:
                    cols[fld.name] = t[fld.name].cast(fld.type)
                else:
                    cols[fld.name] = pa.nulls(n, type=fld.type)
            cols[count_name] = t[count_name].cast(pa.int64())
            cols[sum_name] = t[sum_name].cast(pa.int64())
            return pa.table(cols, schema=out_schema)

        return f

    finest = partial_count_sum(
        ds, keys, val_col, count_name=count_name, sum_name=sum_name
    ).materialize()  # feeds every coarser level + the grand total
    levels = [
        finest.map_batches(canon(len(keys)), batch_format="pyarrow", zero_copy_batch=True)
    ]
    for lv in range(len(keys) - 1, 0, -1):
        t = sum_by(finest, keys[:lv], [count_name, sum_name])
        levels.append(
            t.map_batches(canon(lv), batch_format="pyarrow", zero_copy_batch=True)
        )
    # grand total: per-batch fold to one row, driver sums the (tiny,
    # one-row-per-block) partials — full consume, no executor early-stop
    # (Dataset.aggregate's internal take cancels still-running tasks)
    def _tot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {count_name: pa.array([_pc.sum(t[count_name]).as_py() or 0], pa.int64()),
             sum_name: pa.array([_pc.sum(t[sum_name]).as_py() or 0], pa.int64())}
        )

    tot_rows = finest.map_batches(
        _tot, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    grand = pa.table(
        {
            **{f.name: pa.nulls(1, type=f.type) for f in key_fields},
            count_name: pa.array(
                [sum(int(r[count_name]) for r in tot_rows)], type=pa.int64()
            ),
            sum_name: pa.array(
                [sum(int(r[sum_name]) for r in tot_rows)], type=pa.int64()
            ),
        },
        schema=out_schema,
    )
    levels.append(rd.from_arrow(grand))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_agg(
    ds,
    keys: Sequence[str],
    val_col: str,
    *,
    count_name: str = "n",
    sum_name: str = "s",
):
    """Full CUBE aggregate (SQL ``GROUP BY CUBE(k1, .., km)``): count +
    exact int64 sum at EVERY key subset (2^m grouping sets), absent key
    columns NULL.  Same single-scan structure as :func:`rollup_agg` — the
    raw input feeds exactly one map-side-combined exchange (the finest
    level); every other grouping set re-aggregates the distinct-keys-sized
    finest result, so at 100 TB the 2^m - 1 extra cascades move only
    aggregate rows.  Intended for m <= ~4 bounded-domain dimensions (time
    bucket x category x source ...) — 2^m grows, and each subset's cost is
    a tiny-exchange over the finest cells.

    ``val_col`` must be integer (fixed point) so level sums are exact and
    independent of combination order.
    """
    from itertools import combinations

    import ray.data as rd

    from feast_ray.grouped import dataset_schema

    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    schema = dataset_schema(ds)
    if not pa.types.is_integer(schema.field(val_col).type):
        raise ValueError("val_col must be an integer (fixed-point) column")
    key_fields = [pa.field(k, schema.field(k).type) for k in keys]
    out_schema = pa.schema(
        key_fields + [pa.field(count_name, pa.int64()), pa.field(sum_name, pa.int64())]
    )

    def canon(present: frozenset):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for fld in key_fields:
                if fld.name in present:
                    cols[fld.name] = t[fld.name].cast(fld.type)
                else:
                    cols[fld.name] = pa.nulls(n, type=fld.type)
            cols[count_name] = t[count_name].cast(pa.int64())
            cols[sum_name] = t[sum_name].cast(pa.int64())
            return pa.table(cols, schema=out_schema)

        return f

    finest = partial_count_sum(
        ds, keys, val_col, count_name=count_name, sum_name=sum_name
    ).materialize()  # feeds every other grouping set + the grand total
    levels = [
        finest.map_batches(
            canon(frozenset(keys)), batch_format="pyarrow", zero_copy_batch=True
        )
    ]
    for m in range(len(keys) - 1, 0, -1):
        for subset in combinations(keys, m):
            t = sum_by(finest, list(subset), [count_name, sum_name])
            levels.append(
                t.map_batches(
                    canon(frozenset(subset)),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
    # grand total: per-block fold to one row, driver sums the tiny partials
    # (full consume — Dataset.aggregate's internal take cancels running tasks)
    def _tot(t: pa.Table) -> pa.Table:
        return pa.table(
            {count_name: pa.array([pc.sum(t[count_name]).as_py() or 0], pa.int64()),
             sum_name: pa.array([pc.sum(t[sum_name]).as_py() or 0], pa.int64())}
        )

    tot_rows = finest.map_batches(
        _tot, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    grand = pa.table(
        {
            **{f.name: pa.nulls(1, type=f.type) for f in key_fields},
            count_name: pa.array(
                [sum(int(r[count_name]) for r in tot_rows)], type=pa.int64()
            ),
            sum_name: pa.array(
                [sum(int(r[sum_name]) for r in tot_rows)], type=pa.int64()
            ),
        },
        schema=out_schema,
    )
    levels.append(rd.from_arrow(grand))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def add_group_ffill(
    ds,
    key: str | Sequence[str],
    cols: Sequence[str],
    *,
    order_cols: Sequence[str],
    suffix: str = "_ffill",
    num_buckets: Optional[int] = None,
):
    """Last-observation-carried-forward per entity in event-time order
    (SQL ``last_value(x IGNORE NULLS) OVER (PARTITION BY key ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``): each NULL takes the entity's most recent
    non-NULL value; rows before the first observation stay NULL.  The
    sparse-signal carry-forward every feature pipeline needs (sensor
    readings, sporadic labels, "most recent purchase amount at every
    event").

    Kernel: one global ``np.maximum.accumulate`` over valid row positions;
    a carried position from an EARLIER group is detected as being below
    the row's own group start and nulled — no per-group reset, no Python
    loop.  Output keeps the original column and appends ``{col}{suffix}``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = list(cols)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            for c in cols:
                t = t.append_column(c + suffix, t[c].combine_chunks().slice(0, 0))
            return t
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        ar = np.arange(n, dtype=np.int64)
        for c in cols:
            arr = t[c].combine_chunks()
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            acc = np.maximum.accumulate(np.where(valid, ar, -1))
            ok = acc >= gstart
            idx = pa.array(np.maximum(acc, 0), type=pa.int64(), mask=~ok)
            t = t.append_column(c + suffix, pc.take(arr, idx))
        return t

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def grouped_mode(
    ds,
    key: str | Sequence[str],
    cat_col: str,
    *,
    value_name: str = "mode",
    count_name: str = "mode_n",
    num_buckets: Optional[int] = None,
):
    """One row per key group with the MOST FREQUENT value of ``cat_col``
    and its count; frequency ties break to the smallest value (SQL
    ``ROW_NUMBER() OVER (ORDER BY cnt DESC, value)`` — unlike SQL
    ``mode()``, which is tie-arbitrary, this is deterministic on any
    cluster shape).  NULL categories are ignored; an all-NULL group emits
    a NULL mode with count 0.

    Kernel: the bucket arrives sorted by (keys, cat), so category runs are
    one diff; per-group max run length via ``maximum.reduceat`` over runs,
    winner = first run achieving it (runs are value-ascending within the
    group).  One exchange, no per-group Python.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = pa.array(starts[:-1])
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), firsts) for k in keys
        }
        n = t.num_rows
        cat = t[cat_col].combine_chunks()
        cat_type = cat.type
        n_groups = len(starts) - 1
        if n == 0:
            cols[value_name] = pa.array([], type=cat_type)
            cols[count_name] = pa.array([], type=pa.int64())
            return pa.table(cols)
        gidx = starts_to_group_index(starts)
        valid = cat.is_valid().to_numpy(zero_copy_only=False)
        codes = cat.dictionary_encode().indices.fill_null(-1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # runs of equal (group, code); nulls sort last within the group
        newrun = np.ones(n, dtype=bool)
        newrun[1:] = (codes[1:] != codes[:-1]) | (gidx[1:] != gidx[:-1])
        run_start = np.flatnonzero(newrun)
        run_len = np.diff(np.concatenate((run_start, [n])))
        run_g = gidx[run_start]
        run_valid = valid[run_start]
        run_score = np.where(run_valid, run_len, 0)
        # per-group max over runs (groups with no runs can't happen: every
        # group has >= 1 row hence >= 1 run)
        g_first_run = np.searchsorted(run_g, np.arange(n_groups))
        gmax = np.maximum.reduceat(run_score, g_first_run)
        is_win = run_valid & (run_score == gmax[run_g])
        # first winning run per group (value-ascending order = smallest)
        _, win_idx = np.unique(run_g[is_win], return_index=True)
        win_runs = np.flatnonzero(is_win)[win_idx]
        win_groups = run_g[win_runs]
        mode_idx = np.full(n_groups, -1, dtype=np.int64)
        mode_idx[win_groups] = run_start[win_runs]
        cnt = np.zeros(n_groups, dtype=np.int64)
        cnt[win_groups] = run_len[win_runs]
        take = pa.array(np.maximum(mode_idx, 0), type=pa.int64(), mask=mode_idx < 0)
        cols[value_name] = pc.take(cat, take)
        cols[count_name] = pa.array(cnt)
        return pa.table(cols)

    return grouped_map(
        ds, keys, kernel, sort_keys=[cat_col], num_buckets=num_buckets
    )


def grouped_ols(
    ds,
    key: str | Sequence[str],
    x_col: str,
    y_col: str,
    *,
    slope_name: str = "slope",
    intercept_name: str = "intercept",
    count_col: Optional[str] = "n",
    num_buckets: Optional[int] = None,
):
    """One row per key group with the exact least-squares trend of y on x
    (SQL ``regr_slope``/``regr_intercept`` restated over exact integer
    moment sums — the per-entity trend feature).

    Both columns must be exact integers (rebase timestamps to a small unit
    first) so the four moments accumulate exactly in int64 and the result
    is accumulation-order independent.  Fixed SQL-reproducible schedule:

        slope = float(n*Sxy - Sx*Sy) / float(n*Sxx - Sx^2)
        icept = (float(Sy) - slope * float(Sx)) / float(n)

    NULL when n < 2 or x has zero variance.  Overflow guard as
    ``grouped_corr``: keep |x|, |y| small enough that n * sum-of-squares
    stays below 2^63.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take_first = pa.array(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take_first) for k in keys
        }
        x = t[x_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(starts)
        z = np.zeros(0, np.int64)
        sx = np.add.reduceat(x, firsts) if len(x) else z
        sy = np.add.reduceat(y, firsts) if len(y) else z
        sxx = np.add.reduceat(x * x, firsts) if len(x) else z
        sxy = np.add.reduceat(x * y, firsts) if len(x) else z
        vx = (n * sxx - sx * sx).astype(np.float64)
        cov = (n * sxy - sx * sy).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = cov / vx
            icept = (sy.astype(np.float64) - slope * sx.astype(np.float64)) / n.astype(
                np.float64
            )
        bad = (n < 2) | (vx <= 0)
        cols[slope_name] = pa.array(slope, mask=bad)
        cols[intercept_name] = pa.array(icept, mask=bad)
        if count_col is not None:
            cols[count_col] = pa.array(n.astype(np.int64))
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, num_buckets=num_buckets)


def partial_count_sum(
    ds,
    keys: Sequence[str],
    val_col: Optional[str] = None,
    *,
    count_name: str = "n",
    sum_name: str = "s",
    num_buckets: Optional[int] = None,
):
    """Distributed COUNT(*) (+ exact int64 SUM of ``val_col``) per key tuple
    via the engine's exchange instead of Dataset ``groupby().aggregate()``
    (measured 3-5x slower at many blocks — BASELINE.md engine notes): each
    batch pre-aggregates to one row per distinct key tuple (map-side
    combiner: dictionary-encode + pack codes + np.unique + reduceat), so
    the one exchange carries distinct-keys-per-batch rows, never raw rows.
    Keys must be non-null (the grouped exchange's standing contract).
    """
    keys = list(keys)
    with_sum = val_col is not None

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key_arrs = {k: t[k].combine_chunks() for k in keys}
        if n == 0:
            cols = {k: key_arrs[k].slice(0, 0) for k in keys}
            cols[count_name] = pa.array([], pa.int64())
            if with_sum:
                cols[sum_name] = pa.array([], pa.int64())
            return pa.table(cols)
        pack = np.zeros(n, dtype=np.int64)
        stride = 1
        for k in keys:
            idx = key_arrs[k].dictionary_encode().indices
            c = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64) + 1
            vocab = int(c.max()) + 1
            pack = pack * vocab + c
            stride *= vocab
        order = np.argsort(pack, kind="stable")
        sp = pack[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(sp[1:] != sp[:-1]) + 1)
        )
        firsts = order[bounds]
        cnt = np.diff(np.concatenate((bounds, [n])))
        take = pa.array(firsts)
        cols = {k: pc.take(key_arrs[k], take) for k in keys}
        cols[count_name] = pa.array(cnt.astype(np.int64))
        if with_sum:
            v = (
                t[val_col].combine_chunks().cast(pa.int64()).fill_null(0)
                .to_numpy(zero_copy_only=False)[order]
            )
            cols[sum_name] = pa.array(np.add.reduceat(v, bounds).astype(np.int64))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sum_by(
        partials, keys, [count_name] + ([sum_name] if with_sum else []),
        num_buckets=num_buckets,
    )


def sum_by(
    ds,
    keys: Sequence[str],
    cols: Sequence[str],
    *,
    num_buckets: Optional[int] = None,
):
    """Exact int64 SUM of ``cols`` per key tuple over one grouped exchange
    (reduceat kernel) — the reduce side of map-side-combined aggregates."""
    keys = list(keys)
    cols = list(cols)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take = pa.array(firsts)
        out = {k: pc.take(t[k].combine_chunks(), take) for k in keys}
        for c in cols:
            v = (
                t[c].combine_chunks().cast(pa.int64()).fill_null(0)
                .to_numpy(zero_copy_only=False)
            )
            out[c] = pa.array(
                np.add.reduceat(v, firsts).astype(np.int64)
                if len(v)
                else np.zeros(0, np.int64)
            )
        return pa.table(out)

    return grouped_map(ds, keys, kernel, num_buckets=num_buckets)


def global_order_index(
    ds,
    col: str,
    *,
    tiebreak: str,
    pos_name: str = "global_rank",
    ntile: Optional[int] = None,
    ntile_name: Optional[str] = None,
    bucket_bits: int = 12,
    num_buckets: Optional[int] = None,
):
    """Global 0-based rank of every row in ``(col, tiebreak)`` ascending
    order — ``ROW_NUMBER() OVER (ORDER BY col, tiebreak) - 1`` at scale,
    WITHOUT the Dataset sort operator (measured 3-5x slower than the
    exchange at many blocks — BASELINE.md).  Optionally appends the SQL
    ``NTILE(ntile)`` bucket computed from the rank and the (driver-known)
    total count — global equal-frequency discretization.

    Range-partitioned rank (sample-sort shape, deterministic
    partitioning): pass A takes the global int min/max of ``col``; rows
    map to 2^bucket_bits equal-WIDTH value ranges; pass B counts rows per
    range (<= 2^bucket_bits driver ints); pass C exchanges rows by range
    and assigns ``range_offset + local_rank`` off the sorted groups.
    Both columns must be integers and non-null; ``tiebreak`` must be
    unique for a total order.  Three scans of the (thin — project first)
    input.  Value skew concentrates rows in one range = one task; deepen
    ``bucket_bits`` when a single value can dominate.
    """
    import ray

    from ray.data.aggregate import Max, Min

    if not 1 <= bucket_bits <= 20:
        raise ValueError("bucket_bits must be in [1, 20]")
    if ntile is not None and ntile < 1:
        raise ValueError("ntile must be >= 1")
    tile_col = ntile_name or (f"ntile_{ntile}" if ntile else None)
    n_b = 1 << bucket_bits
    BK = "__go_b"

    thin = ds.materialize()
    mm = thin.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    width = max(hi - lo + 1, 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((v - lo) * n_b) // width
        return t.append_column(BK, pa.array(b))

    tagged = thin.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def hist(t: pa.Table) -> pa.Table:
        b = t[BK].combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(vals), "c": pa.array(cnts.astype(np.int64))})

    agg = (
        tagged.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .sum("c")
        .to_pandas()
    )
    counts = np.zeros(n_b, dtype=np.int64)
    counts[agg["b"].to_numpy(dtype=np.int64)] = agg["sum(c)"].to_numpy(dtype=np.int64)
    total = int(counts.sum())
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    off_ref = ray.put(offsets)
    if ntile is not None:
        base, extra = total // ntile, total % ntile

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        offs = ray.get(off_ref)
        n = t.num_rows
        out = t.drop_columns([BK])
        if n == 0:
            out = out.append_column(pos_name, pa.array([], type=pa.int64()))
            if tile_col:
                out = out.append_column(tile_col, pa.array([], type=pa.int64()))
            return out
        b = t[BK].combine_chunks().to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        pos = offs[b] + (np.arange(n, dtype=np.int64) - gstart)
        out = out.append_column(pos_name, pa.array(pos))
        if tile_col:
            cut = extra * (base + 1)
            small = np.maximum(base, 1)
            tile = np.where(
                pos < cut, pos // (base + 1) + 1, extra + (pos - cut) // small + 1
            )
            out = out.append_column(tile_col, pa.array(tile.astype(np.int64)))
        return out

    return grouped_map(
        tagged, [BK], kernel, sort_keys=[col, tiebreak], num_buckets=num_buckets
    )


def add_group_mean_impute(
    ds,
    key: str | Sequence[str],
    int_col: str,
    *,
    out_col: str = "imputed",
    num_buckets: Optional[int] = None,
):
    """Fill NULLs of an integer (fixed-point) column with the entity's mean
    of its non-NULL values (SQL ``COALESCE(x, AVG(x) OVER (PARTITION BY
    key))``) — mean imputation, the feature-matrix repair step.  The mean
    is float(sum)/float(count) over exact int64 sums (one fixed division,
    SQL-reproducible); an all-NULL entity stays NULL.  Output is float64
    (imputed rows are fractional).  One grouped exchange.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        arr = t[int_col].combine_chunks()
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], type=pa.float64()))
        firsts = starts[:-1]
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        x = arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
        cnt = np.add.reduceat(valid.astype(np.int64), firsts)
        cnt = np.where(np.diff(starts) == 0, 0, cnt)
        s = np.add.reduceat(np.where(valid, x, 0), firsts)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s.astype(np.float64) / cnt.astype(np.float64)
        gidx = starts_to_group_index(starts)
        out = np.where(valid, x.astype(np.float64), mean[gidx])
        bad = ~valid & (cnt[gidx] == 0)
        return t.append_column(out_col, pa.array(out, mask=bad))

    return grouped_map(ds, keys, kernel, num_buckets=num_buckets)


def grouped_interarrival(
    ds,
    key: str | Sequence[str],
    ts_us_col: str,
    *,
    val_col: Optional[str] = None,
    order_tiebreak: Optional[str] = None,
    twa_name: str = "twa",
    mean_gap_name: str = "mean_gap_s",
    max_gap_name: str = "max_gap_s",
    count_name: str = "n",
    num_buckets: Optional[int] = None,
):
    """Per-entity inter-arrival statistics and (optionally) the
    TIME-WEIGHTED average of an integer value column — the
    irregular-sampling aggregates (sensor readings, session telemetry)
    that plain AVG gets wrong:

        gap_i  = (ts_{i+1} - ts_i) // 1e6   (whole seconds, event order)
        twa    = float(sum(v_i * gap_i)) / float(sum(gap_i))
        mean_gap = float(sum(gap_i)) / float(n - 1)

    Each value is weighted by how long it was current (the last row gets
    zero weight).  Exact int64 products/sums, one fixed float division —
    SQL twin via ``lead()`` diffs.  Entities with < 2 events (or zero
    total span, for twa) emit NULLs.  Overflow bound: |v| * max span in
    seconds * rows per entity must stay below 2^63.  One exchange.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sort_keys = [ts_us_col] + ([order_tiebreak] if order_tiebreak else [])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take_first = pa.array(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take_first) for k in keys
        }
        n_rows = t.num_rows
        n = np.diff(starts)
        n_groups = len(n)
        us = t[ts_us_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = np.zeros(n_rows, dtype=np.int64)
        if n_rows > 1:
            d[:-1] = (us[1:] - us[:-1]) // 1_000_000
        # zero out the last row of every group (the cross-group diff)
        lasts = starts[1:] - 1
        d[lasts] = 0
        w = np.add.reduceat(d, firsts) if n_rows else np.zeros(0, np.int64)
        w = np.where(n == 0, 0, w)
        n_gaps = np.maximum(n - 1, 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_gap = w.astype(np.float64) / n_gaps.astype(np.float64)
        # max gap: per-group maximum of d over the first n-1 rows; a
        # single-row group has d == 0 at its only row and is masked anyway
        max_gap = np.maximum.reduceat(d, firsts) if n_rows else np.zeros(0, np.int64)
        bad = n < 2
        cols[mean_gap_name] = pa.array(mean_gap, mask=bad)
        cols[max_gap_name] = pa.array(
            max_gap.astype(np.int64), type=pa.int64(), mask=bad
        )
        if val_col is not None:
            v = t[val_col].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            sw = np.add.reduceat(v * d, firsts) if n_rows else np.zeros(0, np.int64)
            sw = np.where(n == 0, 0, sw)
            with np.errstate(invalid="ignore", divide="ignore"):
                twa = sw.astype(np.float64) / w.astype(np.float64)
            cols[twa_name] = pa.array(twa, mask=bad | (w <= 0))
        cols[count_name] = pa.array(n.astype(np.int64))
        return pa.table(cols)

    return grouped_map(ds, keys, kernel, sort_keys=sort_keys, num_buckets=num_buckets)


def pivot_sums(
    ds,
    keys: Sequence[str],
    cat_col: str,
    val_col: str,
    categories: Sequence[str],
    *,
    prefix: str = "s_",
    num_buckets: Optional[int] = None,
):
    """One row per key group with an exact int64 SUM column per category
    (SQL ``SUM(v) FILTER (WHERE cat = ...)`` pivot — the value companion
    of :func:`pivot_counts`).  ``val_col`` must be integer (fixed point);
    NULL values add 0.  Same map-side-combined shape: per batch one wide
    row per distinct key (bincount with weights), one grouped exchange of
    the partials.
    """
    keys = list(keys)
    cats = list(categories)
    out_cols = [f"{prefix}{c}" for c in cats]
    kcount = len(cats)
    cat_arr = pa.array(cats, pa.string())

    def partial(t: pa.Table) -> pa.Table:
        code_arr = pc.index_in(t[cat_col], value_set=cat_arr)
        code_arr = code_arr.combine_chunks() if isinstance(code_arr, pa.ChunkedArray) else code_arr
        codes = code_arr.fill_null(-1).to_numpy(zero_copy_only=False)
        keep = codes >= 0
        kt = t.filter(pa.array(keep))
        codes = codes[keep]
        if kt.num_rows == 0:
            return pa.table(
                {**{k: t[k].slice(0, 0) for k in keys},
                 **{c: pa.array([], pa.int64()) for c in out_cols}}
            )
        v = kt[val_col].combine_chunks().cast(pa.int64()).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        kcodes = pd_factorize_frame(kt.select(keys).to_pandas())
        n_u = int(kcodes.max()) + 1
        sums = np.bincount(
            kcodes * kcount + codes, weights=v.astype(np.float64),
            minlength=n_u * kcount,
        )
        # float64 weights are exact to 2^53 per batch partial; re-check and
        # fall back to reduceat if a batch could overflow that
        if np.abs(sums).max(initial=0) >= 2**53:
            order = np.argsort(kcodes * kcount + codes, kind="stable")
            key_sorted = (kcodes * kcount + codes)[order]
            bounds = np.concatenate(([0], np.flatnonzero(key_sorted[1:] != key_sorted[:-1]) + 1))
            exact = np.zeros(n_u * kcount, dtype=np.int64)
            exact[key_sorted[bounds]] = np.add.reduceat(v[order], bounds)
            sums = exact
        sums = sums.reshape(n_u, kcount).astype(np.int64)
        _, first_idx = np.unique(kcodes, return_index=True)
        take = pa.array(first_idx.astype(np.int64))
        cols = {k: pc.take(kt[k].combine_chunks(), take) for k in keys}
        for j, c in enumerate(out_cols):
            cols[c] = pa.array(sums[:, j])
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sum_by(partials, keys, out_cols, num_buckets=num_buckets)


def add_group_rolling_corr(
    ds,
    key: str | Sequence[str],
    x_col: str,
    y_col: str,
    *,
    k: int,
    order_cols: Sequence[str],
    out_col: str = "rolling_corr",
    num_buckets: Optional[int] = None,
):
    """Rolling Pearson correlation of two INTEGER columns over the trailing
    ``k``-row window per entity (``ROWS k-1 PRECEDING``) — the windowed
    relationship feature (does value track the request payload lately?).

    The five window moments come from int64 prefix sums rebased at group
    starts (exact, order-independent); the float schedule is the same
    fixed ``grouped_corr`` expression, so a SQL twin built from window
    SUMs reproduces it bit-for-bit.  NULL when the window holds < 2 rows
    or either variance is 0.  Overflow: window sums of x*x etc. must stay
    below 2^63 — same bound as ``grouped_corr`` but over k rows only.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return grouped_map(
        ds, keys, rolling_corr_kernel(x_col, y_col, k, out_col),
        sort_keys=list(order_cols), num_buckets=num_buckets,
    )


def rolling_corr_kernel(x_col: str, y_col: str, k: int, out_col: str):
    """Kernel builder for `add_group_rolling_corr` — exposed so the salted
    hot-entity path (`feast_ray.stages.salt.salted_rolling_corr`) runs the
    IDENTICAL kernel; per-row lookback is k-1 rows."""
    if k < 2:
        raise ValueError("k must be >= 2")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        from feast_ray.stages.windows import rolling_rows_bounds

        n_rows = t.num_rows
        if n_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.float64()))
        x = t[x_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        ws, we = rolling_rows_bounds(n_rows, gstart, k)

        def win(v: np.ndarray) -> np.ndarray:
            P = np.concatenate(([0], np.cumsum(v)))
            return P[we] - P[ws]

        n = (we - ws).astype(np.int64)
        sx, sy = win(x), win(y)
        sxx, syy, sxy = win(x * x), win(y * y), win(x * y)
        cov = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = cov / (np.sqrt(vx) * np.sqrt(vy))
        bad = (n < 2) | (vx <= 0) | (vy <= 0)
        return t.append_column(out_col, pa.array(r, mask=bad))

    return kernel


def add_group_rolling_zscore(
    ds,
    key: str | Sequence[str],
    int_col: str,
    *,
    k: int,
    order_cols: Sequence[str],
    out_col: str = "rolling_z",
    num_buckets: Optional[int] = None,
):
    """Rolling z-score: how anomalous is the current value against the
    entity's OWN trailing ``k``-row window (window includes the current
    row — population variance, SQL-reproducible fixed schedule:

        mean = float(sx) / float(n)
        var  = float(n*sxx - sx*sx) / float(n*n)
        z    = (x - mean) / sqrt(var)       # NULL when n < 2 or var == 0

    Int64-exact window sums off rebased prefix sums; same overflow bound
    as the other moment kernels.  The per-entity anomaly-flag feature.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return grouped_map(
        ds, keys, rolling_zscore_kernel(int_col, k, out_col),
        sort_keys=list(order_cols), num_buckets=num_buckets,
    )


def rolling_zscore_kernel(int_col: str, k: int, out_col: str):
    """Kernel builder for `add_group_rolling_zscore` — exposed so the
    salted hot-entity path runs the IDENTICAL kernel; lookback k-1 rows."""
    if k < 2:
        raise ValueError("k must be >= 2")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        from feast_ray.stages.windows import rolling_rows_bounds

        n_rows = t.num_rows
        if n_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.float64()))
        x = t[int_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        ws, we = rolling_rows_bounds(n_rows, gstart, k)
        P = np.concatenate(([0], np.cumsum(x)))
        Q = np.concatenate(([0], np.cumsum(x * x)))
        n = (we - ws).astype(np.int64)
        sx = P[we] - P[ws]
        sxx = Q[we] - Q[ws]
        mean = sx.astype(np.float64) / n.astype(np.float64)
        var = (n * sxx - sx * sx).astype(np.float64) / (n * n).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (x.astype(np.float64) - mean) / np.sqrt(var)
        bad = (n < 2) | (var <= 0)
        return t.append_column(out_col, pa.array(z, mask=bad))

    return kernel


def grouped_time_weighted_avg(
    ds,
    keys: Sequence[str],
    val_col: str,
    ts_col: str,
    *,
    order_cols: Sequence[str],
    out_col: str = "twa",
    count_name: str = "n_events",
    scale: int = 100,
    num_buckets: Optional[int] = None,
):
    """Duration-weighted mean per entity over an irregular event series —
    the step-function average ("each value holds until the entity's next
    event") that plain AVG misrepresents under bursty sampling.  The
    feature-store classic for sensor levels, account balances, session
    quality held between heartbeats.  Upstream Feast declares only
    count/sum/min/max/avg/stddev (``aggregation.py::Aggregation``); this is
    the time-weighted member of that family.

    Each row is weighted by its hold time: milliseconds until the entity's
    NEXT event (floor division from microseconds — the SQL twin floors the
    same way); the entity's final event holds for 0 ms.  NULL values drop
    their interval from both numerator and denominator.  Entities with no
    positive held interval (single-event entities) emit NULL.

    Exactness: values fix-pointed to int64 via ``round(value*scale)``, hold
    times int64 ms, numerator/denominator accumulated in int64 (order-free),
    one float op chain per group: ``(numer/denom)/scale``.  Bit-exact vs
    the SQL twin.  Bounds: |numer| <= max|value|*scale * entity_span_ms —
    keep below 2^53 (one year span * 10^4 cents ~= 3e14, comfortably safe).

    Scale: one grouped exchange, O(rows) kernel, one output row per entity.
    """
    keys = list(keys)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take = pa.array(firsts)
        cols: dict[str, pa.Array] = {
            k: pc.take(t[k].combine_chunks(), take) for k in keys
        }
        n = t.num_rows
        sizes = np.diff(starts)
        cols[count_name] = pa.array(sizes.astype(np.int64))
        if n == 0:
            cols[out_col] = pa.array([], pa.float64())
            return pa.table(cols)
        tarr = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(tarr.type):
            tarr = tarr.cast(pa.timestamp("us", tz=tarr.type.tz))
        ts = tarr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.zeros(n, dtype=np.int64)
        gap[:-1] = (ts[1:] - ts[:-1]) // 1000
        ends = starts[1:][sizes > 0] - 1  # last row of each non-empty group
        gap[ends] = 0
        arr = t[val_col].combine_chunks()
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        cents = np.round(
            arr.cast(pa.float64()).fill_null(0.0).to_numpy(zero_copy_only=False)
            * scale
        ).astype(np.int64)
        w = np.where(valid, gap, 0)
        numer = np.add.reduceat(cents * w, firsts)
        denom = np.add.reduceat(w, firsts)
        numer = np.where(sizes == 0, 0, numer)
        denom = np.where(sizes == 0, 0, denom)
        empty = denom == 0
        twa = (numer / np.maximum(denom, 1)) / scale
        cols[out_col] = pa.array(twa, mask=empty)
        return pa.table(cols)

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def add_group_time_since(
    ds,
    key: str | Sequence[str],
    ts_col: str,
    cond_col: str,
    *,
    order_cols: Sequence[str],
    out_col: str = "us_since",
    num_buckets: Optional[int] = None,
):
    """Per-entity recency feature: microseconds since the entity's most
    recent STRICTLY PRIOR row where ``cond_col`` is true; NULL until the
    first qualifying row.  "Time since last purchase at every event" — the
    leakage-safe recency signal (the current row never matches itself, so a
    purchase row reports the distance to the PREVIOUS purchase).

    Kernel: qualifying row positions max-accumulated (the LOCF trick from
    ``add_group_ffill``), shifted one row; a position carried across a
    group boundary is detected against the row's own group start and
    nulled.  O(rows), no per-group Python.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        cond = (
            t[cond_col].combine_chunks().cast(pa.bool_()).fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        ar = np.arange(n, dtype=np.int64)
        acc = np.maximum.accumulate(np.where(cond, ar, -1))
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = acc[:-1]
        ok = prev >= gstart
        tarr = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(tarr.type):
            tarr = tarr.cast(pa.timestamp("us", tz=tarr.type.tz))
        ts = tarr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        delta = ts - ts[np.maximum(prev, 0)]
        return t.append_column(out_col, pa.array(delta, mask=~ok))

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def add_group_expanding_rank(
    ds,
    key: str | Sequence[str],
    val_col: str,
    *,
    order_cols: Sequence[str],
    prior_name: str = "n_prior",
    less_name: str = "n_less",
    pct_name: str = "pct_rank",
    num_buckets: Optional[int] = None,
):
    """Expanding percentile rank — where does the CURRENT value sit in the
    entity's own strictly-prior history?  Per row: ``n_prior`` = count of
    prior non-null values, ``n_less`` = prior values strictly below the
    current, ``pct_rank`` = n_less / n_prior (NULL when no prior history).
    The leakage-safe online-novelty / anomaly feature ("is this purchase
    unusually large FOR THIS USER, judged only on what was known then").
    Rows whose own value is NULL emit NULL for all three.

    Kernel: pandas grouped ``expanding().rank(method="min")`` (online
    skiplist insertion, O(n log n) per group, C implementation) gives
    1 + #{prior < current}; expanding ``count()`` gives the non-null
    prefix size.  Counts are int64 and the single float division matches
    the SQL twin bit-exactly.
    """
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            t = t.append_column(prior_name, pa.array([], type=pa.int64()))
            t = t.append_column(less_name, pa.array([], type=pa.int64()))
            return t.append_column(pct_name, pa.array([], type=pa.float64()))
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        arr = t[val_col].combine_chunks()
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        v = np.where(
            valid,
            arr.cast(pa.float64()).fill_null(0.0).to_numpy(zero_copy_only=False),
            np.nan,
        )
        g = pd.Series(v).groupby(gidx)
        # both return rows in original order (groups are contiguous and
        # ascending in gidx; expanding preserves intra-group order)
        rank_min = g.expanding().rank(method="min").to_numpy()
        cnt_incl = g.expanding().count().to_numpy()
        n_less = rank_min - 1.0
        n_prior = cnt_incl - 1.0
        bad = ~valid | np.isnan(rank_min)
        no_hist = bad | (n_prior <= 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = n_less / n_prior
        t = t.append_column(
            prior_name,
            pa.array(np.nan_to_num(n_prior).astype(np.int64), mask=bad),
        )
        t = t.append_column(
            less_name,
            pa.array(np.nan_to_num(n_less).astype(np.int64), mask=bad),
        )
        return t.append_column(pct_name, pa.array(pct, mask=no_hist))

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def add_group_cusum(
    ds,
    key: str | Sequence[str],
    int_col: str,
    *,
    order_cols: Sequence[str],
    drift: int,
    out_col: str = "cusum",
    num_buckets: Optional[int] = None,
):
    """One-sided CUSUM change-point statistic per entity, exact int64 —
    the classic drift/anomaly detector: ``S_i = max(0, S_{i-1} + x_i - k)``
    over the entity's rows in event-time order (k = ``drift``, the
    tolerated per-step reference level; alarm when S crosses a threshold
    downstream).  Feature stores ship this as "behavioral drift score".

    ``int_col`` must be integral (fixed-point upstream — same contract as
    ``add_group_zscore``), so the whole recursion stays in int64 and the
    SQL twin reproduces it EXACTLY via the prefix identity
    ``S_i = C_i - least(0, min_{j<=i} C_j)`` with ``C`` the running sum of
    (x - k): integer window SUM/MIN are order-free, no float schedule at
    all.  Kernel: one global cumsum rebased at group starts + a grouped
    cummin (pandas C path) — O(rows), no per-group Python.
    """
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)
    drift = int(drift)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        x = (
            t[int_col].combine_chunks().cast(pa.int64()).fill_null(0)
            .to_numpy(zero_copy_only=False)
        )
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        d = x - drift
        C = np.cumsum(d)
        base = np.repeat(C[starts[:-1]] - d[starts[:-1]], sizes)
        C_rel = C - base
        runmin = pd.Series(C_rel).groupby(gidx).cummin().to_numpy()
        s = C_rel - np.minimum(runmin, 0)
        return t.append_column(out_col, pa.array(s))

    return grouped_map(
        ds, keys, kernel, sort_keys=list(order_cols), num_buckets=num_buckets
    )


def grouped_entropy(
    ds,
    key: str | Sequence[str],
    cat_col: str,
    *,
    out_col: str = "entropy_bits",
    n_name: str = "n",
    types_name: str = "n_types",
    num_buckets: Optional[int] = None,
):
    """Shannon entropy (bits) of each entity's categorical mix — the
    behavioral-diversity feature ("does this user do one thing or many")
    of churn/abuse models, and the label-balance monitor of a curation
    pipeline.  SQL twin: ``SUM(-p*log2(p))`` over the per-(entity, cat)
    shares.

    Exactness: a float sum over categories is accumulation-order-dependent,
    so the kernel uses the identity ``H = log2(N) - (SUM_c c*log2(c)) / N``
    and carries each category's term as FIXED-POINT micro-bits
    (``ROUND(c*log2(c)*1e6)`` as int64, half-away rounding) — the cross-
    category SUM is then exact int64 and order-free, and the remaining
    float ops (one log2, two divides, one subtract) run in a fixed schedule
    a SQL twin reproduces bit-for-bit.  pyarrow's ``log2`` matches DuckDB's
    bitwise on this platform (both libm); numpy's does NOT — use pc here.

    Shape: one map-side-combined exchange to (entity, cat) counts, one tiny
    exchange over distinct pairs.  Raw rows are never re-shuffled.
    """
    keys = [key] if isinstance(key, str) else list(key)
    pairs = partial_count_sum(ds, keys + [cat_col], count_name="_c",
                              num_buckets=num_buckets)

    def term(t: pa.Table) -> pa.Table:
        cd = t["_c"].combine_chunks().cast(pa.float64())
        tm = pc.cast(
            pc.round(pc.multiply(pc.multiply(cd, pc.log2(cd)), 1_000_000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        cols = {k: t[k] for k in keys}
        cols["_c"] = t["_c"]
        cols["_t"] = tm
        cols["_one"] = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table(cols)

    termed = pairs.map_batches(term, batch_format="pyarrow", zero_copy_batch=True)
    sums = sum_by(termed, keys, ["_c", "_t", "_one"], num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        nd = t["_c"].combine_chunks().cast(pa.float64())
        ts = pc.cast(t["_t"].combine_chunks(), pa.float64(), safe=False)
        h = pc.subtract(
            pc.log2(nd), pc.divide(pc.divide(ts, 1_000_000.0), nd)
        )
        cols = {k: t[k] for k in keys}
        cols[n_name] = t["_c"].combine_chunks().cast(pa.int64())
        cols[types_name] = t["_one"].combine_chunks().cast(pa.int64())
        cols[out_col] = h
        return pa.table(cols)

    return sums.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def list_col_moments(
    ds,
    list_col: str,
    *,
    dim_name: str = "dim",
    scale: float = 1_000_000.0,
    num_buckets: Optional[int] = None,
):
    """Per-dimension count / exact fixed-point sum / min / max / mean over a
    ``list<float>`` column — the embedding-space health profile (dead dims,
    scale drift, outlier channels) run before training on a vector corpus.

    Each element is fixed-pointed to ``ROUND(v*scale)`` int64 (half-away,
    matching SQL ROUND), so the cross-row sums are exact and order-free.
    Per-block partials reduce each block to one row per dimension (lists are
    reshaped, so the block must carry fixed-length lists — true of any real
    embedding column; ragged input raises); the exchange then carries
    ``blocks x d`` tiny rows into a d-group reduce.  ``dim`` is 1-based to
    match SQL ``generate_subscripts``.  Mean is ``(s/scale)/n`` in a fixed
    float schedule.
    """
    def partial(t: pa.Table) -> pa.Table:
        empty = {
            dim_name: pa.array([], pa.int64()),
            "_n": pa.array([], pa.int64()),
            "_s": pa.array([], pa.int64()),
            "_mn": pa.array([], pa.int64()),
            "_mx": pa.array([], pa.int64()),
        }
        if t.num_rows == 0:
            return pa.table(empty)
        arr = t[list_col].combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        n_rows = len(arr)
        if n_rows == 0:
            return pa.table(empty)
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError(f"{list_col} is ragged; moments need fixed-length lists")
        flat = pc.list_flatten(arr).cast(pa.float64())
        micro = (
            pc.cast(
                pc.round(pc.multiply(flat, scale),
                         round_mode="half_towards_infinity"),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .reshape(n_rows, d)
        )
        return pa.table({
            dim_name: pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "_n": pa.array(np.full(d, n_rows, np.int64)),
            "_s": pa.array(micro.sum(axis=0, dtype=np.int64)),
            "_mn": pa.array(micro.min(axis=0)),
            "_mx": pa.array(micro.max(axis=0)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        take = pa.array(firsts)
        n = t["_n"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["_s"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = t["_mn"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = t["_mx"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(n):
            N = np.add.reduceat(n, firsts).astype(np.int64)
            S = np.add.reduceat(s, firsts).astype(np.int64)
            MN = np.minimum.reduceat(mn, firsts)
            MX = np.maximum.reduceat(mx, firsts)
        else:
            N = S = MN = MX = np.zeros(0, np.int64)
        mean = pc.divide(
            pc.divide(pa.array(S.astype(np.float64)), scale),
            pa.array(N.astype(np.float64)),
        )
        return pa.table({
            dim_name: pc.take(t[dim_name].combine_chunks(), take),
            "n": pa.array(N),
            "s_micro": pa.array(S),
            "min_micro": pa.array(MN.astype(np.int64)),
            "max_micro": pa.array(MX.astype(np.int64)),
            "mean_v": mean,
        })

    return grouped_map(partials, [dim_name], reduce_kernel, num_buckets=num_buckets)


def ks_two_sample(
    ds,
    val_col: str,
    group_col: str,
    a,
    b,
    *,
    num_buckets: Optional[int] = None,
) -> pa.Table:
    """Exact two-sample Kolmogorov-Smirnov statistic between the ``val_col``
    distributions of groups ``a`` and ``b`` — the distribution-shift test
    between two corpus feeds / eras (doc lengths by source, values by
    cohort).  One-row output: ``n_a, n_b, ks_stat``.

    Exactness: the KS supremum occurs at data values, and
    ``|F_a - F_b| = |c_a*n_b - c_b*n_a| / (n_a*n_b)`` — the numerator is
    pure int64 over cumulative counts, so the max is exact and the single
    float division is schedule-fixed.  Work shape: rows fold to per-batch
    (value, group) count partials, ONE grouped exchange reduces them, and
    the driver walks the DISTINCT-VALUE domain (bounded — lengths, cents,
    scores; not row count) for the cumulative max.  ``val_col`` must be
    integer-valued.
    """
    av, bv = a, b

    def filt(t: pa.Table) -> pa.Table:
        g = t[group_col]
        keep = pc.or_(pc.equal(g, av), pc.equal(g, bv))
        t = t.filter(keep)
        return pa.table({
            "v": t[val_col].combine_chunks().cast(pa.int64()),
            "g": t[group_col],
        })

    counts = partial_count_sum(
        ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True),
        ["v", "g"], count_name="c", num_buckets=num_buckets,
    ).take_all()  # bounded: distinct values x 2
    if not counts:
        raise ValueError("ks_two_sample: no rows in either group")
    vals = sorted({int(r["v"]) for r in counts})
    vi = {v: i for i, v in enumerate(vals)}
    ca = np.zeros(len(vals), np.int64)
    cb = np.zeros(len(vals), np.int64)
    for r in counts:
        (ca if r["g"] == av else cb)[vi[int(r["v"])]] = int(r["c"])
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        raise ValueError("ks_two_sample: one group is empty")
    m = int(np.abs(np.cumsum(ca) * nb - np.cumsum(cb) * na).max())
    ks = float(m) / (float(na) * float(nb))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "ks_stat": pa.array([ks], pa.float64()),
    })


def grouped_geomean(
    ds,
    key: str | Sequence[str],
    val_col: str,
    *,
    out_col: str = "geomean",
    n_name: str = "n",
    num_buckets: Optional[int] = None,
):
    """Geometric mean of a POSITIVE integer fixed-point column per entity —
    the right average for multiplicative / heavy-tailed quantities (spend,
    latencies, ratios) where the arithmetic mean is outlier-dominated.
    SQL twin: ``exp(avg(ln(v)))``.

    Exactness (same fixed-point discipline as ``grouped_entropy``): each
    row's ``ln(v)`` is fixed-pointed to micro-nats int64 (half-away ROUND),
    the per-entity sum rides the map-side-combined count/sum exchange
    exactly, and the final ``exp((s/1e6)/n)`` runs via pyarrow kernels —
    pc.ln/pc.exp are bit-identical to DuckDB's ln/exp on this platform.
    Caller filters non-positive rows (ln domain), matching the SQL twin's
    WHERE.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def term(t: pa.Table) -> pa.Table:
        v = t[val_col].combine_chunks().cast(pa.float64())
        tm = pc.cast(
            pc.round(pc.multiply(pc.ln(v), 1_000_000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        cols = {k: t[k] for k in keys}
        cols["_t"] = tm
        return pa.table(cols)

    termed = ds.map_batches(term, batch_format="pyarrow", zero_copy_batch=True)
    sums = partial_count_sum(termed, keys, "_t", count_name=n_name, sum_name="_s",
                             num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        nd = t[n_name].combine_chunks().cast(pa.float64())
        sd = pc.cast(t["_s"].combine_chunks(), pa.float64(), safe=False)
        g = pc.exp(pc.divide(pc.divide(sd, 1_000_000.0), nd))
        cols = {k: t[k] for k in keys}
        cols[n_name] = t[n_name].combine_chunks().cast(pa.int64())
        cols[out_col] = g
        return pa.table(cols)

    return sums.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def list_col_covariance(
    ds,
    list_col: str,
    *,
    scale: float = 1_000_000.0,
    num_buckets: Optional[int] = None,
):
    """Distributed population covariance matrix (upper triangle) of a
    ``list<float>`` column — the whitening / PCA-prep primitive of an
    embedding pipeline (a d x d summary no matter the corpus size).

    Shape: each block reduces to ONE exact int64 Gram matrix via the
    augmented-matrix trick — prepend a constant-1 column, then
    ``A^T A`` simultaneously carries n (cell 0,0), the per-dim sums
    (row 0) and all cross sums — emitted as (d+1)(d+2)/2 upper-triangle
    rows.  One tiny grouped exchange sums the partials; the (0,*) row
    (d+1 ints) folds on the driver and broadcasts into the final map.
    Values are fixed-pointed to ``ROUND(v*scale)`` so every sum is exact
    and order-free; overflow bound: ``n * (scale*|v|_max)^2 < 2^63``
    (drop ``scale`` for larger corpora; exactness degrades gracefully to
    the chosen fixed-point grid).  ``cov = ((sxy - si*sj/n)/n)/scale^2``
    in a fixed float schedule.  Dims are 1-based (SQL
    ``generate_subscripts``).
    """
    def partial(t: pa.Table) -> pa.Table:
        empty = {
            "i": pa.array([], pa.int64()),
            "j": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
        if t.num_rows == 0:
            return pa.table(empty)
        arr = t[list_col].combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        n_rows = len(arr)
        if n_rows == 0:
            return pa.table(empty)
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError(f"{list_col} is ragged; covariance needs fixed-length lists")
        flat = pc.list_flatten(arr).cast(pa.float64())
        micro = (
            pc.cast(
                pc.round(pc.multiply(flat, scale),
                         round_mode="half_towards_infinity"),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .reshape(n_rows, d)
        )
        a = np.concatenate([np.ones((n_rows, 1), np.int64), micro], axis=1)
        g = a.T @ a  # exact int64 Gram
        iu, ju = np.triu_indices(d + 1)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "s": pa.array(g[iu, ju]),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    sums = sum_by(partials, ["i", "j"], ["s"], num_buckets=num_buckets).materialize()

    # row 0 of the Gram: n and the per-dim sums — d+1 ints, driver-bounded
    head = sums.map_batches(
        lambda t: t.filter(pc.equal(t["i"], 0)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    n = next(int(r["s"]) for r in head if int(r["j"]) == 0)
    dim_sum = {int(r["j"]): int(r["s"]) for r in head if int(r["j"]) > 0}
    if n == 0:
        raise ValueError("list_col_covariance: empty input")
    sc2 = scale * scale

    def final(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["i"], 1))
        i = t["i"].combine_chunks().to_numpy(zero_copy_only=False)
        j = t["j"].combine_chunks().to_numpy(zero_copy_only=False)
        sxy = pc.cast(t["s"].combine_chunks(), pa.float64(), safe=False)
        si = pa.array(np.array([dim_sum[x] for x in i], np.float64))
        sj = pa.array(np.array([dim_sum[x] for x in j], np.float64))
        nd = float(n)
        cov = pc.divide(
            pc.divide(pc.subtract(sxy, pc.divide(pc.multiply(si, sj), nd)), nd),
            sc2,
        )
        return pa.table({
            "dim_a": pa.array(i), "dim_b": pa.array(j),
            "n": pa.array(np.full(len(i), n, np.int64)),
            "cov": cov,
        })

    return sums.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


TWO_PI = 6.283185307179586


def grouped_circular_time(
    ds,
    key: str | Sequence[str],
    ts_col: str,
    *,
    period_us: int = 86_400_000_000,
    num_buckets: Optional[int] = None,
):
    """Circular statistics of event time-of-day per entity: the resultant
    length R in [0,1] ("how concentrated is this user's activity around one
    time of day" — 1 = always the same instant, 0 = uniform) and the mean
    angle (radians, atan2 convention) — the right way to average a cyclic
    quantity, where the arithmetic mean of hours is meaningless across
    midnight.

    Exactness: per-row sin/cos terms are fixed-pointed to micro units
    (libm sin/cos/atan2/sqrt are bit-identical between pyarrow and DuckDB
    on this platform; ROUND half-away matches), per-entity sums ride the
    map-side-combined exchange exactly, and the final R/angle run in a
    fixed float schedule.  Output: keys, n, resultant_r, mean_angle.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def term(t: pa.Table) -> pa.Table:
        arr = t[ts_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.timestamp("us"))
        us = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        frac = pa.array((us % period_us).astype(np.float64))
        theta = pc.divide(pc.multiply(frac, TWO_PI), float(period_us))
        fp = lambda a: pc.cast(
            pc.round(pc.multiply(a, 1_000_000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        cols = {k: t[k] for k in keys}
        cols["_s"] = fp(pc.sin(theta))
        cols["_c"] = fp(pc.cos(theta))
        cols["_one"] = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table(cols)

    termed = ds.map_batches(term, batch_format="pyarrow", zero_copy_batch=True)
    sums = sum_by(termed, keys, ["_s", "_c", "_one"], num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        sd = pc.divide(pc.cast(t["_s"].combine_chunks(), pa.float64(), safe=False), 1_000_000.0)
        cd = pc.divide(pc.cast(t["_c"].combine_chunks(), pa.float64(), safe=False), 1_000_000.0)
        nd = pc.cast(t["_one"], pa.float64())
        r = pc.divide(
            pc.sqrt(pc.add(pc.multiply(sd, sd), pc.multiply(cd, cd))), nd
        )
        ang = pc.atan2(sd, cd)
        cols = {k: t[k] for k in keys}
        cols["n"] = t["_one"].combine_chunks().cast(pa.int64())
        cols["resultant_r"] = r
        cols["mean_angle"] = ang
        return pa.table(cols)

    return sums.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def pca_project(
    ds,
    list_col: str,
    *,
    id_col: str,
    n_components: int = 2,
    scale: float = 1_000_000.0,
    num_buckets: Optional[int] = None,
):
    """Distributed PCA projection: covariance via
    :func:`list_col_covariance` (per-block exact Gram partials), a d x d
    eigendecomposition ON THE DRIVER (d is the embedding width — constant,
    never corpus-sized), then a stateless broadcast projection pass
    emitting the top ``n_components`` coordinates per row — the dimension-
    reduction / visualization / whitening step of an embedding pipeline.

    Determinism: eigenvectors are sign-fixed (largest-magnitude entry
    positive, ties to the lower index) so the output is reproducible on
    any cluster shape.  No SQL twin exists (eigendecomposition is not
    SQL-expressible); parity is pinned by a numpy twin in
    ``tests/test_wave14_ops.py``.
    """
    cov_rows = list_col_covariance(
        ds, list_col, scale=scale, num_buckets=num_buckets
    ).take_all()  # d(d+1)/2 rows — bounded by the embedding width
    d = max(int(r["dim_b"]) for r in cov_rows)
    cov = np.zeros((d, d))
    for r in cov_rows:
        i, j = int(r["dim_a"]) - 1, int(r["dim_b"]) - 1
        cov[i, j] = cov[j, i] = float(r["cov"])
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order]  # (d, k)
    # sign convention: largest-|entry| positive
    for c in range(comps.shape[1]):
        a = comps[:, c]
        if a[np.argmax(np.abs(a))] < 0:
            comps[:, c] = -a
    evr = w[order] / max(w.sum(), 1e-300)

    import ray

    comps_ref = ray.put(comps)

    def project(t: pa.Table) -> pa.Table:
        p = ray.get(comps_ref)
        arr = t[list_col].combine_chunks()
        n_rows = len(arr)
        cols = {id_col: t[id_col]}
        if n_rows == 0:
            for c in range(p.shape[1]):
                cols[f"pc{c + 1}"] = pa.array([], pa.float64())
            return pa.table(cols)
        x = (
            pc.list_flatten(arr).cast(pa.float64())
            .to_numpy(zero_copy_only=False).reshape(n_rows, -1)
        )
        y = x @ p
        for c in range(p.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(y[:, c])
        return pa.table(cols)

    out = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return out, evr
