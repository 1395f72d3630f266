"""Deterministic sampling (O4).

Upstream Feast has no core sampling operator (SURVEY §2.6 O4 —
``ds.random_sample`` would cover the nondeterministic case); at 100 TB a
REPRODUCIBLE sample matters more: re-runs, resumed partitions and
downstream audits must all see the same rows.  So the primary operator is
hash-Bernoulli: keep a row iff ``mix64(key) % den < num``.  The mixer is
the splitmix-style multiply used across the engine, chosen because it is
also expressible in ANSI SQL (HUGEINT split-multiply — see the DuckDB
twin in ``pipelines.queries``), making the sample driver-checkable.

Embarrassingly parallel: one ``map_batches`` filter, no shuffle, no state.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MIX = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """(x * MIX) mod 2^64 — uint64 wraparound multiply."""
    return x.astype(np.uint64) * MIX


def hash_sample(ds, *, key_col: str, percent: int, modulus: int = 100):
    """Deterministic ~``percent/modulus`` Bernoulli sample keyed on an
    integer column.  Same input ⇒ same sample, on any cluster shape."""
    if not (0 <= percent <= modulus):
        raise ValueError("percent must be in [0, modulus]")

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (mix64(k) % np.uint64(modulus)) < np.uint64(percent)
        return t.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds,
    *,
    group_keys,
    key_col: str,
    k: int,
    rank_col: str = "sample_rank",
    num_buckets=None,
):
    """Deterministic fixed-size per-group sample: the ``k`` rows with the
    largest ``mix64(key)`` per group (SQL ``ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY hv DESC) <= k``), rank 1 = largest.

    The per-group analog of :func:`hash_sample` — stratification caps every
    group at ``k`` rows regardless of skew, which is what training-data
    pipelines need for per-source / per-entity quota sampling.  The mixer is
    a mod-2^64 bijection, so ranks are total (no ties) and the sample is
    identical on any cluster shape.  One grouped exchange; the tail-k
    selection is the vectorized multi-group kernel shared with
    latest/top-k-per-entity.
    """
    from feast_ray.stages.latest import topk_per_entity

    group_keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__hv", pa.array([], type=pa.uint64()))
        kv = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__hv", pa.array(mix64(kv)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    out = topk_per_entity(
        tagged,
        keys=group_keys,
        ts_col="__hv",
        k=k,
        rank_col=rank_col,
        num_buckets=num_buckets,
    )
    return out.drop_columns(["__hv"])


def weighted_mix_sample(
    ds,
    *,
    group_col: str,
    key_col: str,
    percents: dict,
    default_percent: int,
    modulus: int = 100,
):
    """Deterministic corpus mixing: keep each row with a per-group rate
    (``percents[group]``/``modulus``, else ``default_percent``) decided by
    the same bijective mixer as :func:`hash_sample` — the dataset-reweighting
    step of LLM corpus assembly (upweight one language/source, downsample
    another) made reproducible on any cluster shape and SQL-checkable.

    Embarrassingly parallel: the per-row threshold comes from a
    dictionary-encode + lookup over the (small) distinct group values of
    the batch; no shuffle, no state.
    """
    for g, p in percents.items():
        if not (0 <= p <= modulus):
            raise ValueError(f"percent for {g!r} must be in [0, {modulus}]")
    if not (0 <= default_percent <= modulus):
        raise ValueError("default_percent out of range")

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        enc = t[group_col].combine_chunks().dictionary_encode()
        thresholds = np.array(
            [percents.get(v.as_py(), default_percent) for v in enc.dictionary],
            dtype=np.uint64,
        )
        per_row = thresholds[enc.indices.to_numpy(zero_copy_only=False)]
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (mix64(k) % np.uint64(modulus)) < per_row
        return t.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def epoch_shuffle_index(
    ds,
    *,
    key_col: str,
    pos_name: str = "shuffle_pos",
    bucket_bits: int = 12,
    keep_cols: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
):
    """Deterministic global training-epoch shuffle with REPRODUCIBLE
    positions: every row gets its 0-based rank in ``mix64(key)`` order —
    the same permutation on any cluster shape, any block layout, any run
    (``mix64`` is an odd-constant wraparound multiply, a bijection of the
    uint64 space, so distinct keys never tie).

    Distributed zipWithIndex by RANGE partitioning on the hash: the top
    ``bucket_bits`` of the hash make contiguous hash-range buckets, pass 1
    counts rows per bucket (<= 2^bucket_bits driver ints — O(1) state),
    pass 2 exchanges rows by bucket and assigns ``global_offset[bucket] +
    local_rank`` off the exchange's sorted groups.  Two passes over the
    input, no global sort operator, no driver materialization of rows.
    """
    import ray

    from feast_ray.grouped import grouped_map

    if not 1 <= bucket_bits <= 20:
        raise ValueError("bucket_bits must be in [1, 20]")
    HB, BK = "__es_hvs", "__es_b"
    shift = np.uint64(64 - bucket_bits)
    bias = np.uint64(1) << np.uint64(63)

    def tag(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        hv = mix64(k)
        # order-preserving uint64 -> int64 (bias flip) so the exchange's
        # local sort on an int64 column follows unsigned hash order
        hvs = (hv ^ bias).view(np.int64)
        b = (hv >> shift).astype(np.int64)
        t = t.append_column(HB, pa.array(hvs))
        return t.append_column(BK, pa.array(b))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def hist(t: pa.Table) -> pa.Table:
        b = t[BK].combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(vals), "c": pa.array(cnts.astype(np.int64))})

    parts = tagged.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.groupby("b").sum("c").to_pandas()  # <= 2^bucket_bits rows
    n_b = 1 << bucket_bits
    counts = np.zeros(n_b, dtype=np.int64)
    counts[agg["b"].to_numpy(dtype=np.int64)] = agg["sum(c)"].to_numpy(dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    off_ref = ray.put(offsets)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        offs = ray.get(off_ref)
        n = t.num_rows
        if n == 0:
            out = t.drop_columns([HB, BK])
            return out.append_column(pos_name, pa.array([], type=pa.int64()))
        b = t[BK].combine_chunks().to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        pos = offs[b] + (np.arange(n, dtype=np.int64) - gstart)
        out = t.drop_columns([HB, BK])
        return out.append_column(pos_name, pa.array(pos))

    out = grouped_map(
        tagged, [BK], kernel, sort_keys=[HB, key_col], num_buckets=num_buckets,
        drop_bucket=True,
    )
    if keep_cols is not None:
        out = out.select_columns(list(keep_cols) + [pos_name])
    return out


def kanon_filter(
    ds,
    quasi_keys: Sequence[str],
    k: int,
    *,
    mode: str = "keep",
    num_buckets: Optional[int] = None,
):
    """k-anonymity filter over quasi-identifier columns: ``mode="keep"``
    retains only rows whose quasi-identifier tuple occurs in >= k rows
    (every surviving row hides among k-1 others); ``mode="drop"`` returns
    the violating remainder for audit.  The privacy-scrubbing gate a
    training corpus passes before release (SQL ``COUNT(*) OVER
    (PARTITION BY ...) >= k``).

    One grouped exchange on the quasi-identifier tuple; group sizes are
    the exchange's boundary diffs, the filter is one boolean repeat.
    """
    from feast_ray.grouped import grouped_map

    if k < 1:
        raise ValueError("k must be >= 1")
    if mode not in ("keep", "drop"):
        raise ValueError(f"mode must be 'keep' or 'drop', got {mode!r}")
    want_big = mode == "keep"

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        sizes = np.diff(starts)
        big = np.repeat(sizes >= k, sizes)
        return t.filter(pa.array(big if want_big else ~big))

    return grouped_map(ds, list(quasi_keys), kernel, num_buckets=num_buckets)


def upsample_mix(
    ds,
    *,
    group_col: str,
    key_col: str,
    factors: dict,
    default_times100: int = 100,
    copy_name: str = "copy_idx",
    modulus: int = 100,
):
    """Deterministic FRACTIONAL upsampling for corpus mixing — the
    complement of :func:`weighted_mix_sample` when a group must be seen
    MORE than once per epoch (upweight a rare language/source x2.5):
    each row is emitted ``floor(f)`` times plus one more iff
    ``mix64(key) % modulus < frac*modulus`` — reproducible on any cluster
    shape, SQL-checkable via the HUGEINT mixer.  ``factors`` maps group
    value -> integer ``f*100`` (250 = x2.5); rows may be dropped entirely
    (``f*100 < 100`` behaves like Bernoulli keep).  Output appends
    ``copy_name`` (0-based copy ordinal) so downstream shuffles can
    distinguish repeats.  Embarrassingly parallel: one dictionary-encode
    lookup + one vectorized repeat per batch, no shuffle.
    """
    for g, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for {g!r} must be >= 0")
    if default_times100 < 0:
        raise ValueError("default_times100 must be >= 0")

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(copy_name, pa.array([], pa.int64()))
        enc = t[group_col].combine_chunks().dictionary_encode()
        f100 = np.array(
            [factors.get(v.as_py(), default_times100) for v in enc.dictionary],
            dtype=np.int64,
        )
        per_row = f100[enc.indices.to_numpy(zero_copy_only=False)]
        base = per_row // modulus
        frac = per_row % modulus
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        extra = (mix64(k) % np.uint64(modulus)).astype(np.int64) < frac
        rep = base + extra
        total = int(rep.sum())
        idx = np.repeat(np.arange(n, dtype=np.int64), rep)
        offs = np.repeat(np.cumsum(rep) - rep, rep)
        copy_idx = np.arange(total, dtype=np.int64) - offs
        out = t.take(pa.array(idx))
        return out.append_column(copy_name, pa.array(copy_idx))

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def weighted_reservoir_sample(
    ds,
    *,
    key_col: str,
    weight_col: str,
    n: int,
    seed_mult: int = 1,
):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES): each row draws the exponential key ``ln(u)/w`` from a
    uniform ``u`` derived bijectively from its id via the engine's
    splitmix mixer, and the ``n`` largest keys are the sample — inclusion
    probability proportional to weight, reproducible on any cluster shape
    (no RNG state, no driver coordination), and replayable in SQL with the
    HUGEINT mixer.  Rows with weight <= 0 are excluded (they cannot be
    sampled under proportional-to-weight semantics).

    Distribution: the key is one vectorized map; selection is per-batch
    local top-n then one n-row global sorted head — candidate volume
    reaching the sort is ``n`` per batch, never the corpus.
    """
    if n <= 0:
        raise ValueError("n must be positive")

    def key_batch(t: pa.Table) -> pa.Table:
        ids = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        w = (
            t[weight_col]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        m = mix64(ids.astype(np.uint64) * np.uint64(seed_mult)) >> np.uint64(11)
        u = (m.astype(np.float64) + 0.5) / 9007199254740992.0  # (0, 1), 2^53
        with np.errstate(divide="ignore"):
            key = np.log(u) / w
        t = t.append_column("__skey", pa.array(key))
        keep = pa.array(w > 0)
        t = t.filter(keep)
        if t.num_rows > n:  # local top-n: only n rows per batch reach the sort
            import pyarrow.compute as pc

            t = t.take(pc.select_k_unstable(t, n, sort_keys=[("__skey", "descending")]))
        return t

    from feast_ray.grouped import sorted_head

    top = sorted_head(
        ds.map_batches(key_batch, batch_format="pyarrow", zero_copy_batch=True),
        ["__skey"],
        [True],
        n,
    )
    return top.drop_columns(["__skey"])


def time_split(
    ds,
    *,
    ts_col: str = "ts",
    train_frac_pct: int = 80,
    embargo_us: int = 86_400_000_000,
    split_col: str = "split",
):
    """Leakage-safe chronological train/test split with a purge embargo
    (the financial-ML "purged" split, and the right default for any
    time-dependent target): rows in the first ``train_frac_pct`` percent of
    the GLOBAL time span are ``train``; the ``embargo_us`` microseconds
    after the cutoff are ``embargo`` (dropped by trainers — they straddle
    label horizons); the rest is ``test``.  The constructive counterpart of
    the temporal-leakage audit: instead of flagging leaks, it makes them
    impossible by construction.

    All arithmetic is integer microseconds (cutoff = tmin +
    (span * pct) // 100), so the labels are exact and cluster-shape-free.
    Global extrema come from one-row-per-block partials (driver folds a
    blocks-sized list of ints); the labeling pass is stateless map_batches
    with the two cutoffs closed over — nothing corpus-sized leaves the
    object store.
    """
    src = ds.materialize()

    def _us(col: pa.ChunkedArray) -> pa.ChunkedArray:
        arr = col.combine_chunks()
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.timestamp("us"))
        return arr.cast(pa.int64())

    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        us = _us(t[ts_col])
        return pa.table({"mn": pa.array([pc.min(us).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(us).as_py()], pa.int64())})

    rows = src.map_batches(
        extrema, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not rows:
        raise ValueError("time_split: empty input")
    tmin = min(int(r["mn"]) for r in rows)
    tmax = max(int(r["mx"]) for r in rows)
    train_end = tmin + ((tmax - tmin) * train_frac_pct) // 100
    embargo_end = train_end + embargo_us

    def label(t: pa.Table) -> pa.Table:
        us = _us(t[ts_col]).to_numpy(zero_copy_only=False)
        lab = np.where(
            us <= train_end, "train", np.where(us <= embargo_end, "embargo", "test")
        )
        return t.append_column(split_col, pa.array(lab, pa.string()))

    return src.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


def entity_split(
    ds,
    *,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    modulus: int = 100,
    split_col: str = "split",
):
    """Group-aware deterministic train/val/test assignment: every row of an
    entity lands in the SAME split (``mix64(key) % modulus`` thresholds),
    so no entity leaks across splits — the complement of the chronological
    ``time_split`` (that one stops time leakage; this one stops entity
    leakage).  Stateless vectorized map, reproducible on any cluster shape,
    SQL-replayable via the HUGEINT split-multiply mixer.
    """
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= modulus):
        raise ValueError("invalid split percentages")

    def tag(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        hv = (mix64(k) % np.uint64(modulus)).astype(np.int64)
        lab = np.where(
            hv < train_pct, "train", np.where(hv < train_pct + val_pct, "val", "test")
        )
        return t.append_column(split_col, pa.array(lab, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
