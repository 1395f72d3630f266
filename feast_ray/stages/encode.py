"""Categorical feature encodings — the tabular-ML prep operators a
training-data pipeline runs after the behavioral aggregates: leave-one-out
target encoding, frequency encoding, per-entity equal-frequency bucketing
(NTILE within partition), within-entity activity shares, and deterministic
negative sampling for implicit-feedback training sets.

Upstream Feast expresses none of these as core operators (they live in
user-side transformation UDFs, ``on_demand_feature_view`` docs); here each
is a first-class distributed stage with an exact SQL twin.

Exactness contract (house rule, see ``pipelines/queries.py`` module
docstring): every mean/share is ONE float64 division of exactly-equal
int64 operands, so Ray and the SQL oracle agree bitwise regardless of
accumulation order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map, starts_to_group_index
from feast_ray.stages.sampling import mix64


def target_encode(
    ds,
    *,
    key_col: str,
    cents_col: str,
    freq_name: str = "freq",
    loo_name: str = "loo_mean_cents",
    smoothing_m: Optional[float] = None,
    smooth_name: str = "smooth_mean_cents",
    num_buckets: Optional[int] = None,
):
    """Leave-one-out mean target encoding + frequency encoding of a
    categorical column: every row gets (a) the category's total row count
    and (b) the mean of ``cents_col`` over the category's OTHER rows —
    the standard leakage-safe way to turn a high-signal categorical into
    a numeric feature.

    Distribution: one map-side-combined pass computes the per-category
    ``(count(*), count(cents), sum(cents))`` triple; the combined stats
    (one row per DISTINCT category — a categorical domain, bounded by
    assumption) are collected and broadcast into a second stateless map
    over the input.  The raw data is scanned twice but never shuffled.
    For an unbounded key domain use a co-partitioned join instead — this
    stage asserts the domain stays under ``max_categories``.

    LOO semantics (matches the SQL twin):
      - row's cents NULL      -> plain category mean (sum / n_nonnull),
                                 NULL when the category has no non-NULL;
      - non-NULL, n_nonnull=1 -> NULL (no other rows to average);
      - else                  -> (sum - cents) / (n_nonnull - 1).

    ``smoothing_m`` additionally emits the m-estimate (Bayesian-smoothed)
    encoding ``(sum + m * prior) / (n_nonnull + m)`` where ``prior`` is
    the global mean over non-NULL targets — the rare-category-robust
    variant; fixed float schedule (one prior division, one multiply, one
    add, one divide), NULL when the corpus has no non-NULL target.
    """
    from feast_ray.stages.stats import sum_by

    max_categories = 100_000  # broadcast-dict ceiling (~ a few MB)

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t[key_col].combine_chunks()
        if n == 0:
            return pa.table(
                {
                    key_col: key.slice(0, 0),
                    "__na": pa.array([], pa.int64()),
                    "__nv": pa.array([], pa.int64()),
                    "__s": pa.array([], pa.int64()),
                }
            )
        enc = key.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        c_arr = t[cents_col].combine_chunks()
        valid = pc.is_valid(c_arr).to_numpy(zero_copy_only=False)
        c = c_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        na = np.bincount(codes, minlength=k).astype(np.int64)
        nv = np.bincount(codes[valid], minlength=k).astype(np.int64)
        s = np.zeros(k, dtype=np.int64)
        np.add.at(s, codes[valid], c[valid])
        return pa.table(
            {
                key_col: enc.dictionary,
                "__na": pa.array(na),
                "__nv": pa.array(nv),
                "__s": pa.array(s),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    stats = sum_by(partials, [key_col], ["__na", "__nv", "__s"], num_buckets=num_buckets)
    rows = stats.take_all()  # one row per distinct category — bounded domain
    if len(rows) > max_categories:
        raise ValueError(
            f"target_encode: {len(rows)} categories exceeds the broadcast "
            f"ceiling {max_categories}; use a co-partitioned join variant"
        )
    lut = {r[key_col]: (int(r["__na"]), int(r["__nv"]), int(r["__s"])) for r in rows}
    g_nv = sum(v[1] for v in lut.values())
    g_s = sum(v[2] for v in lut.values())
    prior = float(g_s) / float(g_nv) if g_nv > 0 else None

    def apply(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            t = t.append_column(freq_name, pa.array([], pa.int64()))
            t = t.append_column(loo_name, pa.array([], pa.float64()))
            if smoothing_m is not None:
                t = t.append_column(smooth_name, pa.array([], pa.float64()))
            return t
        enc = t[key_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        trip = np.array(
            [lut[v.as_py()] for v in enc.dictionary], dtype=np.int64
        ).reshape(-1, 3)
        na = trip[codes, 0]
        nv = trip[codes, 1]
        s = trip[codes, 2]
        c_arr = t[cents_col].combine_chunks()
        valid = pc.is_valid(c_arr).to_numpy(zero_copy_only=False)
        c = c_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        num = np.where(valid, s - c, s)
        den = np.where(valid, nv - 1, nv)
        with np.errstate(invalid="ignore", divide="ignore"):
            loo = num.astype(np.float64) / den.astype(np.float64)
        t = t.append_column(freq_name, pa.array(na))
        t = t.append_column(loo_name, pa.array(loo, mask=den <= 0))
        if smoothing_m is not None:
            if prior is None:
                t = t.append_column(smooth_name, pa.nulls(n, type=pa.float64()))
            else:
                sm = (s.astype(np.float64) + smoothing_m * prior) / (
                    nv + smoothing_m
                )
                t = t.append_column(smooth_name, pa.array(sm))
        return t

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def group_ntile(
    ds,
    *,
    keys: str | Sequence[str],
    val_col: str,
    k: int,
    tie_cols: Sequence[str] = (),
    tile_name: str = "ntile",
    num_buckets: Optional[int] = None,
):
    """SQL ``NTILE(k) OVER (PARTITION BY keys ORDER BY val_col, *tie_cols)``
    — per-entity equal-frequency bucketing (within-user value quartiles
    etc.), the per-partition analog of the global
    ``stages.stats.global_order_index`` NTILE.  One grouped exchange; the
    tile comes from the group-rebased rank with SQL's first-(n mod k)-
    tiles-get-the-extra-row rule, fully vectorized.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if k < 1:
        raise ValueError("k must be >= 1")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return t.append_column(tile_name, pa.array([], pa.int64()))
        sizes = np.diff(starts)
        rank = np.arange(n_rows, dtype=np.int64) - np.repeat(starts[:-1], sizes)
        n = np.repeat(sizes, sizes)
        q, r = n // k, n % k
        big = r * (q + 1)  # rows living in the (q+1)-sized leading tiles
        tile = np.where(
            rank < big,
            rank // np.maximum(q + 1, 1),
            r + (rank - big) // np.maximum(q, 1),
        ) + 1
        return t.append_column(tile_name, pa.array(tile.astype(np.int64)))

    return grouped_map(
        ds, keys, kernel, sort_keys=[val_col, *tie_cols], num_buckets=num_buckets
    )


def share_of_entity(
    ds,
    *,
    key: str,
    sub_key: str,
    count_name: str = "n",
    share_name: str = "share",
    num_buckets: Optional[int] = None,
):
    """Per (entity, category): row count and its share of the entity's
    total — the "what fraction of this user's activity is purchases"
    behavioral-mix feature.  SQL twin: ``CAST(COUNT(*) AS DOUBLE) /
    SUM(COUNT(*)) OVER (PARTITION BY key)``.

    Map-side combine (per-batch distinct ``(key, sub_key)`` partial counts)
    then ONE grouped exchange on ``key`` whose kernel folds the partials
    per category run and divides by the entity total — share is one
    float64 division of exact int64 counts.
    """

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key_a = t[key].combine_chunks()
        sub_a = t[sub_key].combine_chunks()
        if n == 0:
            return pa.table(
                {key: key_a.slice(0, 0), sub_key: sub_a.slice(0, 0),
                 "__n": pa.array([], pa.int64())}
            )
        ki = key_a.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        si = sub_a.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_sub = int(si.max()) + 1
        pack = ki * n_sub + si
        order = np.argsort(pack, kind="stable")
        sp = pack[order]
        bounds = np.concatenate(([0], np.flatnonzero(sp[1:] != sp[:-1]) + 1))
        firsts = order[bounds]
        cnt = np.diff(np.concatenate((bounds, [n])))
        take = pa.array(firsts)
        return pa.table(
            {
                key: pc.take(key_a, take),
                sub_key: pc.take(sub_a, take),
                "__n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return pa.table(
                {
                    key: t[key].combine_chunks().slice(0, 0),
                    sub_key: t[sub_key].combine_chunks().slice(0, 0),
                    count_name: pa.array([], pa.int64()),
                    share_name: pa.array([], pa.float64()),
                }
            )
        cnt = t["__n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        gidx = starts_to_group_index(starts)
        totals = np.add.reduceat(cnt, starts[:-1])
        # category runs inside each (sorted-by-sub_key) group
        sub_a = t[sub_key].combine_chunks()
        codes = sub_a.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        new_run = np.empty(n_rows, dtype=bool)
        new_run[0] = True
        new_run[1:] = (codes[1:] != codes[:-1]) | (gidx[1:] != gidx[:-1])
        run_id = np.cumsum(new_run) - 1
        run_firsts = np.flatnonzero(new_run)
        run_cnt = np.zeros(run_id[-1] + 1, dtype=np.int64)
        np.add.at(run_cnt, run_id, cnt)
        run_tot = totals[gidx[run_firsts]]
        take = pa.array(run_firsts)
        return pa.table(
            {
                key: pc.take(t[key].combine_chunks(), take),
                sub_key: pc.take(sub_a, take),
                count_name: pa.array(run_cnt),
                share_name: pa.array(
                    run_cnt.astype(np.float64) / run_tot.astype(np.float64)
                ),
            }
        )

    return grouped_map(partials, [key], kernel, sort_keys=[sub_key], num_buckets=num_buckets)


def negative_samples(
    ds,
    *,
    user_col: str,
    item_col: str,
    k: int,
    rank_name: str = "neg_rank",
    num_buckets: Optional[int] = None,
):
    """Deterministic negative sampling over a bounded item vocabulary: for
    every user, the ``k`` items they never interacted with, picked by the
    engine's bijective splitmix mixer over ``user_id * 64 + item_ordinal``
    (item ordinal = rank in the sorted distinct-item list) — the
    implicit-feedback negatives of a recsys / contrastive training set,
    reproducible on any cluster shape and SQL-checkable.

    The item vocabulary is held as a broadcast ordinal list and a
    per-user multi-word bitset (``ceil(|vocab|/64)`` uint64 words), so it
    must be a BOUNDED categorical domain (``max_vocab``, default 16384 —
    the dense n_users x |vocab| missing-bit expansion inside one bucket
    costs |vocab|/8 bytes per user).  Per-batch distinct ``(user, item)``
    partials feed ONE grouped exchange on user; the kernel ORs the
    membership words, expands the missing bits, ranks by hash and keeps
    ``k`` — all vectorized.  For open-ended item domains (e.g. item =
    document id) use a hash-restricted candidate pool + anti-join
    composition instead; the exact "rank over ALL missing items"
    semantics this stage implements is only meaningful on a bounded
    vocabulary.
    """
    from feast_ray.stages.stats import sum_by

    # distinct items -> sorted vocabulary (bounded categorical domain)
    def item_partial(t: pa.Table) -> pa.Table:
        enc = t[item_col].combine_chunks().dictionary_encode()
        return pa.table(
            {item_col: enc.dictionary,
             "__one": pa.array(np.ones(len(enc.dictionary), np.int64))}
        )

    max_vocab = 16_384
    parts = ds.map_batches(item_partial, batch_format="pyarrow", zero_copy_batch=True)
    vocab_rows = sum_by(parts, [item_col], ["__one"]).take_all()
    vocab = sorted(r[item_col] for r in vocab_rows)
    n_items = len(vocab)
    if n_items > max_vocab:
        raise ValueError(
            f"negative_samples: {n_items} distinct items exceeds max_vocab="
            f"{max_vocab}; an open-ended item domain needs the candidate-pool"
            " + anti_join composition (see docstring)"
        )
    n_words = max(1, (n_items + 63) // 64)
    ordinal = {v: i for i, v in enumerate(vocab)}
    vocab_arr = pa.array(vocab)

    def pair_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        u_a = t[user_col].combine_chunks()
        if n == 0:
            return pa.table(
                {user_col: u_a.slice(0, 0), "__ord": pa.array([], pa.int64())}
            )
        enc = t[item_col].combine_chunks().dictionary_encode()
        dict_ord = np.array([ordinal[v.as_py()] for v in enc.dictionary], np.int64)
        ords = dict_ord[enc.indices.to_numpy(zero_copy_only=False)]
        u = u_a.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # stride must cover the full ordinal range (NOT the 64 used by the
        # ranking hash, which only needs within-user uniqueness)
        pack = u * np.int64(n_words * 64) + ords
        _, first_idx = np.unique(pack, return_index=True)  # batch-local distinct
        keep_idx = np.sort(first_idx)
        return pa.table(
            {user_col: pc.take(u_a, pa.array(keep_idx)),
             "__ord": pa.array(ords[keep_idx])}
        )

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        u_a = t[user_col].combine_chunks()
        if n_rows == 0:
            return pa.table(
                {
                    user_col: u_a.slice(0, 0),
                    item_col: vocab_arr.slice(0, 0),
                    rank_name: pa.array([], pa.int64()),
                }
            )
        firsts = starts[:-1]
        n_groups = len(firsts)
        ords64 = t["__ord"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        gidx = starts_to_group_index(starts)
        word = ords64 // 64
        bits = np.uint64(1) << (ords64 % 64).astype(np.uint64)
        # rows are sorted by __ord within each group, so (group, word) runs
        # are contiguous: one reduceat ORs each run's bits
        gw = gidx * n_words + word
        run_start = np.empty(n_rows, dtype=bool)
        run_start[0] = True
        run_start[1:] = gw[1:] != gw[:-1]
        rs = np.flatnonzero(run_start)
        run_masks = np.bitwise_or.reduceat(bits, rs)
        masks2d = np.zeros((n_groups, n_words), dtype=np.uint64)
        masks2d[gidx[rs], word[rs]] = run_masks
        users = u_a.cast(pa.int64()).to_numpy(zero_copy_only=False)[firsts]
        missing = (
            (masks2d[:, :, None] >> np.arange(64, dtype=np.uint64)[None, None, :])
            & np.uint64(1)
        ).reshape(n_groups, n_words * 64)[:, :n_items] == 0
        gi, oi = np.nonzero(missing)
        cand_u = users[gi]
        hv = mix64(cand_u * 64 + oi)
        order = np.lexsort((oi, hv, cand_u))
        gi_s, oi_s = gi[order], oi[order]
        new_grp = np.empty(len(order), dtype=bool)
        if len(order):
            new_grp[0] = True
            new_grp[1:] = gi_s[1:] != gi_s[:-1]
        rank = np.arange(len(order)) - np.maximum.accumulate(
            np.where(new_grp, np.arange(len(order)), 0)
        )
        keep = rank < k
        return pa.table(
            {
                user_col: pa.array(users[gi_s[keep]]),
                item_col: pc.take(vocab_arr, pa.array(oi_s[keep])),
                rank_name: pa.array((rank[keep] + 1).astype(np.int64)),
            }
        )

    return grouped_map(pairs, [user_col], kernel, sort_keys=["__ord"], num_buckets=num_buckets)
