"""Deduplication / near-duplicate detection over document tables.

Five operators (exact dedup lives in ``pipelines.queries``; the rest here):

- :func:`jaccard_pair_pipeline` — EXACT char-k-gram Jaccard pairs via a
  distributed inverted index: any pair with J > 0 shares a gram, so
  grouping (gram_hash -> docs) and counting shared grams per pair yields
  exact intersections with zero false negatives.
- :func:`minhash_pair_pipeline` — MinHash signatures + banded LSH candidate
  generation, each candidate verified with EXACT Jaccard via a
  co-partitioned doc_id join (:func:`verify_pairs_distributed`), i.e. LSH
  only prunes the pair space and nothing corpus-sized is ever broadcast.
- :func:`minhash_dedup_pipeline` — the dedup rule on top: drop a document
  iff some smaller ``doc_id`` has verified J >= tau with it.
- :func:`simhash_pair_pipeline` — 64-bit SimHash over token hashes; pairs
  with Hamming distance <= 3 found EXACTLY via 4x16-bit band pigeonhole
  (hd <= 3 implies at least one identical 16-bit band).
- :func:`embedding_pair_pipeline` — cosine near-dup pairs over an
  embedding column: broadcast the (normalized) matrix once via ``ray.put``
  and matmul each batch against it.

Scale notes (100 TB design):
- The gram/band inverted index is ONE hash shuffle on an int64 key; pair
  generation and counting are vectorized numpy inside each bucket.  Grams
  with pathological document frequency (boilerplate) explode the pair
  space quadratically — cap with ``max_df`` (drops grams shared by more
  than ``max_df`` docs; exactness then holds for pairs of df-bounded
  grams, the standard production trade-off).  Local testdata needs no cap.
- Exact-verify is a co-partitioned join (:func:`verify_pairs_distributed`):
  shuffle grams + pair memberships by doc_id to attach each candidate
  doc's gram set to its pairs, then shuffle by pair key to count the
  intersection.  No corpus-sized state ever touches the driver; moved
  bytes are proportional to the candidate set, not the corpus.
- The embedding matrix is broadcast because near-dup search is against the
  full corpus; beyond memory, pre-bucket by LSH
  (``stages.similarity._HyperplaneHasher``) and join bucket-local.

The Feast reference has no dedup operators (SURVEY §2.7); these are
required training-data-pipeline components per the task brief.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map, starts_to_group_index

HASH_MOD = np.uint64(0xFFFFFFFFFFFFFFFF)
GRAM_BASE = np.uint64(1_000_003)
DEFAULT_K = 20  # char-gram length (chars, not bytes — matches SQL substr)


# ---------------------------------------------------------------------------
# Char-gram extraction (vectorized over the whole batch)
# ---------------------------------------------------------------------------


def _flat_codepoints(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated UTF-32 codepoints of every string + char offsets.

    One C-speed ``str.join`` + one ``encode`` for the whole batch — the
    gram domain is CHARACTERS so results match SQL ``substr`` semantics.
    """
    pylist = texts.to_pylist()
    joined = "".join(s if s is not None else "" for s in pylist)
    data = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter(
        (len(s) if s is not None else 0 for s in pylist), count=len(pylist), dtype=np.int64
    )
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return data, offsets


def _rolling_hashes_u32(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hash of every k-codepoint window (mod 2^64)."""
    n = len(data)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    d = data.astype(np.uint64)
    for j in range(k):
        h = h * GRAM_BASE + d[j : j + m]
    return h


def distinct_gram_hashes(
    texts: pa.Array, ids: np.ndarray, k: int = DEFAULT_K
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, gram_hash) arrays with per-document DISTINCT grams.

    Equivalent to SQL ``SELECT DISTINCT doc_id, substr(text, i, k)``
    modulo 64-bit hash collisions (~n^2 / 2^64 — negligible and
    deterministic for fixed data).
    """
    data, offsets = _flat_codepoints(texts)
    h = _rolling_hashes_u32(data, k)
    lens = np.diff(offsets)
    counts = np.maximum(lens - (k - 1), 0)
    if not counts.sum():
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    pos = _valid_positions(offsets[:-1], counts)
    grams = h[pos]
    # distinct within doc: lexsort by (doc, gram), drop adjacent repeats
    order = np.lexsort((grams, doc_of))
    doc_s, gram_s = doc_of[order], grams[order]
    keep = np.ones(len(doc_s), dtype=bool)
    keep[1:] = (doc_s[1:] != doc_s[:-1]) | (gram_s[1:] != gram_s[:-1])
    return ids[doc_s[keep]], gram_s[keep]


def _valid_positions(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated arange(starts[i], starts[i]+counts[i]) without Python loop."""
    total = int(counts.sum())
    rep_starts = np.repeat(starts, counts)
    csum = np.concatenate(([0], np.cumsum(counts)))
    local = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], counts)
    return rep_starts + local


def gram_table(tbl: pa.Table, *, text_col: str, id_col: str, k: int) -> pa.Table:
    texts = tbl[text_col].combine_chunks() if isinstance(tbl[text_col], pa.ChunkedArray) else tbl[text_col]
    ids = tbl[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    d, g = distinct_gram_hashes(texts, ids, k)
    return pa.table({"doc_id": pa.array(d), "gh": pa.array(g.view(np.int64))})


# ---------------------------------------------------------------------------
# Vectorized pair generation over grouped buckets
# ---------------------------------------------------------------------------


def pairs_within_groups(vals: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (a < b positionally) within each group — vectorized.

    ``vals`` sorted by group; group g spans [starts[g], starts[g+1]).
    Returns (left_vals, right_vals) arrays of length sum s_g*(s_g-1)/2.
    """
    n = len(vals)
    if n == 0:
        return vals[:0], vals[:0]
    sizes = np.diff(starts)
    row = np.arange(n, dtype=np.int64)
    gend = np.repeat(starts[1:], sizes)
    left_counts = gend - 1 - row
    total = int(left_counts.sum())
    if total == 0:
        return vals[:0], vals[:0]
    L = np.repeat(row, left_counts)
    csum = np.concatenate(([0], np.cumsum(left_counts)))
    R = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], left_counts) + L + 1
    return vals[L], vals[R]


def _pair_gen_kernel(max_df: Optional[int], pair_keep=None):
    """``pair_keep(lo, hi) -> bool mask`` drops candidate pairs AT THE
    BUCKET, before they are ever counted or verified — the incremental-
    dedup hook (skip existing-vs-existing pairs when only new arrivals
    need checking), so candidate volume scales with the new batch, not
    the corpus."""

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        docs = t["doc_id"].to_numpy()
        if max_df is not None:
            sizes = np.diff(starts)
            keep_groups = sizes <= max_df
            if not keep_groups.all():
                # rebuild with oversized groups dropped
                mask = np.repeat(keep_groups, sizes)
                docs = docs[mask]
                new_sizes = sizes[keep_groups]
                starts = np.concatenate(([0], np.cumsum(new_sizes)))
        a, b = pairs_within_groups(docs, starts)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        if pair_keep is not None:
            keep = pair_keep(lo, hi)
            lo, hi = lo[keep], hi[keep]
        return pa.table({"doc_a": pa.array(lo), "doc_b": pa.array(hi)})

    return kernel


def _count_pairs(pair_ds, num_buckets: Optional[int]):
    """(doc_a, doc_b) -> occurrence count, via one int64-key grouped shuffle."""

    def pack(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        if len(a) and (a.min() < 0 or b.max() >= 1 << 32):
            raise ValueError(
                "pair packing requires doc ids in [0, 2^32); remap 64-bit or "
                "negative id spaces to a dense ordinal before dedup"
            )
        a = a.astype(np.uint64)
        b = b.astype(np.uint64)
        return pa.table({"pk": pa.array(((a << np.uint64(32)) | b).view(np.int64))})

    packed = pair_ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)

    def count_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        pk = t["pk"].to_numpy().view(np.uint64)
        firsts = pk[starts[:-1]]
        cnt = np.diff(starts)
        return pa.table(
            {
                "doc_a": pa.array((firsts >> np.uint64(32)).astype(np.int64)),
                "doc_b": pa.array((firsts & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "inter": pa.array(cnt.astype(np.int64)),
            }
        )

    return grouped_map(packed, ["pk"], count_kernel, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def jaccard_pair_pipeline(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    tau: float = 0.2,
    max_df: Optional[int] = None,
    num_buckets: Optional[int] = None,
):
    """Exact pairs with char-k-gram Jaccard >= tau.

    documents -> (gram_hash, doc) [materialized ONCE — the single gram pass
    feeds pair generation and the per-doc sizes] -> group by gram ->
    candidate pairs with their shared-gram count (= the EXACT intersection:
    pairs are generated once per shared gram) -> per-doc distinct-gram
    sizes joined on via two co-partitioned shuffles with O(pairs) fan-out
    (:func:`_join_pair_sizes`).  NOTHING is collected on the driver — no
    per-doc size table, no id-space assumption beyond the [0, 2^32)
    pair-packing range.

    NOTE: do NOT route the dense jaccard candidate set through
    :func:`verify_pairs_distributed` — that path replicates each doc's
    whole GRAM SET per pair (O(pairs x grams) rows, right-sized for the
    sparse LSH candidate sets it serves, measured 30x slower here).  The
    intersection is already exact from the inverted index; only the two
    scalar sizes per pair need joining.
    """
    grams = ds.map_batches(
        lambda t: gram_table(t, text_col=text_col, id_col=id_col, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    pair_cands = grouped_map(grams, ["gh"], _pair_gen_kernel(max_df), num_buckets=num_buckets)
    counted = _count_pairs(pair_cands, num_buckets)

    def batch_counts(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq), "n_grams": pa.array(cnt.astype(np.int64))})

    # PARTIAL per-block counts only — no aggregation shuffle: the attach
    # kernel / driver fold sums a doc's partial size rows (a doc's grams
    # can split across blocks; the partials just add up).
    sizes = grams.map_batches(batch_counts, batch_format="pyarrow", zero_copy_batch=True)
    # jaccard emitted raw, NOT rounded: it is a ratio of small ints, so
    # decimal half-ties are common and numpy (half-even) vs SQL ROUND
    # (half-away) would flip them; the raw doubles are bit-identical

    # Size-join strategy: the sizes side is ONE int per document.  Below
    # `broadcast_max_docs` it is collected as a SORTED (ids, counts) pair
    # (searchsorted lookup — no dense max-id array, sparse 64-bit id spaces
    # fine) and broadcast once: two fewer all-to-alls.  Above it, the
    # co-partitioned join (:func:`_join_pair_sizes`) keeps the driver free
    # of O(n_docs) state.
    broadcast_max_docs = 2_000_000  # ~32 MB broadcast ceiling
    # strategy pick from the materialized grams (cheap map + count), NOT a
    # re-scan of the source documents; partial size rows over-count docs
    # (one per doc per block), so this errs toward copartition — safe
    n_docs = sizes.count()
    if n_docs is not None and n_docs <= broadcast_max_docs:
        import ray

        pdf = sizes.to_pandas().groupby("doc_id", as_index=False)["n_grams"].sum()
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ref = ray.put((ids[order], pdf["n_grams"].to_numpy(dtype=np.int64)[order]))

        def jac(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(ref)
            a = t["doc_a"].to_numpy()
            b = t["doc_b"].to_numpy()
            inter = t["inter"].to_numpy().astype(np.float64)
            na = vals[np.searchsorted(keys, a)]
            nb = vals[np.searchsorted(keys, b)]
            union = na + nb - inter
            with np.errstate(invalid="ignore", divide="ignore"):
                j = inter / union
            keep = j >= tau
            return pa.table(
                {
                    "doc_a": pa.array(a[keep]),
                    "doc_b": pa.array(b[keep]),
                    "jaccard": pa.array(j[keep]),
                }
            )

        return counted.map_batches(jac, batch_format="pyarrow", zero_copy_batch=True)
    return _join_pair_sizes(counted, sizes, tau=tau, num_buckets=num_buckets)


def _join_pair_sizes(counted, sizes, *, tau: float, num_buckets: Optional[int] = None):
    """jaccard from (doc_a, doc_b, inter) pairs + per-doc sizes, fully
    distributed: shuffle pair-membership rows and size rows by doc_id to
    attach each side's size (O(pairs) fan-out), then shuffle by pair key to
    combine.  The de-drivered replacement for the old broadcast size
    array."""
    _SZ, _PA_, _PB_ = np.int8(-1), np.int8(0), np.int8(1)

    def size_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pk": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.full(n, _SZ, dtype=np.int8)),
                "v": t["n_grams"].cast(pa.int64()),
            }
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy().astype(np.int64)
        b = t["doc_b"].to_numpy().astype(np.int64)
        inter = t["inter"].to_numpy().astype(np.int64)
        pk = ((a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate((a, b))),
                "pk": pa.array(np.concatenate((pk, pk))),
                "side": pa.array(
                    np.concatenate(
                        (np.full(len(a), _PA_, np.int8), np.full(len(b), _PB_, np.int8))
                    )
                ),
                "v": pa.array(np.concatenate((inter, inter))),
            }
        )

    both = sizes.map_batches(size_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        counted.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        side = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        sz_mask = side == _SZ
        # sizes may arrive as several PARTIAL rows per doc — sum them
        size_of_group = np.bincount(
            gidx[sz_mask], weights=v[sz_mask], minlength=n_groups
        ).astype(np.int64)
        pm = ~sz_mask
        return pa.table(
            {
                "pk": pa.array(pk[pm]),
                "side": pa.array(side[pm]),
                "inter": pa.array(v[pm]),
                "sz": pa.array(size_of_group[gidx[pm]]),
            }
        )

    attached = grouped_map(both, ["doc_id"], attach_kernel, num_buckets=num_buckets)

    def finish_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return _VERIFY_SCHEMA.empty_table()
        side = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        inter = t["inter"].combine_chunks().to_numpy(zero_copy_only=False)
        sz = t["sz"].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        na = np.zeros(n_groups, dtype=np.int64)
        nb = np.zeros(n_groups, dtype=np.int64)
        na[gidx[side == _PA_]] = sz[side == _PA_]
        nb[gidx[side == _PB_]] = sz[side == _PB_]
        gi = np.zeros(n_groups, dtype=np.int64)
        gi[gidx] = inter
        union = (na + nb - gi).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(union > 0, gi / np.maximum(union, 1.0), 0.0)
        keep = j >= tau
        pku = pk[starts[:-1]][keep].view(np.uint64)
        return pa.table(
            {
                "doc_a": pa.array((pku >> np.uint64(32)).astype(np.int64)),
                "doc_b": pa.array((pku & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "jaccard": pa.array(j[keep]),
            }
        )

    return grouped_map(attached, ["pk"], finish_kernel, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Seeded universal-hash MinHash: sig_i(doc) = min_g (a_i*g + b_i mod 2^64)."""

    def __init__(self, num_perm: int = 64, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 63, num_perm, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm

    def signatures(self, doc_ids: np.ndarray, grams: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(unique_doc_ids, sig matrix [n_docs, num_perm]) from sorted-by-doc
        (doc_id, gram_hash) arrays."""
        if len(doc_ids) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros((0, self.num_perm), dtype=np.uint64)
        change = np.ones(len(doc_ids), dtype=bool)
        change[1:] = doc_ids[1:] != doc_ids[:-1]
        starts = np.flatnonzero(change)
        uniq = doc_ids[starts]
        sig = np.empty((len(uniq), self.num_perm), dtype=np.uint64)
        for i in range(self.num_perm):
            hv = grams * self.a[i] + self.b[i]
            sig[:, i] = np.minimum.reduceat(hv, starts)
        return uniq, sig


def band_keys(sig: np.ndarray, n_bands: int, seed: int = 13) -> np.ndarray:
    """[n_docs, n_bands] int64 bucket keys: band index mixed with a hash of
    the band's signature slice."""
    n_docs, num_perm = sig.shape
    r = num_perm // n_bands
    out = np.empty((n_docs, n_bands), dtype=np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    for b in range(n_bands):
        acc = np.full(n_docs, np.uint64(b * 1315423911 + seed), dtype=np.uint64)
        for j in range(b * r, (b + 1) * r):
            acc = (acc ^ sig[:, j]) * mix
        out[:, b] = acc
    return out


def minhash_pair_pipeline(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    tau: float = 0.5,
    num_perm: int = 64,
    n_bands: int = 32,
    seed: int = 11,
    pair_keep=None,
    num_buckets: Optional[int] = None,
):
    """LSH candidate pairs verified with exact Jaccard (>= tau).

    False positives are impossible (exact verify); false negatives require
    every one of ``n_bands`` bands to differ — P(miss) = (1 - J^r)^bands,
    ~1e-6 at J=0.5 with r=2, b=32.

    ``pair_keep(lo, hi) -> bool mask`` restricts candidates at the band
    bucket (see :func:`_pair_gen_kernel`) — the incremental-ingest hook:
    with signatures of the EXISTING corpus persisted and unioned with the
    new batch, ``pair_keep = at-least-one-new`` makes candidate count,
    dedup and verify volume all proportional to the new batch.
    """
    import ray

    hasher = MinHasher(num_perm, seed)

    def sig_bands(t: pa.Table) -> pa.Table:
        texts = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        d, g = distinct_gram_hashes(texts, ids, k)
        uniq, sig = hasher.signatures(d, g)
        bk = band_keys(sig, n_bands, seed + 1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(uniq, n_bands)),
                "bk": pa.array(bk.reshape(-1).view(np.int64)),
            }
        )

    bands = ds.map_batches(sig_bands, batch_format="pyarrow", zero_copy_batch=True)
    pair_cands = grouped_map(bands, ["bk"], _pair_gen_kernel(None, pair_keep), num_buckets=num_buckets)
    counted = _count_pairs(pair_cands, num_buckets)  # dedup (band collisions merge)

    grams = ds.map_batches(
        lambda t: gram_table(t, text_col=text_col, id_col=id_col, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return verify_pairs_distributed(grams, counted, tau=tau, num_buckets=num_buckets)


_VERIFY_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)

# candidate-id broadcast ceiling for verify's gram pruning (~40 MB of
# int64 ids); above it the co-partitioned semi-join path runs.  Module
# level so tests can force the fallback branch.
_VERIFY_BROADCAST_MAX_IDS = 5_000_000


def verify_pairs_distributed(grams, cand, *, tau: float, num_buckets: Optional[int] = None):
    """Exact-Jaccard verification of candidate pairs with NO driver-side
    corpus state — two co-partitioned shuffles, all kernels vectorized:

    1. shuffle by doc_id: gram rows (doc_id, gh) meet pair-membership rows
       (doc_id, pk, side); each doc's distinct gram set is attached to every
       candidate pair it participates in, emitting (pk, side, gh).  Volume
       is sum over candidates of |A|+|B| — proportional to the CANDIDATE
       set, not the corpus.
    2. shuffle by pk: |A| = side-0 rows, |B| = side-1 rows, intersection =
       gram values present on both sides (per-side gram sets are distinct,
       so a within-group duplicate gh means both sides have it).

    jaccard = inter / (|A| + |B| - inter), emitted raw (un-rounded — ratio
    of small ints; see :func:`jaccard_pair_pipeline`).

    Gram rows are pruned to CANDIDATE docs before the attach shuffle —
    without this, every doc's gram rows enter the exchange only for
    non-candidates to be dropped at the reducer (corpus-proportional
    bytes when candidates are few, e.g. the incremental-ingest path).
    Small candidate id sets broadcast for a shuffle-free ``isin``; past
    the threshold the grams are semi-joined co-partitioned on doc_id.
    """
    _G, _PA, _PB = np.int8(-1), np.int8(0), np.int8(1)

    cand = cand.materialize()  # bounded by the candidate pair count
    broadcast_max_ids = _VERIFY_BROADCAST_MAX_IDS
    n_pairs = cand.count()
    if 2 * n_pairs <= broadcast_max_ids:
        import ray

        cdf = cand.to_pandas()
        cand_ids = np.unique(
            np.concatenate(
                (cdf["doc_a"].to_numpy(dtype=np.int64),
                 cdf["doc_b"].to_numpy(dtype=np.int64))
            )
        )
        ref = ray.put(cand_ids)

        def keep_cand(t: pa.Table) -> pa.Table:
            ids_sorted = ray.get(ref)
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            if not len(ids_sorted):
                return t.slice(0, 0)
            pos = np.searchsorted(ids_sorted, ids)
            hit = (pos < len(ids_sorted)) & (
                ids_sorted[np.clip(pos, 0, len(ids_sorted) - 1)] == ids
            )
            return t.filter(pa.array(hit))

        grams = grams.map_batches(keep_cand, batch_format="pyarrow", zero_copy_batch=True)
    else:
        from feast_ray.stages.join import semi_join

        cand_ids_ds = cand.map_batches(
            lambda t: pa.table(
                {"doc_id": pa.concat_arrays(
                    [t["doc_a"].combine_chunks().cast(pa.int64()),
                     t["doc_b"].combine_chunks().cast(pa.int64())]
                )}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        grams = semi_join(grams, cand_ids_ds, keys=["doc_id"], num_buckets=num_buckets)

    def gram_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pk": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.full(n, _G, dtype=np.int8)),
                "gh": t["gh"],
            }
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy().astype(np.int64)
        b = t["doc_b"].to_numpy().astype(np.int64)
        pk = ((a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate((a, b))),
                "pk": pa.array(np.concatenate((pk, pk))),
                "side": pa.array(
                    np.concatenate(
                        (np.full(len(a), _PA, np.int8), np.full(len(b), _PB, np.int8))
                    )
                ),
                "gh": pa.array(np.zeros(2 * len(a), dtype=np.int64)),
            }
        )

    both = grams.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        cand.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        side = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        gh = t["gh"].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        gram_mask = side == _G
        gram_idx = np.flatnonzero(gram_mask)  # ascending => grouped by doc group
        gram_cnt = np.bincount(gidx[gram_mask], minlength=n_groups)
        gram_off = np.concatenate(([0], np.cumsum(gram_cnt)))
        pair_idx = np.flatnonzero(~gram_mask)
        pg = gidx[pair_idx]
        cnts = gram_cnt[pg]  # grams to attach per pair-membership row
        if int(cnts.sum()) == 0:
            return pa.table(
                {
                    "pk": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "gh": pa.array([], pa.int64()),
                }
            )
        gpos = _valid_positions(gram_off[pg], cnts)  # indices into gram_idx
        return pa.table(
            {
                "pk": pa.array(np.repeat(pk[pair_idx], cnts)),
                "side": pa.array(np.repeat(side[pair_idx], cnts)),
                "gh": pa.array(gh[gram_idx[gpos]]),
            }
        )

    attached = grouped_map(both, ["doc_id"], attach_kernel, num_buckets=num_buckets)

    def verify_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return _VERIFY_SCHEMA.empty_table()
        side = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        gh = t["gh"].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        n_groups = len(starts) - 1
        size_a = np.bincount(gidx[side == _PA], minlength=n_groups)
        size_b = np.bincount(gidx[side == _PB], minlength=n_groups)
        order = np.lexsort((gh, gidx))
        g_s, gh_s = gidx[order], gh[order]
        dup = (g_s[1:] == g_s[:-1]) & (gh_s[1:] == gh_s[:-1])
        inter = np.bincount(g_s[1:][dup], minlength=n_groups).astype(np.float64)
        union = size_a + size_b - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
        keep = j >= tau
        pku = pk[starts[:-1]][keep].view(np.uint64)
        return pa.table(
            {
                "doc_a": pa.array((pku >> np.uint64(32)).astype(np.int64)),
                "doc_b": pa.array((pku & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "jaccard": pa.array(j[keep]),
            }
        )

    return grouped_map(attached, ["pk"], verify_kernel, num_buckets=num_buckets)


def minhash_dedup_pipeline(ds, *, tau: float = 0.5, **kw):
    """Documents surviving the rule: drop doc iff some smaller doc_id has
    verified Jaccard >= tau with it.

    The drop set is the verified pairs' ``doc_b`` column.  Small drop sets
    (the common case — it is bounded by the duplicate count) are collected
    and broadcast for a shuffle-free ``isin`` filter; past the threshold
    the corpus is anti-joined co-partitioned on the id
    (``stages.join.anti_join``) — no driver materialization on that path.
    """
    from feast_ray.stages.join import anti_join

    id_col = kw.get("id_col", "doc_id")
    num_buckets = kw.get("num_buckets")
    broadcast_max_dropped = 5_000_000  # ~40 MB of int64 ids
    pairs = minhash_pair_pipeline(ds, tau=tau, **kw).materialize()
    dropped = pairs.map_batches(
        lambda t: pa.table({id_col: t["doc_b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if pairs.count() <= broadcast_max_dropped:
        import ray

        drop_ids = np.unique(dropped.to_pandas()[id_col].to_numpy(dtype=np.int64))
        ref = ray.put(drop_ids)

        def keep_fn(t: pa.Table) -> pa.Table:
            ids_sorted = ray.get(ref)
            ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids_sorted, ids)
            hit = (pos < len(ids_sorted)) & (
                ids_sorted[np.clip(pos, 0, max(len(ids_sorted) - 1, 0))] == ids
            ) if len(ids_sorted) else np.zeros(len(ids), dtype=bool)
            return t.filter(pa.array(~hit))

        return ds.map_batches(keep_fn, batch_format="pyarrow", zero_copy_batch=True)
    return anti_join(ds, dropped, keys=[id_col], num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(texts: pa.Array, seed: int = 17) -> np.ndarray:
    """64-bit SimHash over word-token hashes (token multiplicity counted).

    Tokens: maximal runs matched after splitting on ``[^a-z0-9_]+`` of the
    lowercased text; empty tokens dropped.  Token hash: polynomial over
    codepoints (Horner, vectorized across every token via a loop over the
    max token LENGTH, not the token count), xor-seeded and mixed.
    """
    n = len(texts)
    lower = pc.utf8_lower(texts)
    split = pc.split_pattern_regex(lower, r"[^a-z0-9_]+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    # null text => 0 tokens (fill before to_numpy: NaN→int64 is undefined)
    counts = pc.fill_null(pc.list_value_length(split), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = split.flatten()
    sig = np.zeros((n, 64), dtype=np.int64)
    if len(flat):
        data, offsets = _flat_codepoints(flat)
        lens = np.diff(offsets)
        h = np.zeros(len(lens), dtype=np.uint64)
        pos = offsets[:-1]
        d = data.astype(np.uint64)
        for j in range(int(lens.max()) if len(lens) else 0):
            upd = lens > j
            h[upd] = h[upd] * GRAM_BASE + d[(pos + j)[upd]]
        h = (h ^ np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        keep = lens > 0
        doc_of, h = doc_of[keep], h[keep]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        np.add.at(sig, doc_of, bits * 2 - 1)
    bitsig = (sig > 0).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (bitsig * weights[None, :]).sum(axis=1, dtype=np.uint64)


def simhash_pair_pipeline(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 17,
    num_buckets: Optional[int] = None,
):
    """Exact pairs with SimHash Hamming distance <= max_hamming (<= 3).

    Pigeonhole over 4 disjoint 16-bit bands: hd <= 3 implies >= 1 equal
    band, so banding has 100% recall; candidates are verified exactly.
    """
    import ray

    n_bands, band_bits = 4, 16
    assert max_hamming < n_bands

    def sig_bands(t: pa.Table) -> pa.Table:
        texts = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        sig = simhash64(texts, seed)
        mask = np.uint64((1 << band_bits) - 1)
        bks = np.empty((len(ids), n_bands), dtype=np.uint64)
        for b in range(n_bands):
            band_val = (sig >> np.uint64(b * band_bits)) & mask
            bks[:, b] = band_val | (np.uint64(b) << np.uint64(48))
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_bands)),
                "bk": pa.array(bks.reshape(-1).view(np.int64)),
                "sig": pa.array(np.repeat(sig.view(np.int64), n_bands)),
            }
        )

    bands = ds.map_batches(sig_bands, batch_format="pyarrow", zero_copy_batch=True)

    def pair_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        docs = t["doc_id"].to_numpy()
        sigs = t["sig"].to_numpy().view(np.uint64)
        ai, bi = pairs_within_groups(np.arange(len(docs)), starts)
        if len(ai) == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        da, db = docs[ai], docs[bi]
        hd = _popcount64(sigs[ai] ^ sigs[bi])
        keep = (hd <= max_hamming) & (da != db)
        lo = np.minimum(da[keep], db[keep])
        hi = np.maximum(da[keep], db[keep])
        return pa.table(
            {"doc_a": pa.array(lo), "doc_b": pa.array(hi), "hamming": pa.array(hd[keep].astype(np.int64))}
        )

    cand = grouped_map(bands, ["bk"], pair_kernel, num_buckets=num_buckets)

    # distinct pairs (a pair can match in several bands)
    def pack(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy().astype(np.uint64)
        b = t["doc_b"].to_numpy().astype(np.uint64)
        return pa.table(
            {"pk": pa.array(((a << np.uint64(32)) | b).view(np.int64)),
             "hamming": t["hamming"]}
        )

    packed = cand.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)

    def first_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        pk = t["pk"].to_numpy().view(np.uint64)[starts[:-1]]
        hd = t["hamming"].to_numpy()[starts[:-1]]
        return pa.table(
            {
                "doc_a": pa.array((pk >> np.uint64(32)).astype(np.int64)),
                "doc_b": pa.array((pk & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "hamming": pa.array(hd),
            }
        )

    return grouped_map(packed, ["pk"], first_kernel, num_buckets=num_buckets)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_pair_pipeline(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tau: float = 0.4,
    round_digits: int = 6,
    mode: str = "blockpair",
    n_chunks: int = 8,
    num_buckets: Optional[int] = None,
):
    """All pairs with cosine similarity >= tau.

    ``mode``:

    - ``"blockpair"`` (default, EXACT, scale path): rows are chunked by
      ``id % n_chunks`` and every chunk PAIR (c <= d) becomes one shuffle
      group — each reducer holds two chunks and matmuls them.  No driver
      materialization, no broadcast; per-row fan-out is ``n_chunks`` and a
      reducer holds 2/n_chunks of the corpus, so size n_chunks ~
      sqrt(cluster tasks) with chunks bounded by worker memory.
    - ``"broadcast"`` (EXACT, small-corpus fast path): normalize the whole
      matrix on the driver, ``ray.put`` once, score batch x corpus per
      map task.  Zero shuffle, but requires the matrix to fit in one node.
    - ``"lsh"`` (APPROXIMATE): hyperplane-bucket rows and pair only within
      buckets (one shuffle, no fan-out).  Recall per pair with cosine
      angle θ is (1 - θ/π)^n_planes — e.g. ~0.66 at cos=0.4, 4 planes;
      precision is exact (true cosine verified in-kernel).  Pinned by
      tests/test_text_dedup.py recall assertions.
    """
    if mode == "broadcast":
        return _embedding_pairs_broadcast(
            ds, id_col=id_col, emb_col=emb_col, tau=tau, round_digits=round_digits
        )
    if mode == "lsh":
        return _embedding_pairs_lsh(
            ds, id_col=id_col, emb_col=emb_col, tau=tau, round_digits=round_digits,
            num_buckets=num_buckets,
        )
    if mode != "blockpair":
        raise ValueError(f"unknown embedding pair mode {mode!r}")

    from feast_ray.stages.similarity import _embedding_matrix

    B = int(n_chunks)

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), emb_col: t[emb_col],
                 "__chunk": pa.array([], pa.int32()), "__pk": pa.array([], pa.int64())}
            )
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        c = (ids % B).astype(np.int64)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), B))
        c_rep = np.repeat(c, B)
        d = np.tile(np.arange(B, dtype=np.int64), n)
        lo = np.minimum(c_rep, d)
        hi = np.maximum(c_rep, d)
        pk = lo * B + hi  # one group per unordered chunk pair; (c, c) once
        out = t.select([id_col, emb_col]).take(rep)
        out = out.append_column("__chunk", pa.array(c_rep.astype(np.int32)))
        out = out.append_column("__pk", pa.array(pk))
        return out

    expanded = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        outs_a, outs_b, outs_c = [], [], []
        pk_np = t["__pk"].combine_chunks().to_numpy(zero_copy_only=False)
        ch = t["__chunk"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t[emb_col].combine_chunks()
        for g in range(len(starts) - 1):
            lo_i, hi_i = int(starts[g]), int(starts[g + 1])
            pk = int(pk_np[lo_i])
            a_chunk, b_chunk = pk // B, pk % B
            sl = slice(lo_i, hi_i)
            mat = _embedding_matrix(emb.slice(lo_i, hi_i - lo_i))
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            mat = mat / nm[:, None]
            gids = ids[sl]
            if a_chunk == b_chunk:
                cs = mat @ mat.T
                r, cidx = np.nonzero((cs >= tau) & (gids[:, None] < gids[None, :]))
                outs_a.append(gids[r]); outs_b.append(gids[cidx]); outs_c.append(cs[r, cidx])
            else:
                am = ch[sl] == a_chunk
                bm = ~am
                if not am.any() or not bm.any():
                    continue
                cs = mat[am] @ mat[bm].T
                ia, ib = gids[am], gids[bm]
                r, cidx = np.nonzero(cs >= tau)
                la, lb, cv = ia[r], ib[cidx], cs[r, cidx]
                lo_id = np.minimum(la, lb)
                hi_id = np.maximum(la, lb)
                outs_a.append(lo_id); outs_b.append(hi_id); outs_c.append(cv)
        if not outs_a:
            return _EMB_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(outs_a)),
                "doc_b": pa.array(np.concatenate(outs_b)),
                "cos_sim": pa.array(np.round(np.concatenate(outs_c), round_digits)),
            }
        )

    return grouped_map(expanded, ["__pk"], kernel, num_buckets=num_buckets)


_EMB_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("cos_sim", pa.float64())]
)


_BROADCAST_BYTE_CEILING = 2 << 30  # 2 GiB of embedding matrix on the driver


def _embedding_pairs_broadcast(ds, *, id_col, emb_col, tau, round_digits):
    import ray

    from feast_ray.stages.similarity import _embedding_matrix

    from feast_ray.grouped import block_refs_of

    refs = block_refs_of(ds)
    # explicit small-corpus mode: refuse to driver-materialize a corpus that
    # cannot possibly fit, with the actionable alternative, instead of OOMing
    try:
        import ray.experimental

        total = sum(
            ray.experimental.get_object_locations([r])[r].get("object_size") or 0
            for r in refs
        )
    except Exception:  # pragma: no cover - locations API unavailable
        total = 0
    if total > _BROADCAST_BYTE_CEILING:
        raise ValueError(
            f"embedding broadcast mode would materialize ~{total >> 20} MiB "
            f"on the driver (ceiling {_BROADCAST_BYTE_CEILING >> 20} MiB) — "
            "use mode='blockpair' (the distributed default) for this corpus"
        )
    parts = [ray.get(r) for r in refs]
    full = pa.concat_tables(parts)
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat = _embedding_matrix(full[emb_col])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    nmat = mat / norms[:, None]
    ref = ray.put((ids_all, nmat))

    def score(t: pa.Table) -> pa.Table:
        ids_all_, nmat_ = ray.get(ref)
        if t.num_rows == 0:
            return _EMB_PAIR_SCHEMA.empty_table()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        m = _embedding_matrix(t[emb_col])
        nm = np.linalg.norm(m, axis=1)
        nm[nm == 0] = 1.0
        cs = (m / nm[:, None]) @ nmat_.T  # [batch, corpus]
        hit_r, hit_c = np.nonzero((cs >= tau) & (ids[:, None] < ids_all_[None, :]))
        return pa.table(
            {
                "doc_a": pa.array(ids[hit_r]),
                "doc_b": pa.array(ids_all_[hit_c]),
                "cos_sim": pa.array(np.round(cs[hit_r, hit_c], round_digits)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _embedding_pairs_lsh(
    ds, *, id_col, emb_col, tau, round_digits, n_planes: int = 4, seed: int = 7,
    num_buckets: Optional[int] = None,
):
    from feast_ray.stages.similarity import _HyperplaneHasher, _embedding_matrix

    state = {}

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), emb_col: t[emb_col],
                 "__bk": pa.array([], pa.int64())}
            )
        mat = _embedding_matrix(t[emb_col])
        h = state.get("h")
        if h is None:
            h = state["h"] = _HyperplaneHasher(mat.shape[1], n_planes=n_planes, seed=seed)
        return t.select([id_col, emb_col]).append_column("__bk", pa.array(h.bucket(mat)))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t[emb_col].combine_chunks()
        outs_a, outs_b, outs_c = [], [], []
        for g in range(len(starts) - 1):
            lo_i, hi_i = int(starts[g]), int(starts[g + 1])
            mat = _embedding_matrix(emb.slice(lo_i, hi_i - lo_i))
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            mat = mat / nm[:, None]
            gids = ids[lo_i:hi_i]
            cs = mat @ mat.T
            r, c = np.nonzero((cs >= tau) & (gids[:, None] < gids[None, :]))
            outs_a.append(gids[r]); outs_b.append(gids[c]); outs_c.append(cs[r, c])
        if not outs_a:
            return _EMB_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(outs_a)),
                "doc_b": pa.array(np.concatenate(outs_b)),
                "cos_sim": pa.array(np.round(np.concatenate(outs_c), round_digits)),
            }
        )

    return grouped_map(bucketed, ["__bk"], kernel, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-threshold semantic dedup
# ---------------------------------------------------------------------------


def semdedup(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
    tau: float = 0.9,
    round_digits: int = 6,
    num_buckets: Optional[int] = None,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every vector to its nearest of ``k`` centroids, then WITHIN each
    cluster mark a vector a duplicate iff some lower-id cluster-mate has
    cosine similarity >= ``tau`` with it.  Clustering bounds the pairwise
    work to per-cluster blocks — the published trick that makes semantic
    dedup tractable at corpus scale (quadratic only within a cluster; at
    100 TB size ``k`` ~ sqrt(n) so cluster blocks stay worker-sized).

    Centroids are DETERMINISTIC: the (normalized) embeddings of the ``k``
    lowest ids — reproducible on any cluster shape and expressible in the
    SQL twin.  Assignment is argmax rounded cosine with ties to the lowest
    centroid index (numpy argmax == SQL ``ORDER BY cs DESC, cidx``).

    Plan: per-block local-k head -> tiny sort/limit for the centroid rows
    (k rows on the driver, never the corpus), ``ray.put`` broadcast ->
    one matmul per batch to assign -> ONE hash shuffle by cluster ->
    per-cluster lower-triangular max via a single matmul per group.

    Output: one row per vector — ``(id, cluster_id, max_lower_cos,
    is_dup)`` with ``max_lower_cos`` null for each cluster's lowest id.
    The Feast reference has no semantic dedup (SURVEY §2.7); this is a
    training-data-pipeline component per the task brief.
    """
    import ray

    from feast_ray.stages.similarity import _embedding_matrix

    def local_head(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t.select([id_col, emb_col])
        idx = pc.select_k_unstable(
            t, k, sort_keys=[(id_col, "ascending")]
        )
        return t.select([id_col, emb_col]).take(idx)

    head = ds.map_batches(
        local_head, batch_format="pyarrow", zero_copy_batch=True
    ).sort(id_col).limit(k).take_all()  # exactly k rows of (id, vec)
    cent = np.stack(
        [np.asarray(r[emb_col], dtype=np.float64) for r in head]
    )
    cnorm = np.linalg.norm(cent, axis=1)
    cnorm[cnorm == 0] = 1.0
    cent = cent / cnorm[:, None]
    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        out = t.select([id_col, emb_col])
        if t.num_rows == 0:
            return out.append_column("__cluster", pa.array([], pa.int64()))
        mat = _embedding_matrix(t[emb_col]).astype(np.float64)
        nm = np.linalg.norm(mat, axis=1)
        nm[nm == 0] = 1.0
        cs = np.round((mat / nm[:, None]) @ c.T, round_digits)
        return out.append_column(
            "__cluster", pa.array(np.argmax(cs, axis=1).astype(np.int64))
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("cluster_id", pa.int64()),
            ("max_lower_cos", pa.float64()),
            ("is_dup", pa.int64()),
        ]
    )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t["__cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        emb = t[emb_col].combine_chunks()
        o_id, o_cl, o_mx = [], [], []
        for g in range(len(starts) - 1):
            lo, hi = int(starts[g]), int(starts[g + 1])
            mat = _embedding_matrix(emb.slice(lo, hi - lo)).astype(np.float64)
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            mat = mat / nm[:, None]
            cs = np.round(mat @ mat.T, round_digits)
            # rows are id-sorted inside the group: max over the strict
            # lower triangle = max cos to any LOWER-id cluster-mate
            np.fill_diagonal(cs, -np.inf)
            cs[np.triu_indices(len(cs), k=1)] = -np.inf
            mx = cs.max(axis=1)
            mx[0] = np.nan  # lowest id has no lower-id mate
            o_id.append(ids[lo:hi]); o_cl.append(np.full(hi - lo, cl[lo])); o_mx.append(mx)
        mxv = np.concatenate(o_mx)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(o_id)),
                "cluster_id": pa.array(np.concatenate(o_cl).astype(np.int64)),
                "max_lower_cos": pa.array(mxv, pa.float64(), from_pandas=True),
                "is_dup": pa.array(
                    np.where(np.isnan(mxv), 0, mxv >= tau).astype(np.int64)
                ),
            }
        )

    return grouped_map(
        assigned, ["__cluster"], kernel, sort_keys=[id_col], num_buckets=num_buckets
    )
