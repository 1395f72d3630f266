"""Text-analysis operators over document tables: token counting, quality
scoring, language identification, and winnowing fingerprints.

Not present in the Feast reference (its scalar surface is casts + timestamp
coercion, SURVEY §2.8); required as first-class training-data-pipeline
operators by the task brief.  Everything here is vectorized:

- counting/ratio features run as ``pyarrow.compute`` RE2 kernels
  (``count_substring_regex``) over whole Arrow batches — no Python per-row
  loop, no pandas conversion;
- the rolling-hash fingerprint reads the Arrow string column's flat byte
  buffer zero-copy and computes every document's k-gram hashes in one
  numpy pass (``np.minimum.reduceat`` per doc).

At 100 TB these stages are embarrassingly parallel ``map_batches`` over the
native Parquet blocks — no shuffle, no state; throughput is bounded by the
RE2 scans, so each feature is ONE compiled regex pass over the batch.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Small fixed stopword inventories — the language-ID heuristic scores each
# language by its stopword hit count (one RE2 scan per language) and takes
# the argmax; deterministic and replicated exactly in the DuckDB oracle SQL.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "den", "von"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "was"),
    "es": ("el", "los", "las", "y", "una", "es", "se", "por", "como", "pero"),
    "fr": ("le", "les", "et", "un", "une", "est", "que", "pour", "dans", "avec"),
    "zh": ("的", "是", "了", "在", "我", "有", "和",
           "就", "不", "人"),
}

TOKEN_RE = r"[a-z0-9_]+"
WORD_CHAR_RE = r"[a-z0-9_]"
ALPHA_RE = r"[a-zA-Z]"
PUNCT_RE = r"[.,;:!?]"

EN_STOPWORDS = LANG_STOPWORDS["en"]


def stopword_pattern(words: Sequence[str]) -> str:
    """Word-boundary alternation, non-capturing — identical semantics in
    pyarrow (RE2) and DuckDB (also RE2), so counts match the oracle.
    CJK characters are not RE2 word characters, so ``\\b`` would never match
    around them — those alternations are emitted boundary-free."""
    ascii_words = [w for w in words if w.isascii()]
    cjk_words = [w for w in words if not w.isascii()]
    parts = []
    if ascii_words:
        parts.append(r"\b(?:" + "|".join(ascii_words) + r")\b")
    if cjk_words:
        parts.append("(?:" + "|".join(cjk_words) + ")")
    return "|".join(parts)


def _count_re(arr: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    # Null text counts as empty (0 matches) — keeps downstream numpy
    # conversions NaN-free and gives null rows a defined feature value.
    out = pc.fill_null(pc.count_substring_regex(arr, pattern), 0)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def text_quality_batch(
    tbl: pa.Table,
    *,
    text_col: str = "text",
    round_digits: int | None = None,
) -> pa.Table:
    """Per-document quality features + a scalar quality score.

    Columns: n_chars, n_tokens, alpha_ratio, punct_ratio, stop_ratio,
    mean_token_len, quality_score.  All formulas are pure arithmetic over
    regex counts so the DuckDB oracle reproduces them bit-for-bit (after
    round-to-6).
    """
    text = tbl[text_col]
    lower = pc.utf8_lower(text)
    n_chars = pc.fill_null(pc.utf8_length(text), 0).cast(pa.float64())
    n_tokens = _count_re(lower, TOKEN_RE).cast(pa.float64())
    n_word_chars = _count_re(lower, WORD_CHAR_RE).cast(pa.float64())
    n_alpha = _count_re(text, ALPHA_RE).cast(pa.float64())
    n_punct = _count_re(text, PUNCT_RE).cast(pa.float64())
    n_stop = _count_re(lower, stopword_pattern(EN_STOPWORDS)).cast(pa.float64())

    def safe_div(a, b):
        return pc.if_else(pc.greater(b, 0.0), pc.divide(a, pc.max_element_wise(b, 1.0)), 0.0)

    alpha_ratio = safe_div(n_alpha, n_chars)
    punct_ratio = safe_div(n_punct, n_chars)
    stop_ratio = safe_div(n_stop, n_tokens)
    mean_token_len = safe_div(n_word_chars, n_tokens)

    # Heuristic score in [0, 1]: length saturation + alpha density + a mild
    # stopword prior (natural text has some stopwords).
    len_term = pc.min_element_wise(pc.divide(n_tokens, 64.0), 1.0)
    stop_term = pc.min_element_wise(pc.multiply(stop_ratio, 4.0), 1.0)
    score = pc.add(
        pc.add(pc.multiply(len_term, 0.4), pc.multiply(alpha_ratio, 0.4)),
        pc.multiply(stop_term, 0.2),
    )

    rnd = (lambda x: pc.round(x, round_digits)) if round_digits is not None else (lambda x: x)
    out = tbl
    for name, col in [
        ("n_chars", n_chars.cast(pa.int64())),
        ("n_tokens", n_tokens.cast(pa.int64())),
        ("alpha_ratio", rnd(alpha_ratio)),
        ("punct_ratio", rnd(punct_ratio)),
        ("stop_ratio", rnd(stop_ratio)),
        ("mean_token_len", rnd(mean_token_len)),
        ("quality_score", rnd(score)),
    ]:
        out = out.append_column(name, col)
    return out


def lang_id_batch(
    tbl: pa.Table,
    *,
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> pa.Table:
    """Stopword-count language ID: argmax score across LANG_STOPWORDS,
    alphabetical tie-break, 'und' when every score is zero."""
    lower = pc.utf8_lower(tbl[text_col])
    langs = sorted(LANG_STOPWORDS)
    n = tbl.num_rows
    scores = np.zeros((len(langs), n), dtype=np.int64)
    for i, lang in enumerate(langs):
        scores[i] = _count_re(lower, stopword_pattern(LANG_STOPWORDS[lang])).to_numpy(
            zero_copy_only=False
        )
    best = np.argmax(scores, axis=0)  # first max => alphabetical tie-break
    pred = np.asarray(langs, dtype=object)[best]
    pred[scores.max(axis=0) == 0] = "und"
    out = tbl.append_column(out_col, pa.array(pred, type=pa.string()))
    best_score = scores.max(axis=0)
    return out.append_column("lang_score", pa.array(best_score))


# ---------------------------------------------------------------------------
# Rolling-hash fingerprints (winnowing-style)
# ---------------------------------------------------------------------------

FP_BASE = np.uint64(1_000_003)
FP_K = 8  # k-gram length in bytes


def _flat_utf8(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat_bytes, offsets) of a string array, zero-copy from Arrow buffers."""
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offsets.astype(np.int64)


def rolling_kgram_hashes(data: np.ndarray, k: int = FP_K) -> np.ndarray:
    """Polynomial hash of every k-byte window of ``data`` (mod 2^64).

    h[i] = sum_j data[i+j] * BASE^(k-1-j); vectorized as k shifted
    multiply-adds over the whole flat buffer.
    """
    n = len(data)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    d = data.astype(np.uint64)
    for j in range(k):
        h = h * FP_BASE + d[j : j + m]
    return h


def fingerprint_batch(
    tbl: pa.Table,
    *,
    text_col: str = "text",
    k: int = FP_K,
    id_cols: Sequence[str] = ("doc_id",),
) -> pa.Table:
    """Per-document k-gram rolling-hash fingerprint summary.

    Emits ``fp_count`` (valid k-gram positions), ``fp_min`` and ``fp_xor``
    (min / xor of the document's k-gram hashes, as int64 bit patterns) —
    a compact content fingerprint: equal documents have equal
    (fp_count, fp_min, fp_xor); near-equal documents share fp_min with
    high probability (min-hash property of the single cheapest sketch).
    """
    arr = tbl[text_col].combine_chunks() if isinstance(tbl[text_col], pa.ChunkedArray) else tbl[text_col]
    n = len(arr)
    empty_like = {
        "fp_count": pa.array(np.zeros(n, dtype=np.int64)),
        "fp_min": pa.array(np.zeros(n, dtype=np.int64), mask=np.ones(n, dtype=bool)),
        "fp_xor": pa.array(np.zeros(n, dtype=np.int64), mask=np.ones(n, dtype=bool)),
    }
    out = tbl.select(list(id_cols))
    if n == 0:
        for name, col in empty_like.items():
            out = out.append_column(name, col)
        return out

    data, offsets = _flat_utf8(arr)
    h = rolling_kgram_hashes(data, k)  # hashes at every flat position
    lens = np.diff(offsets)
    # valid hash positions for doc i: [offsets[i], offsets[i] + len_i - k]
    counts = np.maximum(lens - (k - 1), 0)
    has = counts > 0
    fp_min = np.zeros(n, dtype=np.uint64)
    fp_xor = np.zeros(n, dtype=np.uint64)
    if h.size and has.any():
        # mask hashes that straddle doc boundaries by marking invalid spans
        valid = np.zeros(len(h), dtype=bool)
        starts = offsets[:-1][has]
        ends = (offsets[:-1] + counts)[has]
        delta = np.zeros(len(h) + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
        valid = np.cumsum(delta[:-1]) > 0
        hv = np.where(valid, h, np.uint64(0xFFFFFFFFFFFFFFFF))
        fp_min[has] = np.minimum.reduceat(hv, starts)
        hx = np.where(valid, h, np.uint64(0))
        fp_xor[has] = np.bitwise_xor.reduceat(hx, starts)
        # reduceat over [start, next_start) would leak into the gap; gaps are
        # already neutralized (max for min, 0 for xor) — but reduceat segments
        # must end before the next doc's start, which they do because we pass
        # each doc's own start and numpy reduces to the following start; the
        # trailing segment after the last start runs to the end of h, whose
        # tail belongs to later docs' gaps — also neutralized.
    for name, col in [
        ("fp_count", pa.array(counts.astype(np.int64))),
        ("fp_min", pa.array(fp_min.view(np.int64), mask=~has)),
        ("fp_xor", pa.array(fp_xor.view(np.int64), mask=~has)),
    ]:
        out = out.append_column(name, col)
    return out


def add_text_quality(ds, *, text_col: str = "text"):
    return ds.map_batches(
        lambda t: text_quality_batch(t, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def add_lang_id(ds, *, text_col: str = "text"):
    return ds.map_batches(
        lambda t: lang_id_batch(t, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def add_fingerprints(ds, *, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)):
    return ds.map_batches(
        lambda t: fingerprint_batch(t, text_col=text_col, id_cols=id_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Token frequency / vocabulary (heavy hitters, exact)
# ---------------------------------------------------------------------------

SPLIT_RE = r"[^a-z0-9]+"


def tokenize_batch(
    t: pa.Table, *, text_col: str = "text", pattern: str = SPLIT_RE
) -> pa.Array:
    """Lowercase + regex-split one batch's text column to a flat token
    array — all Arrow kernels (utf8_lower / split_pattern_regex /
    list_flatten), no Python per row.  Null text contributes nothing."""
    col = t[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = pc.list_flatten(pc.split_pattern_regex(pc.utf8_lower(arr), pattern))
    return flat.filter(pc.not_equal(flat, ""))


def token_bucket_ids(
    texts: pa.Array | pa.ChunkedArray,
    n_buckets: int,
    *,
    pattern: str = r"[^a-z0-9]+",
) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, bucket) of every token of every string, for hashed
    bag-of-words features (DSIR-style bucketed unigrams).

    Tokens: lowercase split on ``pattern``, empty tokens dropped.  Bucket:
    Horner codepoint polynomial mod 2^64 mod ``n_buckets`` — the same
    SQL-replayable convention as :func:`feast_ray.stages.dedup.simhash64`
    (sans its seed-xor/mix step), so a DuckDB twin can recompute every
    bucket with ``list_reduce`` over ``unicode(c)`` exactly.  Vectorized
    across all tokens via one loop over the max token LENGTH.
    """
    row_of, h = token_hash64(texts, pattern=pattern)
    return row_of, (h % np.uint64(n_buckets)).astype(np.int64)


def token_hash64(
    texts: pa.Array | pa.ChunkedArray,
    *,
    pattern: str = r"[^a-z0-9]+",
) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, uint64 Horner hash) of every token of every string —
    the raw 64-bit token identity :func:`token_bucket_ids` buckets, also
    consumed directly by sketch builders (Count-Min) that derive several
    independent cells from one hash.  Same SQL-replayable convention
    (codepoint polynomial, base ``GRAM_BASE``, mod 2^64)."""
    from feast_ray.stages.dedup import GRAM_BASE, _flat_codepoints

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    split = pc.split_pattern_regex(pc.utf8_lower(texts), pattern)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = pc.fill_null(pc.list_value_length(split), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = split.flatten()
    if len(flat) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    data, offsets = _flat_codepoints(flat)
    lens = np.diff(offsets)
    h = np.zeros(len(lens), dtype=np.uint64)
    pos = offsets[:-1]
    d = data.astype(np.uint64)
    for j in range(int(lens.max()) if len(lens) else 0):
        upd = lens > j
        h[upd] = h[upd] * GRAM_BASE + d[(pos + j)[upd]]
    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = lens > 0
    return row_of[keep], h[keep]


def bpe_train(
    ds,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    pattern: str = r"[^a-z0-9]+",
) -> "pa.Table":
    """Train a BPE merge table on the corpus (Sennrich et al. 2016): the
    classic tokenizer-construction step of an LLM data pipeline.

    Shape: ONE corpus scan builds the distinct (word, count) table (map-
    side partial counts, word-keyed fold) — every later round runs over
    that compressed table, so merge training is corpus-size-independent
    after the first exchange (the standard word-frequency formulation).
    Each round: vectorized adjacent-pair extraction over space-joined
    symbol strings (split offsets + binary_join, no per-word Python),
    pair-keyed fold, 1-row sorted head (count desc, then lexical pair —
    the deterministic tie rule), then one map applying the merge as a
    sentinel-padded non-overlapping left-to-right replace.  Only the
    winning pair row reaches the driver each round.

    Returns the merge table (rank, left, right, pair_count).  Determinism
    is pinned by the pure-python twin in tests.  Scale note: the word
    table is vocabulary-sized (millions of rows at web scale — still tiny
    next to the corpus); n_merges rounds = n_merges linear passes over it.
    """
    import numpy as np

    from feast_ray.grouped import grouped_map, sorted_head

    def word_counts(t: pa.Table) -> pa.Table:
        flat = tokenize_batch(t, text_col=text_col, pattern=pattern)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {"word": enc.dictionary, "cnt": pa.array(cnt.astype(np.int64))}
        )

    def fold_counts(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return t
        firsts = starts[:-1]
        c = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        key = t.column_names[0]
        return pa.table(
            {key: pc.take(t[key].combine_chunks(), pa.array(firsts)),
             "cnt": pa.array(np.add.reduceat(c, firsts).astype(np.int64))}
        )

    words = grouped_map(
        ds.map_batches(word_counts, batch_format="pyarrow", zero_copy_batch=True),
        ["word"],
        fold_counts,
    )

    def to_syms(t: pa.Table) -> pa.Table:
        w = t["word"].combine_chunks() if isinstance(
            t["word"], pa.ChunkedArray
        ) else t["word"]
        # space-join the characters: symbols are [a-z0-9]+ substrings, so
        # the space separator can never collide with symbol content
        syms = pc.binary_join(pc.ascii_split_whitespace(
            pc.replace_substring_regex(w, "(.)", r"\1 ")
        ), " ")
        return pa.table({"sym": syms, "cnt": t["cnt"]})

    table = words.map_batches(
        to_syms, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    merges: list[dict] = []
    for rank in range(n_merges):

        def pair_counts(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"pair": pa.array([], pa.string()),
                     "cnt": pa.array([], pa.int64())}
                )
            syms = t["sym"].combine_chunks() if isinstance(
                t["sym"], pa.ChunkedArray
            ) else t["sym"]
            lists = pc.split_pattern(syms, " ")
            flat = lists.flatten()
            parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
            n = len(flat)
            if n < 2:
                return pa.table(
                    {"pair": pa.array([], pa.string()),
                     "cnt": pa.array([], pa.int64())}
                )
            same = parent[1:] == parent[:-1]
            left = flat.slice(0, n - 1).filter(pa.array(same))
            right = flat.slice(1, n - 1).filter(pa.array(same))
            w = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
            pw = w[parent[1:][same]]
            pair = pc.binary_join_element_wise(left, right, " ")
            enc = pair.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            agg = np.zeros(len(enc.dictionary), dtype=np.int64)
            np.add.at(agg, codes, pw)
            return pa.table(
                {"pair": enc.dictionary, "cnt": pa.array(agg)}
            )

        pairs = grouped_map(
            table.map_batches(
                pair_counts, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["pair"],
            fold_counts,
        )
        best = sorted_head(pairs, ["cnt", "pair"], [True, False], 1).take_all()
        if not best:
            break
        bp, bc = best[0]["pair"], int(best[0]["cnt"])
        l, r = bp.split(" ")
        merges.append(
            {"rank": rank, "left": l, "right": r, "pair_count": bc}
        )

        def apply_merge(t: pa.Table, bp=bp, l=l, r=r) -> pa.Table:
            syms = t["sym"].combine_chunks() if isinstance(
                t["sym"], pa.ChunkedArray
            ) else t["sym"]
            padded = pc.binary_join_element_wise(
                pa.array([""] * len(syms)), syms, pa.array([""] * len(syms)), " "
            )
            rep = pc.replace_substring(padded, f" {bp} ", f" {l}{r} ")
            rep = pc.utf8_trim_whitespace(rep)
            return pa.table({"sym": rep, "cnt": t["cnt"]})

        table = table.map_batches(
            apply_merge, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return pa.table(
        {"rank": pa.array([m["rank"] for m in merges], pa.int64()),
         "left": pa.array([m["left"] for m in merges], pa.string()),
         "right": pa.array([m["right"] for m in merges], pa.string()),
         "pair_count": pa.array([m["pair_count"] for m in merges], pa.int64())}
    )


def token_count_topk(
    ds,
    *,
    text_col: str = "text",
    k: int = 50,
    pattern: str = SPLIT_RE,
    num_buckets=None,
):
    """EXACT top-k most frequent tokens across the corpus, ties broken by
    token ascending.  The classic vocabulary/heavy-hitter step of a
    training-data pipeline (beyond the reference — Feast has no text ops).

    Shape: per-batch ``value_counts`` acts as the map-side combiner (the
    shuffle carries one row per DISTINCT token per batch, not per
    occurrence), one grouped exchange sums counts int64-exact, each reduce
    block keeps a local top-k, and the final global sort runs over at most
    k x n_blocks rows — never the vocabulary."""
    from feast_ray.grouped import grouped_map

    def partial(t: pa.Table) -> pa.Table:
        toks = tokenize_batch(t, text_col=text_col, pattern=pattern)
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(toks)
        return pa.table({"token": vc.field("values"), "cnt": vc.field("counts")})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def sum_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        firsts = starts[:-1]
        tok = t["token"].combine_chunks().take(pa.array(firsts))
        return pa.table(
            {"token": tok, "cnt": pa.array(np.add.reduceat(cnt, firsts))}
        )

    counts = grouped_map(partials, ["token"], sum_kernel, num_buckets=num_buckets)

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("token", "ascending")]
        )
        return t.take(idx[:k])

    pruned = counts.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    from feast_ray.grouped import sorted_head

    return sorted_head(pruned, ["cnt", "token"], [True, False], k)


def tfidf_top_term(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int,
    pattern: str = SPLIT_RE,
    num_buckets=None,
):
    """Per-document top TF-IDF term: the token maximizing
    ``tf * ln(n_docs / df)`` (ties broken by token ascending), with its tf
    and df.  The keyword-extraction step of a corpus pipeline (beyond the
    reference — Feast has no text ops).

    Pipeline shape (three narrow shuffles, document text never re-shuffles):
    per-batch (doc, token, tf) rows — a document is one row, so tf is
    batch-local and exact; df = grouped count of that table by token;
    tf x df co-partitioned equi-join on token; per-doc vectorized argmax.
    ``n_docs`` is passed in (a parquet-metadata count) so the pipeline
    stays one pass.  Documents with no tokens are absent — callers left-join
    if they need total coverage.  The score itself is not emitted: tf/df are
    integers, and the argmax is invariant to last-ulp ln() differences
    unless two distinct (tf, df) pairs collide to ~1e-15 relative.
    """
    from feast_ray.grouped import grouped_map, starts_to_group_index
    from feast_ray.stages.join import equi_join

    def tf_rows(t: pa.Table) -> pa.Table:
        col = t[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        doc_of = pc.take(ids, pa.array(np.repeat(np.arange(len(lens)), lens)))
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        doc_of = doc_of.filter(keep)
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        # count per (doc, token) within the batch — each doc is one input
        # row, so these tf values are final
        import pandas as pd

        codes, _ = pd.factorize(
            pd.MultiIndex.from_arrays(
                [doc_of.to_numpy(zero_copy_only=False), flat.to_numpy(zero_copy_only=False)]
            ),
            sort=False,
        )
        tf = np.bincount(codes)
        _, first_idx = np.unique(codes, return_index=True)
        take = pa.array(first_idx.astype(np.int64))
        return pa.table(
            {
                id_col: pc.take(doc_of, take).cast(pa.int64()),
                "token": pc.take(flat, take),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    # consumed twice (df count + join left side): materialize so the
    # tokenize/factorize pass runs once — O(corpus tokens) int64+token rows
    # in the object store, which spills rather than recomputing at scale
    tf_tbl = ds.map_batches(
        tf_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def df_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        return pa.table(
            {
                "token": pc.take(t["token"].combine_chunks(), pa.array(firsts)),
                "df": pa.array(np.diff(starts).astype(np.int64)),
            }
        )

    df_tbl = grouped_map(tf_tbl, ["token"], df_kernel, num_buckets=num_buckets)
    joined = equi_join(tf_tbl, df_tbl, keys=["token"], how="inner", num_buckets=num_buckets)

    def argmax_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "top_token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf * np.log(float(n_docs) / dfv)
        firsts = starts[:-1]
        gidx = starts_to_group_index(starts)
        gmax = np.maximum.reduceat(score, firsts)
        hits = np.flatnonzero(score == gmax[gidx])
        # bucket sorted by (doc, token): first hit per group = min token
        _, first_of = np.unique(gidx[hits], return_index=True)
        take = pa.array(hits[first_of])
        return pa.table(
            {
                id_col: pc.take(t[id_col].combine_chunks(), take),
                "top_token": pc.take(t["token"].combine_chunks(), take),
                "tf": pc.take(t["tf"].combine_chunks(), take),
                "df": pc.take(t["df"].combine_chunks(), take),
            }
        )

    return grouped_map(
        joined, [id_col], argmax_kernel, sort_keys=["token"], num_buckets=num_buckets
    )


def repetition_batch(
    t: pa.Table, *, text_col: str = "text", pattern: str = SPLIT_RE
) -> pa.Table:
    """Within-document repetition signals (the Gopher/RefinedWeb-style
    quality filters an LLM corpus pipeline applies before training): per
    doc, exact token totals, distinct-token count, the count of the single
    most frequent token, and total/distinct bigram counts.  All-integer
    outputs so a SQL twin reproduces them bit-exact; the duplicate-bigram
    FRACTION is one float division away downstream.

    Beyond the reference (Feast has no text operators).  Doc-local by
    construction — a document is one row — so this is an embarrassingly
    parallel map: no shuffle, no state.  Vectorized across the whole batch:
    one regex split, one dictionary-encode, then numpy lexsort/reduceat
    over (doc, code) and (doc, bigram-code) pair arrays — no Python loop
    over rows or tokens.
    """
    col = t[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # '+'-quantified split only yields '' at string edges, so dropping them
    # never changes interior adjacency (bigrams stay faithful)
    codes_arr = flat.dictionary_encode()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    parent = parent[keep]
    codes = codes[keep]
    n = t.num_rows

    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)

    out = {
        "n_tokens": n_tokens,
        "n_distinct_tokens": np.zeros(n, dtype=np.int64),
        "top_tok_cnt": np.zeros(n, dtype=np.int64),
        "n_bigrams": np.maximum(n_tokens - 1, 0),
        "n_distinct_bigrams": np.zeros(n, dtype=np.int64),
    }
    if len(codes):
        # distinct tokens + max single-token count, per doc
        order = np.lexsort((codes, parent))
        p_s, c_s = parent[order], codes[order]
        new_run = np.empty(len(c_s), dtype=bool)
        new_run[0] = True
        new_run[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_starts, len(c_s)))
        run_doc = p_s[run_starts]
        out["n_distinct_tokens"] = np.bincount(run_doc, minlength=n).astype(np.int64)
        doc_first_run = np.searchsorted(run_doc, np.arange(n))
        has = n_tokens > 0
        safe = np.minimum(doc_first_run, len(run_len) - 1)
        top = np.zeros(n, dtype=np.int64)
        if len(run_len):
            top[has] = np.maximum.reduceat(run_len, safe[has])
        out["top_tok_cnt"] = top

        # bigrams: adjacent token pairs within the same doc
        adj = parent[:-1] == parent[1:]
        if adj.any():
            vocab = int(codes.max()) + 1
            bg = codes[:-1][adj] * vocab + codes[1:][adj]
            bg_doc = parent[:-1][adj]
            order2 = np.lexsort((bg, bg_doc))
            pd_s, bg_s = bg_doc[order2], bg[order2]
            new2 = np.empty(len(bg_s), dtype=bool)
            new2[0] = True
            new2[1:] = (pd_s[1:] != pd_s[:-1]) | (bg_s[1:] != bg_s[:-1])
            out["n_distinct_bigrams"] = np.bincount(
                pd_s[new2], minlength=n
            ).astype(np.int64)

    cols = {name: t[name] for name in t.column_names if name != text_col}
    cols.update({k: pa.array(v) for k, v in out.items()})
    return pa.table(cols)


def add_repetition(ds, *, text_col: str = "text", pattern: str = SPLIT_RE):
    """Repetition-signal columns for every document (see
    :func:`repetition_batch`)."""
    return ds.map_batches(
        lambda t: repetition_batch(t, text_col=text_col, pattern=pattern),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def redact_batch(
    t: pa.Table,
    *,
    pattern: str,
    replacement: str = "[REDACTED]",
    text_col: str = "text",
    out_col: str = "text_clean",
    count_col: str = "n_redacted",
) -> pa.Table:
    """Denylist scrubbing (the corpus-cleaning stage that strips PII /
    blocked terms before training): replace every match of ``pattern``
    (RE2) with ``replacement`` and count the matches per document.  Two
    vectorized Arrow kernels (count_substring_regex +
    replace_substring_regex), no Python per row; NULL text stays NULL with
    count 0."""
    col = t[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = pc.count_substring_regex(arr, pattern).fill_null(0).cast(pa.int64())
    clean = pc.replace_substring_regex(arr, pattern, replacement)
    out = t.append_column(out_col, clean)
    return out.append_column(count_col, n)


def add_redaction(ds, *, pattern: str, replacement: str = "[REDACTED]", text_col="text"):
    return ds.map_batches(
        lambda t: redact_batch(
            t, pattern=pattern, replacement=replacement, text_col=text_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def chunk_texts(
    ds,
    *,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    chunk_tokens: int = 32,
    stride_tokens: int = 24,
    pattern: str = SPLIT_RE,
    idx_name: str = "chunk_idx",
    out_name: str = "chunk_text",
    len_name: str = "n_tokens",
):
    """Split each document into overlapping token windows — the
    context-window preparation step of an LLM training pipeline (chunk for
    embedding / packing; beyond the reference, which has no text ops).

    Tokenization is the engine's standard lowercase ``[^a-z0-9]+`` split
    with empties dropped; chunk k covers tokens ``[k*stride, min(k*stride
    + chunk, m))`` and the chunk count ``1 + ceil((m - chunk)/stride)``
    (min 1) guarantees the last window reaches the document end.  Chunk
    text is the window's tokens joined by single spaces (re-normalized,
    NOT a substring of the original).  Token-less docs emit nothing.

    Embarrassingly parallel — no shuffle: per batch, one regex split, one
    gather of (overlapping) token indices, one ``binary_join``.  Output
    rows carry ``id_cols`` so a downstream exchange can re-key by chunk.
    """
    if chunk_tokens <= 0 or stride_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    id_cols = list(id_cols)
    size, stride = int(chunk_tokens), int(stride_tokens)

    def f(t: pa.Table) -> pa.Table:
        col = t[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(arr)
        empty = {
            **{c: t[c].combine_chunks().slice(0, 0) for c in id_cols},
            idx_name: pa.array([], type=pa.int64()),
            out_name: pa.array([], type=pa.string()),
            len_name: pa.array([], type=pa.int64()),
        }
        if n == 0:
            return pa.table(empty)
        lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
        flat = flat.filter(pa.array(keep))
        doc_of_tok = doc_of_tok[keep]
        m = np.bincount(doc_of_tok, minlength=n).astype(np.int64)
        tok_base = np.concatenate(([0], np.cumsum(m)[:-1]))
        n_chunks = np.where(
            m == 0, 0, 1 + np.maximum(-(-(m - size) // stride), 0)
        ).astype(np.int64)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(empty)
        doc = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        chunk_off = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        k = np.arange(total, dtype=np.int64) - np.repeat(chunk_off, n_chunks)
        start = k * stride
        end = np.minimum(start + size, m[doc])
        csize = end - start
        tot_tok = int(csize.sum())
        out_off = np.concatenate(([0], np.cumsum(csize)))
        within = np.arange(tot_tok, dtype=np.int64) - np.repeat(out_off[:-1], csize)
        take = np.repeat(tok_base[doc] + start, csize) + within
        toks = pc.take(flat, pa.array(take))
        la = pa.ListArray.from_arrays(pa.array(out_off, type=pa.int32()), toks)
        joined = pc.binary_join(la, " ")
        cols = {
            c: pc.take(t[c].combine_chunks(), pa.array(doc)) for c in id_cols
        }
        cols[idx_name] = pa.array(k)
        cols[out_name] = joined
        cols[len_name] = pa.array(csize)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def cooccurrence_topk(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    max_doc_tokens: Optional[int] = None,
    pattern: str = SPLIT_RE,
    num_buckets=None,
):
    """Top-k co-occurring token pairs across the corpus with their document
    frequencies — the integer EVIDENCE for PMI / collocation scoring
    (``log`` itself is left to the consumer: libm differs across engines,
    the counts don't).  Output: (tok_a < tok_b, n_ab docs containing both,
    df_a, df_b), ordered by ``n_ab DESC, tok_a, tok_b``.

    Shape: distinct (doc, token) per batch IS globally distinct (one row =
    one doc), so no dedup exchange; one grouped exchange by doc generates
    in-doc pairs (positional pairs over the exchange's token-sorted groups
    are automatically lexical ``a < b``); pair counting and marginals run
    map-side-combined (`stats.partial_count_sum`); the global order is a
    final sort over block-local top-k survivors, never the pair space.

    ``max_doc_tokens`` DROPS docs with more distinct tokens (pairs grow
    quadratically — at corpus scale cap it and count the drops); None
    keeps everything.
    """
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import partial_count_sum

    def distinct_dt(t: pa.Table) -> pa.Table:
        col = t[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(arr)
        ids = t[id_col].combine_chunks()
        empty = pa.table(
            {"doc_id": ids.slice(0, 0), "token": pa.array([], pa.string())}
        )
        if n == 0:
            return empty
        lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        if len(doc_of) == 0:
            return empty
        codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        vocab = int(codes.max()) + 1
        uniq, first_idx = np.unique(doc_of * vocab + codes, return_index=True)
        take = pa.array(first_idx)
        return pa.table(
            {"doc_id": pc.take(ids, pa.array(doc_of[first_idx])),
             "token": pc.take(flat, take)}
        )

    dt = ds.map_batches(distinct_dt, batch_format="pyarrow", zero_copy_batch=True)

    def pair_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        tok = t["token"].combine_chunks()
        if max_doc_tokens is not None:
            sizes = np.diff(starts)
            keep_g = sizes <= max_doc_tokens
            if not keep_g.all():
                mask = np.repeat(keep_g, sizes)
                tok = tok.filter(pa.array(mask))
                starts = np.concatenate(([0], np.cumsum(sizes[keep_g])))
        from feast_ray.stages.dedup import pairs_within_groups

        pos = np.arange(len(tok), dtype=np.int64)
        L, R = pairs_within_groups(pos, starts)
        return pa.table(
            {"tok_a": pc.take(tok, pa.array(L)), "tok_b": pc.take(tok, pa.array(R))}
        )

    pairs = grouped_map(dt, ["doc_id"], pair_kernel, sort_keys=["token"],
                        num_buckets=num_buckets)
    counted = partial_count_sum(pairs, ["tok_a", "tok_b"], count_name="n_ab",
                                num_buckets=num_buckets)

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n_ab", "descending"), ("tok_a", "ascending"),
                          ("tok_b", "ascending")]
        )
        return t.take(idx[:k])

    top = counted.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    from feast_ray.grouped import sorted_head

    top = sorted_head(top, ["n_ab", "tok_a", "tok_b"], [True, False, False], k)

    # marginals: the survivors are <= k rows, so broadcast their token set,
    # filter the distributed df count down to <= 2k rows, and join locally —
    # two whole-table join exchanges replaced by one tiny collect (O(k)
    # driver state by construction)
    import ray.data as rd

    top_tbl = pa.concat_tables(
        list(top.iter_batches(batch_format="pyarrow"))
        or [pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64())})]
    )
    want_toks = pa.array(
        sorted(set(top_tbl["tok_a"].to_pylist()) | set(top_tbl["tok_b"].to_pylist())),
        pa.string(),
    )
    df = partial_count_sum(dt, ["token"], count_name="df", num_buckets=num_buckets)

    def keep_wanted(t: pa.Table) -> pa.Table:
        if len(want_toks) == 0 or t.num_rows == 0:
            return t.slice(0, 0)
        return t.filter(pc.is_in(t["token"], value_set=want_toks))

    df_small = pa.concat_tables(
        list(
            df.map_batches(keep_wanted, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")
        )
        or [pa.table({"token": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64())})]
    )
    lut = dict(zip(df_small["token"].to_pylist(), df_small["df"].to_pylist()))
    out = top_tbl.append_column(
        "df_a", pa.array([lut[v] for v in top_tbl["tok_a"].to_pylist()], pa.int64())
    ).append_column(
        "df_b", pa.array([lut[v] for v in top_tbl["tok_b"].to_pylist()], pa.int64())
    )
    return rd.from_arrow(out)


def token_entropy(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = SPLIT_RE,
):
    """Per-document unigram (token) Shannon entropy in bits — the lexical-
    diversity quality signal of an LLM-data pipeline: boilerplate, keyword
    stuffing and template spam sit far below prose of the same length.
    ZERO shuffles: a document is one input row, so its token counts, the
    entropy identity ``H = log2(N) - SUM_t c_t*log2(c_t) / N`` and the
    output row are all batch-local.

    Exactness contract (same as ``stats.grouped_entropy``): per-token terms
    are fixed-pointed to micro-bits (``ROUND(c*log2(c)*1e6)`` int64, half-
    away) so the cross-token sum is exact; the final float ops run in a
    fixed schedule via pyarrow kernels (pc.log2 is bit-identical to DuckDB's
    log2 on this platform; numpy's is not).  Documents with zero tokens are
    absent from the output (SQL twin: the tokens CTE drops them).
    """
    import pandas as pd

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_types": pa.array([], pa.int64()),
            "entropy_bits": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        col = t[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        doc_row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_row = doc_row[keep]
        if len(doc_row) == 0:
            return empty
        # count per (doc, token) — batch-local and final (1 doc = 1 row)
        codes, _ = pd.factorize(
            pd.MultiIndex.from_arrays(
                [doc_row, flat.to_numpy(zero_copy_only=False)]
            ),
            sort=False,
        )
        c = np.bincount(codes).astype(np.int64)
        _, first_idx = np.unique(codes, return_index=True)
        doc_of_pair = doc_row[first_idx]
        cd = pa.array(c.astype(np.float64))
        term = pc.cast(
            pc.round(pc.multiply(pc.multiply(cd, pc.log2(cd)), 1_000_000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        n_docs = len(lens)
        # int sums in float64 stay exact well below 2^53 per document
        term_sum = np.bincount(doc_of_pair, weights=term, minlength=n_docs)
        n_tok = np.bincount(doc_row, minlength=n_docs).astype(np.int64)
        n_typ = np.bincount(doc_of_pair, minlength=n_docs).astype(np.int64)
        present = np.flatnonzero(n_tok > 0)
        nd = pa.array(n_tok[present].astype(np.float64))
        h = pc.subtract(
            pc.log2(nd),
            pc.divide(pc.divide(pa.array(term_sum[present]), 1_000_000.0), nd),
        )
        return pa.table({
            id_col: pc.take(ids, pa.array(present)).cast(pa.int64()),
            "n_tokens": pa.array(n_tok[present]),
            "n_types": pa.array(n_typ[present]),
            "entropy_bits": h,
        })

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def pattern_counts(
    ds,
    patterns: dict[str, str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document non-overlapping match counts of named RE2 patterns —
    the PII / boilerplate profiler of a curation pipeline (emails, URLs,
    phone-ish digit runs) run BEFORE deciding to redact or drop.  Stateless
    vectorized ``map_batches``: pyarrow's ``count_substring_regex`` and
    DuckDB's ``regexp_extract_all`` are both RE2 with the same
    leftmost-non-overlapping scan, so the SQL twin is exact.  Text is
    lowercased once per batch; one output column per pattern name.
    """
    items = sorted(patterns.items())

    def kernel(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        low = pc.utf8_lower(arr)
        cols = {id_col: t[id_col]}
        for name, pat in items:
            cols[name] = pc.cast(pc.count_substring_regex(low, pat), pa.int64())
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def zipf_slope(
    ds,
    *,
    text_col: str = "text",
    pattern: str = SPLIT_RE,
    min_count: int = 3,
    num_buckets=None,
) -> pa.Table:
    """Zipf-law fit of the corpus token-frequency distribution: the OLS
    slope of ``log2(freq)`` against ``log2(rank)`` over the vocabulary
    (tokens with ``count >= min_count``) — natural text sits near -1;
    template/boilerplate corpora flatten, spam steepens.  A one-row
    corpus-health summary.

    Distribution of work: per-batch token-count partials -> one grouped
    exchange to exact vocabulary counts -> the engine's range-partitioned
    ``global_order_index`` assigns frequency ranks (col = -count,
    tiebreak = a Horner codepoint hash of the token; rank order within a
    tied count is irrelevant — every regression sum is invariant to
    permutations among equal-frequency tokens, so hash collisions inside a
    tie block are harmless) -> per-block one-row partial sums of
    fixed-point milli-log terms (int64-exact, order-free) -> a driver fold
    of block partials and one fixed-schedule float combination matching
    the SQL twin bit-for-bit.  Nothing vocabulary-sized reaches the driver.
    """
    from feast_ray.stages.dedup import GRAM_BASE, _flat_codepoints
    from feast_ray.stages.stats import global_order_index, partial_count_sum

    def toks(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        flat = pc.list_flatten(pc.split_pattern_regex(pc.utf8_lower(arr), pattern))
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    counts = partial_count_sum(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], count_name="cnt", num_buckets=num_buckets,
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["cnt"], min_count))
        tok = t["token"].combine_chunks()
        data, offsets = _flat_codepoints(tok)
        lens = np.diff(offsets)
        h = np.zeros(len(tok), np.uint64)
        firsts = offsets[:-1]
        for j in range(int(lens.max()) if len(lens) else 0):
            sel = lens > j
            h[sel] = h[sel] * GRAM_BASE + data[firsts[sel] + j]
        return pa.table({
            "cnt": t["cnt"].combine_chunks(),
            "neg": pc.negate(t["cnt"].combine_chunks()),
            "th": pa.array(h.view(np.int64)),
        })

    ranked = global_order_index(
        counts.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "neg", tiebreak="th", pos_name="r0", num_buckets=num_buckets,
    )

    def term_partial(t: pa.Table) -> pa.Table:
        cols = ["n", "sx", "sy", "sxx", "sxy"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        rank = pc.cast(pc.add(t["r0"], 1), pa.float64())
        cnt = pc.cast(t["cnt"], pa.float64())
        mk = lambda a: pc.cast(
            pc.round(pc.multiply(pc.log2(a), 1000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        xm, ym = mk(rank), mk(cnt)
        vals = [len(xm), xm.sum(), ym.sum(), (xm * xm).sum(), (xm * ym).sum()]
        return pa.table({c: pa.array([int(v)], pa.int64()) for c, v in zip(cols, vals)})

    rows = ranked.map_batches(
        term_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = sum(int(r["n"]) for r in rows)
    if n < 2:
        raise ValueError("zipf_slope: vocabulary too small to fit")
    sx = float(sum(int(r["sx"]) for r in rows))
    sy = float(sum(int(r["sy"]) for r in rows))
    sxx = float(sum(int(r["sxx"]) for r in rows))
    sxy = float(sum(int(r["sxy"]) for r in rows))
    nd = float(n)
    slope = (sxy - sx * sy / nd) / (sxx - sx * sx / nd)
    return pa.table({
        "n_vocab": pa.array([n], pa.int64()),
        "zipf_slope": pa.array([slope], pa.float64()),
    })
