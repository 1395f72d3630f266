"""Benchmark decontamination: flag training documents that share a token
w-shingle with an evaluation set.

The standard LLM-corpus hygiene step (GPT-3 / PaLM / Llama reports all
describe n-gram–overlap decontamination): any training document containing
an n-token shingle that also occurs in a held-out benchmark is flagged (and
usually dropped).  Beyond the reference — Feast has no text operators; the
oracle semantics are plain SQL over the shingle relation.

Shape (two bounded shuffles, no driver state):

1. ``shingle_table``: one embarrassingly-parallel map emits
   ``(id, shingle)`` rows — tokens via the engine's shared regex split,
   shingles via ONE ``binary_join_element_wise`` over ``w`` shifted slices
   of the flat token array (masked to stay inside a document).  No Python
   per row or per token.
2. Shingles of the eval side are the right side of a co-partitioned
   ``semi_join`` on the shingle string (``stages.join``): one hash exchange
   of ``(shingle, doc_id)`` rows; duplicate eval shingles don't fan out.
3. One grouped exchange by ``id`` counts DISTINCT shared shingles per
   training doc (run detection over the bucket's local sort — the same
   vectorized pattern every grouped kernel here uses).

Scale notes: the shuffle carries shingle STRINGS so the SQL twin is exact;
at 100 TB swap step 2's key for the 64-bit splitmix shingle hash (same
payload width, engine-internal) — the pipeline shape is unchanged.  The
eval side is typically tiny; when it fits a broadcast, replace the
semi-join with a ``ray.put`` set probe inside the map — kept as the
co-partitioned form here because correctness must not depend on the eval
corpus fitting anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map
from feast_ray.stages.join import semi_join
from feast_ray.stages.text import SPLIT_RE


def shingle_batch(
    t: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    pattern: str = SPLIT_RE,
) -> pa.Table:
    """``(id, shingle)`` rows for every w-token shingle of every document
    in the batch (shingle = the w tokens joined with a single space)."""
    col = t[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    n_flat = len(flat)
    empty = pa.table(
        {
            id_col: pa.array([], t[id_col].type),
            "shingle": pa.array([], pa.string()),
        }
    )
    if n_flat < w:
        return empty
    # a shingle starting at i is valid iff tokens i..i+w-1 share a document
    valid = parent[: n_flat - w + 1] == parent[w - 1 :]
    if not valid.any():
        return empty
    parts = [flat.slice(j, n_flat - w + 1) for j in range(w)]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, " ")
    sel = pa.array(valid)
    ids = pc.take(
        t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
        pa.array(parent[: n_flat - w + 1][valid]),
    )
    return pa.table({id_col: ids, "shingle": joined.filter(sel)})


def shingle_table(ds, *, text_col="text", id_col="doc_id", w=5, pattern=SPLIT_RE):
    return ds.map_batches(
        lambda t: shingle_batch(
            t, text_col=text_col, id_col=id_col, w=w, pattern=pattern
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def decontaminate(
    train_docs,
    eval_docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    pattern: str = SPLIT_RE,
    num_buckets: Optional[int] = None,
):
    """One row per CONTAMINATED training doc: ``(id, n_shared)`` where
    ``n_shared`` counts the distinct w-shingles the doc shares with the
    eval corpus.  Clean docs are absent (anti-join against this result to
    keep the clean corpus)."""
    train_sh = shingle_table(
        train_docs, text_col=text_col, id_col=id_col, w=w, pattern=pattern
    )
    eval_sh = shingle_table(
        eval_docs, text_col=text_col, id_col=id_col, w=w, pattern=pattern
    ).select_columns(["shingle"])
    shared = semi_join(train_sh, eval_sh, keys=["shingle"], num_buckets=num_buckets)
    return _count_shared_distinct(shared, id_col=id_col, num_buckets=num_buckets)


def _count_shared_distinct(shared, *, id_col: str, num_buckets: Optional[int]):
    """Per-doc distinct shared-shingle count over semi-join survivors."""

    def count_distinct(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t[id_col].type),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        # bucket sorted by (id, shingle): count runs of shingle per id
        sh = t["shingle"].combine_chunks()
        codes = sh.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        new_run = np.empty(len(codes), dtype=bool)
        new_run[0] = True
        new_run[1:] = codes[1:] != codes[:-1]
        gidx = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
        new_run[starts[:-1]] = True
        n_shared = np.bincount(
            gidx[new_run], minlength=len(starts) - 1
        ).astype(np.int64)
        firsts = pa.array(starts[:-1])
        return pa.table(
            {
                id_col: pc.take(t[id_col].combine_chunks(), firsts),
                "n_shared": pa.array(n_shared),
            }
        )

    return grouped_map(
        shared, [id_col], count_distinct, sort_keys=["shingle"], num_buckets=num_buckets
    )


def bloom_decontaminate(
    train_docs,
    eval_docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    pattern: str = SPLIT_RE,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    num_buckets: Optional[int] = None,
):
    """:func:`decontaminate` with a Bloom prefilter — SAME EXACT ANSWER,
    a fraction of the shuffle.  The eval shingle set is folded into an
    ``m_bits`` Bloom bitmap (per-batch partial bitmaps OR-combined on the
    driver — the eval/benchmark side is small by definition; the bitmap is
    ``m_bits/8`` bytes regardless of corpus size), broadcast once via
    ``ray.put``, and every TRAINING shingle is probed before the exchange:
    at 100 TB the train-side shingle shuffle shrinks from the whole corpus
    to (contaminated + false-positive) shingles, FP rate ~
    ``(1-e^(-n_hashes*n/m))^n_hashes``.  No false negatives by
    construction (build and probe share the hash family), and survivors
    still pass through the exact co-partitioned semi-join, so Bloom FPs
    cannot reach the output — the SQL twin is the plain shared-shingle
    semi-join, unchanged."""
    import ray

    from feast_ray.grouped import hash_columns

    if m_bits & 7:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8
    eval_sh = shingle_table(
        eval_docs, text_col=text_col, id_col=id_col, w=w, pattern=pattern
    ).select_columns(["shingle"])

    def build_bits(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        if t.num_rows:
            for s in range(n_hashes):
                h = hash_columns(t, ["shingle"], seed=s) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bits,
                    (h >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (h & np.uint64(7)).astype(np.uint8)),
                )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = eval_sh.map_batches(
        build_bits, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    bits = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    bref = ray.put(bits)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        b = ray.get(bref)
        m = np.ones(t.num_rows, dtype=bool)
        for s in range(n_hashes):
            h = hash_columns(t, ["shingle"], seed=s) % np.uint64(m_bits)
            m &= (
                b[(h >> np.uint64(3)).astype(np.int64)]
                >> (h & np.uint64(7)).astype(np.uint8)
            ) & 1 > 0
        return t.filter(pa.array(m))

    train_sh = shingle_table(
        train_docs, text_col=text_col, id_col=id_col, w=w, pattern=pattern
    ).map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    shared = semi_join(train_sh, eval_sh, keys=["shingle"], num_buckets=num_buckets)
    return _count_shared_distinct(shared, id_col=id_col, num_buckets=num_buckets)


def crossdoc_shingle_stats(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    pattern: str = SPLIT_RE,
    num_buckets: Optional[int] = None,
):
    """Per-document corpus-duplication evidence: ``n_shingles`` (the doc's
    distinct w-token shingles) and ``n_dup_shingles`` (those also present
    in at least one OTHER document) — the cross-document duplicate-n-gram
    signal corpus-quality pipelines threshold on (duplicate fraction =
    n_dup/n).  All-integer output so the SQL twin is bit-exact.

    Three bounded exchanges over ``(shingle, doc)`` int64/string rows, no
    driver state: (1) distinct pairs — grouped first-row by (doc, shingle);
    (2) per-shingle distinct-doc flag shuffled by shingle, re-emitting each
    pair tagged dup iff its shingle's group spans >= 2 docs; (3) per-doc
    counts.  Document text leaves the pipeline after the shingle map.
    """

    def first_row(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = pa.array(starts[:-1])
        return pa.table(
            {
                id_col: pc.take(t[id_col].combine_chunks(), firsts),
                "shingle": pc.take(t["shingle"].combine_chunks(), firsts),
            }
        )

    pairs = grouped_map(
        shingle_table(docs, text_col=text_col, id_col=id_col, w=w, pattern=pattern),
        [id_col, "shingle"],
        first_row,
        num_buckets=num_buckets,
    )

    def tag_dup(t: pa.Table, starts: np.ndarray) -> pa.Table:
        # grouped by shingle: pairs are distinct, so group size = doc count
        sizes = np.diff(starts)
        dup = np.repeat(sizes >= 2, sizes)
        return pa.table(
            {
                id_col: t[id_col],
                "dup": pa.array(dup.astype(np.int64)),
            }
        )

    tagged = grouped_map(pairs, ["shingle"], tag_dup, num_buckets=num_buckets)

    def count_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        dup = t["dup"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pc.take(t[id_col].combine_chunks(), pa.array(firsts)),
                "n_shingles": pa.array(np.diff(starts).astype(np.int64)),
                "n_dup_shingles": pa.array(np.add.reduceat(dup, firsts)),
            }
        )

    return grouped_map(tagged, [id_col], count_kernel, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Duplicated-span coverage (exact substring dedup evidence, Lee et al. 2022)
# ---------------------------------------------------------------------------


def shingle_pos_batch(
    t: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    pattern: str = SPLIT_RE,
) -> pa.Table:
    """``(id, pos, shingle)`` rows — like :func:`shingle_batch` but also
    emitting each shingle's 0-based starting TOKEN position within its
    document, needed for span-coverage math."""
    col = t[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    n_flat = len(flat)
    empty = pa.table(
        {
            id_col: pa.array([], t[id_col].type),
            "pos": pa.array([], pa.int64()),
            "shingle": pa.array([], pa.string()),
        }
    )
    if n_flat < w:
        return empty
    valid = parent[: n_flat - w + 1] == parent[w - 1 :]
    if not valid.any():
        return empty
    parts = [flat.slice(j, n_flat - w + 1) for j in range(w)]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, " ")
    # token position within the doc: global flat index minus the doc's
    # first flat index (parent is nondecreasing -> searchsorted)
    starts_idx = np.arange(n_flat - w + 1, dtype=np.int64)[valid]
    par = parent[: n_flat - w + 1][valid]
    first_of_parent = np.searchsorted(parent, par, side="left")
    sel = pa.array(valid)
    ids_col = t[id_col]
    ids_col = ids_col.combine_chunks() if isinstance(ids_col, pa.ChunkedArray) else ids_col
    return pa.table(
        {
            id_col: pc.take(ids_col, pa.array(par)),
            "pos": pa.array(starts_idx - first_of_parent),
            "shingle": joined.filter(sel),
        }
    )


def dup_span_coverage(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    pattern: str = SPLIT_RE,
    num_buckets: Optional[int] = None,
):
    """Per-document duplicated-SPAN coverage — the exact-substring dedup
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): a w-token window is *duplicated* iff its token text
    occurs in >= 2 distinct documents; a document's ``covered_tokens`` is
    the size of the UNION of its duplicated windows' [pos, pos+w) spans
    (merged intervals, not double-counted), and ``covered_frac`` the
    fraction of the doc those spans cover — the quantity dedup policies
    threshold on before cutting repeated boilerplate.

    Distribution: one shingle-keyed exchange tags each window duplicated
    (group spans >= 2 docs), one doc-keyed exchange merges each doc's
    sorted window positions with the closed-form union
    ``sum(min(gap, w)) + w`` — no per-row Python, no driver state.  Text
    leaves the pipeline after the shingle map; only (id, pos) int64 rows
    shuffle to the coverage stage.
    """
    from feast_ray.grouped import starts_to_group_index, starts_to_row_gstart
    from feast_ray.stages.join import equi_join

    sh = docs.map_batches(
        lambda t: shingle_pos_batch(
            t, text_col=text_col, id_col=id_col, w=w, pattern=pattern
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def tag_dup(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        # rows sorted by (shingle, id): a group is dup iff it has >= 2
        # distinct ids -> any within-group id transition
        gidx = starts_to_group_index(starts)
        trans = np.zeros(len(ids), dtype=bool)
        trans[1:] = (ids[1:] != ids[:-1]) & (gidx[1:] == gidx[:-1])
        dup_group = np.zeros(len(starts) - 1, dtype=bool)
        np.logical_or.at(dup_group, gidx, trans)
        m = dup_group[gidx]
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().filter(pa.array(m)),
                "pos": t["pos"].combine_chunks().filter(pa.array(m)),
            }
        )

    dup_wins = grouped_map(
        sh, ["shingle"], tag_dup, sort_keys=[id_col], num_buckets=num_buckets
    )

    def cov_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_dup_windows": pa.array([], pa.int64()),
                    "covered_tokens": pa.array([], pa.int64()),
                }
            )
        p = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        gstart = starts_to_row_gstart(starts)
        contrib = np.full(len(p), w, dtype=np.int64)
        inner = np.arange(len(p)) > gstart  # not the group's first window
        contrib[inner] = np.minimum(p[inner] - p[np.flatnonzero(inner) - 1], w)
        covered = np.add.reduceat(contrib, starts[:-1])
        return pa.table(
            {
                id_col: pc.take(
                    t[id_col].combine_chunks(), pa.array(starts[:-1])
                ),
                "n_dup_windows": pa.array(np.diff(starts).astype(np.int64)),
                "covered_tokens": pa.array(covered),
            }
        )

    cov = grouped_map(
        dup_wins, [id_col], cov_kernel, sort_keys=["pos"], num_buckets=num_buckets
    )

    def totals(t: pa.Table) -> pa.Table:
        col = t[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        # count non-empty tokens per row: flatten once, reduce by parent
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        cnt = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(cnt, parent[keep], 1)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(cnt),
                "n_windows": pa.array(np.maximum(cnt - w + 1, 0)),
            }
        )

    tot = docs.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)
    joined = equi_join(tot, cov, keys=[id_col], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        nd = pc.coalesce(t["n_dup_windows"].combine_chunks(), pa.scalar(0, pa.int64()))
        cv = pc.coalesce(t["covered_tokens"].combine_chunks(), pa.scalar(0, pa.int64()))
        ntok = t["n_tokens"].combine_chunks()
        frac = np.zeros(t.num_rows, dtype=np.float64)
        ntok_np = ntok.to_numpy(zero_copy_only=False).astype(np.float64)
        cv_np = cv.to_numpy(zero_copy_only=False).astype(np.float64)
        nz = ntok_np > 0
        frac[nz] = np.round(cv_np[nz] / ntok_np[nz], 6)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": ntok,
                "n_windows": t["n_windows"],
                "n_dup_windows": nd,
                "covered_tokens": cv,
                "covered_frac": pa.array(frac),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
