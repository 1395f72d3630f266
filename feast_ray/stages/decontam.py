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
