"""Driver-contract queries over the documents/embeddings tables: text
analysis, deduplication, similarity, multimodal plumbing.

Each entry returns the same column names its ORACLE_SQL twin produces.
Every query here has a driver-checkable twin: the SimHash pair rule and the
hyperplane-LSH bucketing are recomputed IN SQL (bit-exact, constants baked
in), fingerprints expose a property projection (count closed form +
sketch-group = text-group), and the IVF driver query runs full-probe (which
must equal brute force).  The approximate regimes and raw sketch values
stay pinned by the pure-Python oracles in tests/test_text_dedup.py.
"""

from __future__ import annotations

from feast_ray.sources.parquet import read_pq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.stages.text import (
    ALPHA_RE,
    EN_STOPWORDS,
    LANG_STOPWORDS,
    PUNCT_RE,
    TOKEN_RE,
    WORD_CHAR_RE,
    add_fingerprints,
    add_lang_id,
    add_text_quality,
    stopword_pattern,
)

JACCARD_K = 20
JACCARD_TAU = 0.2
MINHASH_TAU = 0.5
EMB_TAU = 0.4


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return read_pq(f"{sf_dir}/documents.parquet", columns=list(columns))


def q_lang_id_docs(sf_dir: str):
    """Stopword-count language ID (argmax over LANG_STOPWORDS scans)."""
    out = add_lang_id(_docs(sf_dir))
    return out.select_columns(["doc_id", "lang_pred", "lang_score"])


def q_quality_score_docs(sf_dir: str):
    """Quality features: regex-count ratios + heuristic score (raw doubles —
    bit-identical to the SQL twin's arithmetic)."""
    out = add_text_quality(_docs(sf_dir))
    return out.select_columns(
        [
            "doc_id",
            "n_chars",
            "n_tokens",
            "alpha_ratio",
            "punct_ratio",
            "stop_ratio",
            "mean_token_len",
            "quality_score",
        ]
    )


def q_fingerprint_docs(sf_dir: str):
    """Rolling-hash content fingerprints with a driver-checkable property
    output: ``fp_count`` has the closed form GREATEST(octet_length - k + 1,
    0), and docs sharing the full (fp_count, fp_min, fp_xor) sketch are
    exactly the equal-text groups on this corpus — emitted as
    ``fp_group_min`` (min doc_id of the doc's sketch group, one grouped
    shuffle).  The raw int64 sketch values themselves stay pinned by the
    pure-Python oracle in tests/test_text_dedup.py (SQL can't reproduce
    them)."""
    from feast_ray.grouped import grouped_map

    fps = add_fingerprints(_docs(sf_dir))

    def fill(t: pa.Table) -> pa.Table:
        # empty docs carry null sketches; group them under a sentinel
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fp_count": t["fp_count"],
                "fp_min": pc.fill_null(t["fp_min"], -1),
                "fp_xor": pc.fill_null(t["fp_xor"], -1),
            }
        )

    filled = fps.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "fp_count": pa.array([], pa.int64()),
                    "fp_group_min": pa.array([], pa.int64()),
                }
            )
        gmin = np.minimum.reduceat(ids, starts[:-1])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fp_count": t["fp_count"],
                "fp_group_min": pa.array(np.repeat(gmin, np.diff(starts))),
            }
        )

    return grouped_map(filled, ["fp_count", "fp_min", "fp_xor"], kernel)


def q_neardup_jaccard_docs(sf_dir: str):
    """EXACT char-20-gram Jaccard pairs >= 0.2 via distributed inverted index."""
    from feast_ray.stages.dedup import jaccard_pair_pipeline

    return jaccard_pair_pipeline(_docs(sf_dir), k=JACCARD_K, tau=JACCARD_TAU)


def q_dedup_minhash_docs(sf_dir: str):
    """MinHash+LSH near-dedup (candidates LSH, verification exact): keep a
    doc iff no smaller doc_id has Jaccard >= 0.5 with it."""
    from feast_ray.stages.dedup import minhash_dedup_pipeline

    out = minhash_dedup_pipeline(_docs(sf_dir), tau=MINHASH_TAU, k=JACCARD_K)
    return out.select_columns(["doc_id"])


def q_simhash_pairs_docs(sf_dir: str):
    """SimHash pairs with Hamming distance <= 3 (exact via band pigeonhole;
    sketch output — pinned by the brute-force oracle in tests)."""
    from feast_ray.stages.dedup import simhash_pair_pipeline

    return simhash_pair_pipeline(_docs(sf_dir))


def q_neardup_embedding_pairs(sf_dir: str):
    """Embedding cosine near-duplicate pairs >= 0.4 (default blockpair mode
    — distributed chunk-pair exchange, the 100-TB scale path; broadcast is
    an explicit small-corpus opt-in on embedding_pair_pipeline)."""
    import ray.data as rd

    from feast_ray.stages.dedup import embedding_pair_pipeline

    emb = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_pair_pipeline(emb, tau=EMB_TAU)


def q_knn_lsh_topk(sf_dir: str):
    """Approximate ANN: random-hyperplane LSH bucket pruning then exact
    cosine within the bucket (recall pinned by tests, no SQL twin)."""
    import ray.data as rd

    from feast_ray.stages.similarity import lsh_bucket_topk

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = ds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    qvec = np.asarray(q[0]["embedding"], dtype=np.float64)
    return lsh_bucket_topk(ds, qvec, k=10, exclude_ids=(0,), n_planes=4)


def q_multimodal_features(sf_dir: str):
    """Media-column plumbing: attach binary payloads, decode/featurize on an
    actor pool (deterministic fake decoder — the Ray plumbing is real)."""
    from feast_ray.stages.multimodal import add_media_features, attach_fake_payloads

    ds = _docs(sf_dir).map_batches(
        attach_fake_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_media_features(ds, id_cols=("doc_id",), concurrency=2, batch_size=64)
    # byte_mean/byte_std are exercised in tests; the driver compare keeps the
    # SQL-expressible subset
    return out.select_columns(["doc_id", "width", "height", "n_bytes"])


# ---------------------------------------------------------------------------
# Oracle SQL
# ---------------------------------------------------------------------------


def _lang_sql() -> str:
    langs = sorted(LANG_STOPWORDS)  # alphabetical == engine tie-break order
    scores = ",\n           ".join(
        f"len(regexp_extract_all(lower(text), '{stopword_pattern(LANG_STOPWORDS[l])}')) AS s_{l}"
        for l in langs
    )
    all_scores = ", ".join(f"s_{l}" for l in langs)
    # first max in alphabetical order == numpy argmax tie-break
    case = f"WHEN greatest({all_scores}) = 0 THEN 'und'\n"
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{l} >= s_{m}" for m in langs[i + 1 :])
        case += f"               WHEN {conds} THEN '{l}'\n"
    case += f"               ELSE '{langs[-1]}'"
    return f"""
        WITH s AS (
          SELECT doc_id,
           {scores}
          FROM documents)
        SELECT doc_id,
               CASE {case} END AS lang_pred,
               greatest({all_scores}) AS lang_score
        FROM s
    """


def _quality_sql() -> str:
    stop_pat = stopword_pattern(EN_STOPWORDS)
    return f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS n_chars,
                 CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS DOUBLE) AS n_tokens,
                 CAST(len(regexp_extract_all(lower(text), '{WORD_CHAR_RE}')) AS DOUBLE) AS n_word_chars,
                 CAST(len(regexp_extract_all(text, '{ALPHA_RE}')) AS DOUBLE) AS n_alpha,
                 CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE) AS n_punct,
                 CAST(len(regexp_extract_all(lower(text), '{stop_pat}')) AS DOUBLE) AS n_stop
          FROM documents),
        r AS (
          SELECT doc_id, n_chars, n_tokens,
                 CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0 END AS alpha_ratio,
                 CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END AS punct_ratio,
                 CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END AS stop_ratio,
                 CASE WHEN n_tokens > 0 THEN n_word_chars / n_tokens ELSE 0 END AS mean_token_len
          FROM c)
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               alpha_ratio, punct_ratio, stop_ratio, mean_token_len,
               least(n_tokens / 64.0, 1.0) * 0.4
                 + alpha_ratio * 0.4
                 + least(stop_ratio * 4.0, 1.0) * 0.2 AS quality_score
        FROM r
    """


_JACCARD_PAIRS_CTE = f"""
      g AS (SELECT DISTINCT doc_id, substr(text, gs, {JACCARD_K}) AS g
            FROM documents,
                 UNNEST(generate_series(1, length(text) - {JACCARD_K - 1})) AS t(gs)),
      sizes AS (SELECT doc_id, count(*) n FROM g GROUP BY 1),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      jac AS (SELECT doc_a, doc_b, inter * 1.0 / (sa.n + sb.n - inter) AS j
              FROM p JOIN sizes sa ON sa.doc_id = doc_a
                     JOIN sizes sb ON sb.doc_id = doc_b)
"""

QUERIES_DOCS = {
    "lang_id_docs": q_lang_id_docs,
    "quality_score_docs": q_quality_score_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "neardup_jaccard_docs": q_neardup_jaccard_docs,
    "dedup_minhash_docs": q_dedup_minhash_docs,
    "simhash_pairs_docs": q_simhash_pairs_docs,
    "neardup_embedding_pairs": q_neardup_embedding_pairs,
    "knn_lsh_topk": q_knn_lsh_topk,
    "multimodal_features": q_multimodal_features,
}

ORACLE_SQL_DOCS = {
    "lang_id_docs": _lang_sql(),
    "quality_score_docs": _quality_sql(),
    "neardup_jaccard_docs": f"""
        WITH {_JACCARD_PAIRS_CTE}
        SELECT doc_a, doc_b, j AS jaccard FROM jac WHERE j >= {JACCARD_TAU}
    """,
    # LSH misses are (1 - J^2)^32 < 1e-5 at J >= 0.5 and verified absent on
    # this dataset at sf0.01/0.1 — candidates are exact-verified, so the SQL
    # twin (the pure exact rule) matches deterministically.
    "dedup_minhash_docs": f"""
        WITH {_JACCARD_PAIRS_CTE}
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_b FROM jac WHERE j >= {MINHASH_TAU})
    """,
    "neardup_embedding_pairs": f"""
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {EMB_TAU}
    """,
    "multimodal_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
               CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    # Property oracle: fp_count has a closed form (byte k-grams, k=8), and
    # the full sketch (fp_count, fp_min, fp_xor) equals across docs iff the
    # TEXT equals (equal text => equal sketch always; distinct text =>
    # distinct sketch on this corpus — 64-bit min/xor collisions across the
    # battery's document count are ~n^2/2^64).
    "fingerprint_docs": """
        SELECT doc_id,
               CAST(GREATEST(octet_length(encode(text)) - 7, 0) AS BIGINT) AS fp_count,
               MIN(doc_id) OVER (PARTITION BY text) AS fp_group_min
        FROM documents
    """,
}


def _simhash_pairs_sql(seed: int = 17, max_hamming: int = 3) -> str:
    """Full SQL twin of :func:`feast_ray.stages.dedup.simhash64` + the
    pigeonhole pair rule — NOT a weaker property: DuckDB recomputes every
    64-bit signature (token split, polynomial codepoint hash mod 2^64 via
    HUGEINT with a 32-bit split multiply, xor-seed low-bit arithmetic,
    per-bit +/-1 majority vote) and joins all pairs with Hamming <= 3.
    Validated bit-exact against the numpy kernel at sf0.01 and sf0.1."""
    mixc = 0x9E3779B97F4A7C15
    lo, hi = mixc & 0xFFFFFFFF, mixc >> 32
    return f"""
    WITH toks AS (
      SELECT doc_id, u.t AS tok
      FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS u(t)
      WHERE u.t <> ''
    ),
    th AS (
      SELECT doc_id, list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
                       list_transform(str_split(tok, ''), c -> CAST(unicode(c) AS HUGEINT))),
          (a, b) -> (a * 1000003 + b) % CAST(18446744073709551616 AS HUGEINT)) AS h0
      FROM toks
    ),
    xored AS (
      SELECT doc_id,
             h0 - (h0 % 32) + CAST(xor(CAST(h0 % 32 AS BIGINT), {seed}) AS HUGEINT) AS hx
      FROM th
    ),
    mixed AS (
      SELECT doc_id, ((hx % 4294967296) * {lo}
         + (((hx % 4294967296) * {hi} + (hx // 4294967296) * {lo}) % 4294967296)
           * 4294967296)
          % CAST(18446744073709551616 AS HUGEINT) AS h
      FROM xored
    ),
    bits AS (
      SELECT m.doc_id, b.b,
             CAST((m.h // CAST(power(2, b.b) AS HUGEINT)) % 2 AS BIGINT) * 2 - 1 AS w
      FROM mixed m CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
    ),
    sigbits AS (
      SELECT doc_id, b, CASE WHEN SUM(w) > 0 THEN 1 ELSE 0 END AS s
      FROM bits GROUP BY doc_id, b
    ),
    sig0 AS (
      SELECT doc_id, SUM(CAST(s AS HUGEINT) * CAST(power(2, b) AS HUGEINT)) AS sigv
      FROM sigbits GROUP BY doc_id
    ),
    sig AS (
      SELECT d.doc_id,
             CAST(CASE WHEN s.sigv IS NULL THEN 0
                       WHEN s.sigv >= CAST(9223372036854775808 AS HUGEINT)
                         THEN s.sigv - CAST(18446744073709551616 AS HUGEINT)
                       ELSE s.sigv END AS BIGINT) AS sigi
      FROM documents d LEFT JOIN sig0 s USING (doc_id)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sigi, b.sigi)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sigi, b.sigi)) <= {max_hamming}
    """


def _lsh_topk_sql(dim: int = 64, n_planes: int = 4, seed: int = 7, k: int = 10) -> str:
    """SQL twin of :func:`feast_ray.stages.similarity.lsh_bucket_topk`: the
    seeded hyperplane matrix is baked in as float literals (repr round-trips
    float64 exactly), the bucket of every vector is recomputed in SQL, and
    exact cosine top-k runs within the query's bucket.  Assumes the battery
    embeddings are ``dim``-dimensional (they are, per TESTDATA.md)."""
    from feast_ray.stages.similarity import _HyperplaneHasher

    planes = _HyperplaneHasher(dim, n_planes=n_planes, seed=seed).planes  # (dim, P)
    rows = ",\n               ".join(
        "({}, [{}])".format(j, ", ".join(repr(float(x)) for x in planes[:, j]))
        for j in range(n_planes)
    )
    return f"""
    WITH planes(j, v) AS (
      VALUES {rows}
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    qb AS (
      SELECT SUM(CASE WHEN list_inner_product((SELECT qe FROM q), v) > 0
                      THEN 1 << j ELSE 0 END) AS b
      FROM planes
    ),
    buck AS (
      SELECT e.vec_id,
             SUM(CASE WHEN list_inner_product(e.embedding::DOUBLE[], p.v) > 0
                      THEN 1 << p.j ELSE 0 END) AS b
      FROM embeddings e CROSS JOIN planes p
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    )
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], (SELECT qe FROM q)), 6)
             AS cos_sim
    FROM embeddings e JOIN buck b ON e.vec_id = b.vec_id
    WHERE b.b = (SELECT b FROM qb)
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {k}
    """


ORACLE_SQL_DOCS["simhash_pairs_docs"] = _simhash_pairs_sql()
ORACLE_SQL_DOCS["knn_lsh_topk"] = _lsh_topk_sql()


def q_knn_ivf_topk(sf_dir: str):
    """IVF-clustered ANN (the second scale path besides LSH): mini-kmeans
    coarse quantizer, probe-ordered cluster search.  The driver query runs
    FULL-PROBE (nprobe == nlist), which must return exactly the brute-force
    top-k — a completeness invariant of the train→assign→probe→score path
    that the exact-cosine SQL twin checks.  The approximate regime
    (nprobe < nlist) is pinned by the recall tests in
    tests/test_text_dedup.py."""
    import ray.data as rd

    from feast_ray.stages.similarity import ivf_topk

    import pyarrow.parquet as pq

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = ds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    qvec = np.asarray(q[0]["embedding"], dtype=np.float64)
    # train head read locally from the first row group — no Ray tasks
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    train = pa.Table.from_batches(
        [next(pf.iter_batches(batch_size=2048, columns=["vec_id", "embedding"]))]
    )
    return ivf_topk(
        ds, qvec, k=10, exclude_ids=(0,), nlist=16, nprobe=16, train_table=train
    )


QUERIES_DOCS["knn_ivf_topk"] = q_knn_ivf_topk
ORACLE_SQL_DOCS["knn_ivf_topk"] = """
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
             ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)), 6)
               AS cos_sim
      FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def q_frame_sample_docs(sf_dir: str):
    """Video-style frame sampling on an actor pool: payloads are walked as
    fixed 256-byte frames, every 2nd full frame sampled up to 5 — one
    output row per sampled frame (the flat_map shape a real decoder
    feeds).  The SQL twin checks the frame walk arithmetic; the per-frame
    byte statistics (not SQL-expressible over blobs) are pinned by the
    pytest oracle."""
    from feast_ray.stages.multimodal import add_frame_samples, attach_fake_payloads

    ds = _docs(sf_dir).map_batches(
        attach_fake_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_frame_samples(ds, id_cols=("doc_id",), concurrency=2, batch_size=64)
    return out.select_columns(["doc_id", "frame_idx", "frame_off", "frame_len"])


QUERIES_DOCS["frame_sample_docs"] = q_frame_sample_docs
ORACLE_SQL_DOCS["frame_sample_docs"] = """
    WITH d AS (SELECT doc_id, octet_length(encode(text)) // 256 AS n_full
               FROM documents),
    f AS (SELECT doc_id, CAST((u.i - 1) * 2 AS BIGINT) AS frame_idx
          FROM d, unnest(generate_series(1, CAST(LEAST((n_full + 1) // 2, 5) AS INTEGER))) AS u(i)
          WHERE n_full >= 1)
    SELECT doc_id, frame_idx,
           frame_idx * 256 AS frame_off,
           CAST(256 AS BIGINT) AS frame_len
    FROM f
"""


def q_bmp_decode_docs(sf_dir: str):
    """REAL image decode (no image library): each doc gets a deterministic
    24-bit BMP — true on-disk layout (BGR channel order, 4-byte row padding,
    bottom-up) — whose logical top-down RGB byte k is (doc_id%256 + k)%256;
    the actor-pool decoder parses the header and recovers width/height and
    the exact pixel moments.  The DuckDB twin re-derives every pixel with
    generate_series and the identical moment arithmetic (exact integer sums
    -> bit-equal doubles, no epsilon)."""
    from feast_ray.stages.multimodal import add_media_features, attach_bmp_payloads

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        attach_bmp_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_media_features(
        ds, id_cols=("doc_id",), mode="decode", concurrency=2, batch_size=64
    )
    return out.select_columns(
        ["doc_id", "width", "height", "byte_mean", "byte_std", "n_bytes"]
    )


QUERIES_DOCS["bmp_decode_docs"] = q_bmp_decode_docs
ORACLE_SQL_DOCS["bmp_decode_docs"] = """
    WITH dims AS (
      SELECT doc_id, doc_id % 37 + 1 AS w, doc_id % 23 + 1 AS h,
             doc_id % 256 AS v
      FROM documents),
    px AS (
      SELECT doc_id, (v + u.k) % 256 AS b
      FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS u(k)),
    s AS (
      SELECT doc_id, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(b) AS DOUBLE) AS sb, CAST(sum(b * b) AS DOUBLE) AS sq
      FROM px GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height,
           s.sb / s.n AS byte_mean,
           SQRT(GREATEST(s.sq / s.n - (s.sb / s.n) * (s.sb / s.n), 0.0))
             AS byte_std,
           CAST(54 + d.h * (((3 * d.w + 3) // 4) * 4) AS BIGINT) AS n_bytes
    FROM dims d JOIN s USING (doc_id)
"""


def q_png_decode_docs(sf_dir: str):
    """REAL PNG decode (stdlib zlib only, no image library): each doc gets
    a deterministic 8-bit RGB PNG whose top-down pixel byte k is
    (doc_id*7 + k*3)%256, deflate-compressed with scanline filters cycling
    through all five PNG filter types (None/Sub/Up/Average/Paeth) — the
    actor-pool decoder walks CRC-verified chunks, inflates, and unfilters
    every path to recover the exact pixel moments.  The DuckDB twin
    re-derives every pixel from the closed form (n_px, not n_bytes, is the
    contract — on-disk size depends on the deflate stream)."""
    from feast_ray.stages.multimodal import add_media_features, attach_png_payloads

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        attach_png_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_media_features(
        ds, id_cols=("doc_id",), mode="decode", concurrency=6, batch_size=64
    )
    return out.select_columns(
        ["doc_id", "width", "height", "byte_mean", "byte_std", "n_px"]
    )


QUERIES_DOCS["png_decode_docs"] = q_png_decode_docs
ORACLE_SQL_DOCS["png_decode_docs"] = """
    WITH dims AS (
      SELECT doc_id, doc_id % 29 + 1 AS w, doc_id % 19 + 1 AS h
      FROM documents),
    px AS (
      SELECT doc_id, (doc_id * 7 + u.k * 3) % 256 AS b
      FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS u(k)),
    s AS (
      SELECT doc_id, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(b) AS DOUBLE) AS sb, CAST(sum(b * b) AS DOUBLE) AS sq
      FROM px GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height,
           s.sb / s.n AS byte_mean,
           SQRT(GREATEST(s.sq / s.n - (s.sb / s.n) * (s.sb / s.n), 0.0))
             AS byte_std,
           CAST(d.w * d.h * 3 AS BIGINT) AS n_px
    FROM dims d JOIN s USING (doc_id)
"""


def q_wav_decode_docs(sf_dir: str):
    """REAL audio decode (no audio library): each doc gets a deterministic
    mono 16-bit PCM WAV (sample i = (doc_id*31 + i*7)%65536 - 32768,
    n = doc_id%400 + 100, 8 kHz); the actor-pool decoder walks the RIFF
    chunks and computes exact sample moments.  SQL twin re-derives every
    sample with generate_series — identical moment arithmetic."""
    from feast_ray.stages.multimodal import add_audio_features, attach_wav_payloads

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        attach_wav_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_audio_features(
        ds, id_cols=("doc_id",), mode="decode", concurrency=2, batch_size=64
    )
    return out.select_columns(
        ["doc_id", "sample_rate", "n_channels", "n_samples",
         "amp_mean", "amp_std", "duration_s"]
    )


QUERIES_DOCS["wav_decode_docs"] = q_wav_decode_docs
ORACLE_SQL_DOCS["wav_decode_docs"] = """
    WITH dims AS (
      SELECT doc_id, doc_id % 400 + 100 AS n FROM documents),
    smp AS (
      SELECT doc_id, (doc_id * 31 + u.i * 7) % 65536 - 32768 AS s
      FROM dims, unnest(generate_series(0, n - 1)) AS u(i)),
    agg AS (
      SELECT doc_id, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(s) AS DOUBLE) AS sb, CAST(sum(s * s) AS DOUBLE) AS sq
      FROM smp GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(d.n AS BIGINT) AS n_samples,
           a.sb / a.n AS amp_mean,
           SQRT(GREATEST(a.sq / a.n - (a.sb / a.n) * (a.sb / a.n), 0.0))
             AS amp_std,
           CAST(d.n AS DOUBLE) / 8000.0 AS duration_s
    FROM dims d JOIN agg a USING (doc_id)
"""


def q_dedup_cluster_docs(sf_dir: str):
    """Duplicate-CLUSTER assignment: exact Jaccard near-dup pairs become an
    edge list, distributed min-label-propagation connected components
    (``stages.cc``) labels every member with its cluster's min doc_id, and
    singletons (docs in no pair) cluster as themselves via one LEFT
    equi-join.  Beyond the reference: Feast has no transitive-closure
    operator; this is the dedup-group step of an LLM-corpus pipeline."""
    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_cluster_head",
            pc.equal(t["cluster_id"].combine_chunks(), t["doc_id"].combine_chunks()),
        )

    return cluster_labels(sf_dir).map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


QUERIES_DOCS["dedup_cluster_docs"] = q_dedup_cluster_docs
ORACLE_SQL_DOCS["dedup_cluster_docs"] = f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    e AS (SELECT doc_a AS u, doc_b AS v FROM jac WHERE j >= {JACCARD_TAU}
          UNION SELECT doc_b, doc_a FROM jac WHERE j >= {JACCARD_TAU}),
    reach(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ),
    lab AS (SELECT u AS doc_id, LEAST(MIN(v), u) AS cluster_id
            FROM reach GROUP BY u)
    SELECT d.doc_id,
           COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS is_cluster_head
    FROM documents d LEFT JOIN lab l USING (doc_id)
"""


TOP_TOKENS_K = 50


def q_top_tokens_docs(sf_dir: str):
    """Exact corpus-wide top-50 token frequencies (vocabulary / heavy
    hitters): per-batch ``value_counts`` map-side combiner, one grouped
    exchange of (token, partial count), per-block local top-k, final sort
    over <= k x blocks rows (``stages.text.token_count_topk``)."""
    from feast_ray.stages.text import token_count_topk

    return token_count_topk(_docs(sf_dir, columns=("text",)), k=TOP_TOKENS_K)


QUERIES_DOCS["top_tokens_docs"] = q_top_tokens_docs
ORACLE_SQL_DOCS["top_tokens_docs"] = f"""
    WITH toks AS (
      SELECT u.t AS token
      FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT {TOP_TOKENS_K}
"""


def q_tfidf_top_docs(sf_dir: str):
    """Per-doc top TF-IDF term (keyword extraction): batch-local tf rows,
    grouped df count, token-co-partitioned tf x df join, vectorized per-doc
    argmax (``stages.text.tfidf_top_term``); docs with no tokens join back
    NULL.  Output carries the integer tf/df evidence, not the float score —
    the SQL twin reproduces the identical argmax."""
    import pyarrow.parquet as pq

    from feast_ray.stages.join import equi_join
    from feast_ray.stages.text import tfidf_top_term

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    best = tfidf_top_term(_docs(sf_dir), n_docs=n_docs)
    ids = _docs(sf_dir, columns=("doc_id",))
    return equi_join(ids, best, keys=["doc_id"], how="left")


QUERIES_DOCS["tfidf_top_docs"] = q_tfidf_top_docs
ORACLE_SQL_DOCS["tfidf_top_docs"] = """
    WITH toks AS (
      SELECT doc_id, u.t AS token
      FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''
    ),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks GROUP BY token),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    best AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln((SELECT nd FROM n) * 1.0 / df.df) DESC,
                        tf.token) AS rn
      FROM tf JOIN df USING (token))
    SELECT d.doc_id, b.token AS top_token, b.tf, b.df
    FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""


def _quality_cte() -> str:
    """The quality-score computation as reusable CTEs ending in
    ``qual(doc_id, quality_score)`` — same arithmetic as ``_quality_sql``."""
    stop_pat = stopword_pattern(EN_STOPWORDS)
    return f"""
      qc AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS DOUBLE) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{ALPHA_RE}')) AS DOUBLE) AS n_alpha,
               CAST(len(regexp_extract_all(lower(text), '{stop_pat}')) AS DOUBLE) AS n_stop
        FROM documents),
      qual AS (
        SELECT doc_id,
               least(n_tokens / 64.0, 1.0) * 0.4
                 + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0 END) * 0.4
                 + least((CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END)
                         * 4.0, 1.0) * 0.2 AS quality_score
        FROM qc)
"""


def cluster_labels(sf_dir: str):
    """(doc_id, cluster_id) for every doc: Jaccard pairs -> connected
    components; singletons cluster as themselves (shared by the cluster and
    keep-best queries)."""
    from feast_ray.stages.cc import connected_components
    from feast_ray.stages.dedup import jaccard_pair_pipeline
    from feast_ray.stages.join import equi_join

    docs = _docs(sf_dir, columns=("doc_id",))
    pairs = jaccard_pair_pipeline(
        _docs(sf_dir), k=JACCARD_K, tau=JACCARD_TAU
    ).select_columns(["doc_a", "doc_b"])
    labels = connected_components(
        pairs, src="doc_a", dst="doc_b", node_col="doc_id", comp_col="comp"
    )
    joined = equi_join(docs, labels, keys=["doc_id"], how="left")
    return joined.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_id": pc.coalesce(
                    t["comp"].combine_chunks(), t["doc_id"].combine_chunks()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def keep_best(clusters, quality):
    """Highest-quality doc per near-dup cluster (ties: min doc_id) from a
    precomputed ``(doc_id, cluster_id)`` dataset and a
    ``(doc_id, quality_score)`` dataset — so composed pipelines (curate)
    reuse ONE cluster pipeline and ONE scoring scan instead of recomputing
    both (the round-2 battery's single biggest wasted-work item)."""
    from feast_ray.grouped import grouped_map, starts_to_group_index
    from feast_ray.stages.join import equi_join

    joined = equi_join(clusters, quality, keys=["doc_id"], how="inner")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "quality_score": pa.array([], pa.float64()),
                    "kept": pa.array([], pa.bool_()),
                }
            )
        score = t["quality_score"].combine_chunks().to_numpy(zero_copy_only=False)
        gidx = starts_to_group_index(starts)
        gmax = np.maximum.reduceat(score, starts[:-1])
        hits = np.flatnonzero(score == gmax[gidx])
        _, first_of = np.unique(gidx[hits], return_index=True)
        kept = np.zeros(t.num_rows, dtype=bool)
        kept[hits[first_of]] = True  # doc_id-sorted groups: first hit = min id
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_id": t["cluster_id"],
                "quality_score": t["quality_score"],
                "kept": pa.array(kept),
            }
        )

    return grouped_map(joined, ["cluster_id"], kernel, sort_keys=["doc_id"])


def q_dedup_keep_best_docs(sf_dir: str):
    """End-to-end corpus-dedup policy: near-dup clusters (Jaccard pairs ->
    connected components) x quality scoring, keeping the highest-quality doc
    per cluster (ties: min doc_id).  Composition of four engine operators —
    pair generation, transitive closure, scalar scoring, grouped argmax —
    with every float compared bit-exactly against the SQL twin."""
    quality = add_text_quality(_docs(sf_dir)).select_columns(
        ["doc_id", "quality_score"]
    )
    return keep_best(cluster_labels(sf_dir), quality)


QUERIES_DOCS["dedup_keep_best_docs"] = q_dedup_keep_best_docs
ORACLE_SQL_DOCS["dedup_keep_best_docs"] = f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    e AS (SELECT doc_a AS u, doc_b AS v FROM jac WHERE j >= {JACCARD_TAU}
          UNION SELECT doc_b, doc_a FROM jac WHERE j >= {JACCARD_TAU}),
    reach(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ),
    lab AS (SELECT u AS doc_id, LEAST(MIN(v), u) AS cluster_id
            FROM reach GROUP BY u),
    {_quality_cte()},
    m AS (SELECT d.doc_id,
                 COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
                 q.quality_score
          FROM documents d
          LEFT JOIN lab l USING (doc_id)
          JOIN qual q USING (doc_id)),
    best AS (SELECT doc_id, cluster_id, quality_score,
                    ROW_NUMBER() OVER (PARTITION BY cluster_id
                                       ORDER BY quality_score DESC, doc_id) AS rn
             FROM m)
    SELECT doc_id, cluster_id, quality_score, rn = 1 AS kept FROM best
"""


def q_repetition_docs(sf_dir: str):
    """Within-doc repetition signals (Gopher/RefinedWeb-style quality
    filters): exact per-doc token totals, distinct tokens, top-token count,
    total/distinct bigrams — one embarrassingly-parallel vectorized map
    (``stages.text.repetition_batch``), integer outputs only so the SQL
    twin is bit-exact."""
    from feast_ray.stages.text import add_repetition

    out = add_repetition(_docs(sf_dir))
    return out.select_columns(
        [
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "top_tok_cnt",
            "n_bigrams",
            "n_distinct_bigrams",
        ]
    )


QUERIES_DOCS["repetition_docs"] = q_repetition_docs
ORACLE_SQL_DOCS["repetition_docs"] = """
    WITH lt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS tok FROM lt),
    tok_counts AS (SELECT doc_id, tok, COUNT(*) AS c
                   FROM toks GROUP BY doc_id, tok),
    tok_stats AS (SELECT doc_id,
                         CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
                         CAST(MAX(c) AS BIGINT) AS top_tok_cnt
                  FROM tok_counts GROUP BY doc_id),
    bg AS (SELECT doc_id,
                  CAST(len(l) AS BIGINT) AS n_tokens,
                  CAST(GREATEST(len(l) - 1, 0) AS BIGINT) AS n_bigrams,
                  CAST(len(list_distinct(
                    list_transform(range(1, len(l)),
                                   i -> l[i] || ' ' || l[i + 1])))
                    AS BIGINT) AS n_distinct_bigrams
           FROM lt)
    SELECT bg.doc_id, bg.n_tokens,
           COALESCE(tok_stats.n_distinct_tokens, 0) AS n_distinct_tokens,
           COALESCE(tok_stats.top_tok_cnt, 0) AS top_tok_cnt,
           bg.n_bigrams, bg.n_distinct_bigrams
    FROM bg LEFT JOIN tok_stats USING (doc_id)
"""


def q_decontam_docs(sf_dir: str):
    """Benchmark decontamination: training docs (doc_id % 20 != 0) sharing
    any 4-token shingle with the eval split (doc_id % 20 == 0), with the
    distinct shared-shingle count as evidence — shingle map + co-partitioned
    semi-join + grouped distinct count (``stages.decontam.decontaminate``)."""
    from feast_ray.stages.decontam import decontaminate

    docs = _docs(sf_dir)

    def split(keep_eval):
        def f(t):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if keep_eval else (ids % 20 != 0)
            return t.filter(pa.array(m))

        return f

    train = docs.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    ev = docs.map_batches(split(True), batch_format="pyarrow", zero_copy_batch=True)
    return decontaminate(train, ev, w=4)


QUERIES_DOCS["decontam_docs"] = q_decontam_docs
ORACLE_SQL_DOCS["decontam_docs"] = """
    WITH lt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                         l[i+3])) AS s
      FROM lt WHERE len(l) >= 4),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0)
    SELECT doc_id, CAST(COUNT(DISTINCT s) AS BIGINT) AS n_shared
    FROM sh WHERE doc_id % 20 <> 0 AND s IN (SELECT s FROM ev)
    GROUP BY doc_id
"""


def q_pack_docs(sf_dir: str):
    """Greedy sequence packing for training-batch construction: shard docs
    by doc_id % 16, order by doc_id within each shard, pack token counts
    into 256-token bins (``stages.pack.greedy_pack``) — the kernel walks
    bins, not rows (one searchsorted over group-rebased prefix sums closes
    a bin in every active shard per step)."""
    from feast_ray.stages.pack import greedy_pack
    from feast_ray.stages.text import add_repetition

    docs = add_repetition(_docs(sf_dir)).select_columns(["doc_id", "n_tokens"])

    def shard(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("shard", pa.array((ids % 16).astype(np.int64)))

    sharded = docs.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)
    out = greedy_pack(
        sharded,
        group_keys="shard",
        size_col="n_tokens",
        order_cols=["doc_id"],
        budget=256,
        bin_col="bin",
    )
    return out.select_columns(["doc_id", "shard", "n_tokens", "bin"])


QUERIES_DOCS["pack_docs"] = q_pack_docs
ORACLE_SQL_DOCS["pack_docs"] = """
    WITH RECURSIVE lt AS (
      SELECT doc_id, doc_id % 16 AS shard,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
    r AS (
      SELECT doc_id, shard, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM lt),
    p AS (
      SELECT doc_id, shard, n_tokens, rn,
             n_tokens AS acc, CAST(0 AS BIGINT) AS bin
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
             CASE WHEN p.acc + r.n_tokens > 256 THEN r.n_tokens
                  ELSE p.acc + r.n_tokens END,
             CASE WHEN p.acc + r.n_tokens > 256 THEN p.bin + 1 ELSE p.bin END
      FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
    SELECT doc_id, shard, n_tokens, bin FROM p
"""


def q_dup_shingles_docs(sf_dir: str):
    """Cross-document duplicate-shingle evidence per doc (the corpus-level
    duplicate-n-gram signal): distinct 4-token shingles and how many occur
    in >= 2 docs (``stages.decontam.crossdoc_shingle_stats``)."""
    from feast_ray.stages.decontam import crossdoc_shingle_stats

    return crossdoc_shingle_stats(_docs(sf_dir), w=4)


QUERIES_DOCS["dup_shingles_docs"] = q_dup_shingles_docs
ORACLE_SQL_DOCS["dup_shingles_docs"] = """
    WITH lt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                         l[i+3])) AS s
      FROM lt WHERE len(l) >= 4),
    cnt AS (SELECT s, COUNT(DISTINCT doc_id) AS c FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE cnt.c >= 2) AS BIGINT) AS n_dup_shingles
    FROM sh JOIN cnt USING (s)
    GROUP BY sh.doc_id
"""


def q_mix_corpus_docs(sf_dir: str):
    """Deterministic corpus mixing by language weight (keep 80% of en, 30%
    of everything else, decided by the bijective doc_id mixer —
    ``stages.sampling.weighted_mix_sample``): the dataset-reweighting step
    of corpus assembly, reproducible on any cluster shape."""
    from feast_ray.stages.sampling import weighted_mix_sample

    docs = _docs(sf_dir, columns=("doc_id", "lang", "source"))
    return weighted_mix_sample(
        docs,
        group_col="lang",
        key_col="doc_id",
        percents={"en": 80},
        default_percent=30,
    )


QUERIES_DOCS["mix_corpus_docs"] = q_mix_corpus_docs
ORACLE_SQL_DOCS["mix_corpus_docs"] = """
    WITH h AS (
      SELECT doc_id, lang, source,
             ((CAST(doc_id AS HUGEINT) % 4294967296) * 2135587861
              + (((CAST(doc_id AS HUGEINT) % 4294967296) * 2654435769
                  + (CAST(doc_id AS HUGEINT) // 4294967296) * 2135587861)
                 % 4294967296) * 4294967296)
             % CAST(18446744073709551616 AS HUGEINT) AS hv
      FROM documents)
    SELECT doc_id, lang, source
    FROM h
    WHERE hv % 100 < CASE WHEN lang = 'en' THEN 80 ELSE 30 END
"""


REDACT_RE = r"\b(customer|spark)\b"


def q_redact_docs(sf_dir: str):
    """Denylist redaction (corpus scrubbing before training): every
    whole-word 'customer'/'spark' replaced, per-doc match count — two
    vectorized RE2 kernels per batch (``stages.text.add_redaction``)."""
    from feast_ray.stages.text import add_redaction

    out = add_redaction(_docs(sf_dir), pattern=REDACT_RE)
    return out.select_columns(["doc_id", "text_clean", "n_redacted"])


QUERIES_DOCS["redact_docs"] = q_redact_docs
ORACLE_SQL_DOCS["redact_docs"] = r"""
    SELECT doc_id,
           regexp_replace(text, '\b(customer|spark)\b', '[REDACTED]', 'g')
             AS text_clean,
           CAST(len(regexp_extract_all(text, '\b(customer|spark)\b'))
                AS BIGINT) AS n_redacted
    FROM documents
"""


def q_curate_corpus_docs(sf_dir: str):
    """END-TO-END corpus curation policy — the full LLM data-cleaning
    pipeline as ONE composed query: every doc gets its fate and the FIRST
    reason in precedence order
    eval-split > lang filter > quality floor > repetition filter >
    decontamination > near-dup keep-best > kept.
    Composition of six engine operators (language ID, quality scoring,
    repetition signals, shingle decontamination, Jaccard clusters + grouped
    argmax, equi-joins); every threshold compares values that are bit-exact
    vs the SQL twin, so the verdict column is hash-checkable."""
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.text import add_repetition

    # ONE corpus scan computes all three per-row scorers (they are
    # stateless map_batches, so they chain inside the read tasks); the
    # text column is dropped BEFORE the materialize, so the reused table
    # holds only doc_id + 4 small score columns.  Round 2 ran three
    # separate scans + two equi-join shuffles here, and keep-best re-ran
    # the scoring scan a fourth time.
    scored = (
        add_repetition(add_text_quality(add_lang_id(_docs(sf_dir))))
        .select_columns(
            ["doc_id", "lang_pred", "quality_score",
             "n_bigrams", "n_distinct_bigrams"]
        )
        .materialize()
    )
    cont = q_decontam_docs(sf_dir)
    kb = keep_best(
        cluster_labels(sf_dir),
        scored.select_columns(["doc_id", "quality_score"]),
    ).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "kept_dup": t["kept"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    j = equi_join(scored, cont, keys=["doc_id"], how="left")
    j = equi_join(j, kb, keys=["doc_id"], how="inner")

    def verdict(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lang_p = t["lang_pred"].combine_chunks().to_numpy(zero_copy_only=False)
        q = t["quality_score"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = t["n_bigrams"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = t["n_distinct_bigrams"].combine_chunks().to_numpy(zero_copy_only=False)
        shared = (
            t["n_shared"].combine_chunks().fill_null(0).to_numpy(zero_copy_only=False)
        )
        kept_dup = t["kept_dup"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t.num_rows
        reason = np.full(n, "kept", dtype=object)
        # precedence: later assignments must not overwrite earlier ones,
        # so walk the rules back to front
        reason[~kept_dup] = "duplicate"
        reason[shared > 0] = "contaminated"
        reason[10 * (nb - nd) > nb] = "repetition"
        reason[q < 0.55] = "quality"
        reason[lang_p != "en"] = "lang"
        reason[ids % 20 == 0] = "eval"
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "reason": pa.array(list(reason), type=pa.string()),
                "kept": pa.array(reason == "kept"),
            }
        )

    return j.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_DOCS["curate_corpus_docs"] = q_curate_corpus_docs


def _curate_sql() -> str:
    lang_sub = _lang_sql()
    qual_cte = _quality_cte()
    decontam_sub = ORACLE_SQL_DOCS["decontam_docs"]
    kb_sub = ORACLE_SQL_DOCS["dedup_keep_best_docs"]
    return f"""
    WITH lang AS (SELECT doc_id, lang_pred FROM ({lang_sub}) t),
    qx AS (SELECT doc_id, quality_score FROM (WITH {qual_cte}
           SELECT doc_id, quality_score FROM qual) t),
    rep AS (
      SELECT doc_id,
             CAST(GREATEST(len(l) - 1, 0) AS BIGINT) AS nb,
             CAST(len(list_distinct(list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i + 1]))) AS BIGINT) AS nd
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS l
            FROM documents) t),
    cont AS (SELECT doc_id FROM ({decontam_sub}) t WHERE n_shared > 0),
    kb AS (SELECT doc_id, kept FROM ({kb_sub}) t)
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 20 = 0 THEN 'eval'
                WHEN lang.lang_pred <> 'en' THEN 'lang'
                WHEN qx.quality_score < 0.55 THEN 'quality'
                WHEN 10 * (rep.nb - rep.nd) > rep.nb THEN 'repetition'
                WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
                WHEN NOT kb.kept THEN 'duplicate'
                ELSE 'kept' END AS reason,
           CASE WHEN d.doc_id % 20 = 0 THEN FALSE
                WHEN lang.lang_pred <> 'en' THEN FALSE
                WHEN qx.quality_score < 0.55 THEN FALSE
                WHEN 10 * (rep.nb - rep.nd) > rep.nb THEN FALSE
                WHEN cont.doc_id IS NOT NULL THEN FALSE
                WHEN NOT kb.kept THEN FALSE
                ELSE TRUE END AS kept
    FROM documents d
    JOIN lang USING (doc_id)
    JOIN qx USING (doc_id)
    JOIN rep USING (doc_id)
    LEFT JOIN cont USING (doc_id)
    JOIN kb USING (doc_id)
"""


ORACLE_SQL_DOCS["curate_corpus_docs"] = _curate_sql()


def q_chunk_docs(sf_dir: str):
    """Context-window chunking (``stages.text.chunk_texts``): every doc
    split into 32-token windows with stride 24 (8-token overlap), standard
    lowercase tokenization, chunk text re-joined with single spaces — no
    shuffle, one regex split + one gather + one binary_join per batch."""
    from feast_ray.stages.text import chunk_texts

    return chunk_texts(
        _docs(sf_dir), chunk_tokens=32, stride_tokens=24,
        idx_name="chunk_idx", out_name="chunk_text", len_name="n_tokens",
    )


QUERIES_DOCS["chunk_docs"] = q_chunk_docs
ORACLE_SQL_DOCS["chunk_docs"] = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents),
    mm AS (
      SELECT doc_id, tl, CAST(len(tl) AS BIGINT) AS m
      FROM toks WHERE len(tl) > 0),
    cc AS (
      SELECT doc_id, tl, m,
             CASE WHEN m <= 32 THEN 1
                  ELSE 1 + CAST(CEIL((m - 32) / 24.0) AS BIGINT) END AS n_chunks
      FROM mm)
    SELECT doc_id,
           CAST(g.k AS BIGINT) AS chunk_idx,
           array_to_string(tl[g.k * 24 + 1 : LEAST(g.k * 24 + 32, m)], ' ')
             AS chunk_text,
           LEAST(g.k * 24 + 32, m) - g.k * 24 AS n_tokens
    FROM cc, LATERAL unnest(range(0, n_chunks)) AS g(k)
"""


HH_THRESHOLD = 60


def q_heavy_tokens_docs(sf_dir: str):
    """Exact frequent tokens without shuffling the long tail
    (``stages.sketch.heavy_hitters``): pass 1 ships per-batch Misra-Gries
    summaries (<= k rows per batch) and derives a PROVEN candidate
    superset; pass 2 broadcast-filters to candidates and recounts exactly.
    Output == GROUP BY token HAVING count >= threshold."""
    from feast_ray.stages.sketch import heavy_hitters
    from feast_ray.stages.text import tokenize_batch

    def toks(t: pa.Table) -> pa.Table:
        return pa.table({"token": tokenize_batch(t)})

    tok_ds = _docs(sf_dir, columns=("text",)).map_batches(
        toks, batch_format="pyarrow", zero_copy_batch=True
    )
    # summary_k sized so the n/(k+1) guarantee holds through sf0.1 (~0.6M
    # tokens -> err 18 < 60); beyond that heavy_hitters resizes k from the
    # measured n and redoes pass 1 (verified by tools/gate_10x.py)
    return heavy_hitters(tok_ds, "token", HH_THRESHOLD, summary_k=32768)


QUERIES_DOCS["heavy_tokens_docs"] = q_heavy_tokens_docs
ORACLE_SQL_DOCS["heavy_tokens_docs"] = f"""
    WITH toks AS (
      SELECT u.t AS value
      FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''
    )
    SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks GROUP BY value
    HAVING COUNT(*) >= {HH_THRESHOLD}
"""


def q_upsample_docs(sf_dir: str):
    """Deterministic fractional upsampling for corpus mixing
    (``stages.sampling.upsample_mix``): rare languages repeated x2.5
    (2 copies always, a 3rd iff the doc's mixer hash falls in the 50%
    band), 'en' kept x1 — reproducible epoch repetition with a copy
    ordinal, no shuffle."""
    from feast_ray.stages.sampling import upsample_mix

    ds = _docs(sf_dir, columns=("doc_id", "lang"))
    return upsample_mix(
        ds, group_col="lang", key_col="doc_id",
        factors={"en": 100}, default_times100=250,
    )


QUERIES_DOCS["upsample_docs"] = q_upsample_docs
ORACLE_SQL_DOCS["upsample_docs"] = """
    WITH h AS (
      SELECT doc_id, lang,
             ((CAST(doc_id AS HUGEINT) % 4294967296) * 2135587861
              + (((CAST(doc_id AS HUGEINT) % 4294967296) * 2654435769
                  + (CAST(doc_id AS HUGEINT) // 4294967296) * 2135587861)
                 % 4294967296) * 4294967296)
             % CAST(18446744073709551616 AS HUGEINT) AS hv
      FROM documents),
    r AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN 100 ELSE 250 END // 100
             + CASE WHEN hv % 100 <
                         CASE WHEN lang = 'en' THEN 100 ELSE 250 END % 100
                    THEN 1 ELSE 0 END AS rep
      FROM h)
    SELECT doc_id, lang, CAST(u.c AS BIGINT) AS copy_idx
    FROM r, LATERAL unnest(range(0, rep)) AS u(c)
"""


COOC_K = 50


def q_cooccur_tokens_docs(sf_dir: str):
    """Corpus collocation evidence (``stages.text.cooccurrence_topk``): the
    50 most frequently co-occurring token pairs with their document
    frequencies — integer PMI evidence, ordered by n_ab DESC then pair;
    pair generation is positional over the doc-grouped exchange (lexical
    a < b for free), counting is map-side combined."""
    from feast_ray.stages.text import cooccurrence_topk

    return cooccurrence_topk(_docs(sf_dir), k=COOC_K)


QUERIES_DOCS["cooccur_tokens_docs"] = q_cooccur_tokens_docs
ORACLE_SQL_DOCS["cooccur_tokens_docs"] = f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, u.t AS tok
      FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    p AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
    top AS (SELECT * FROM p ORDER BY n_ab DESC, tok_a, tok_b LIMIT {COOC_K})
    SELECT t.tok_a, t.tok_b, t.n_ab, da.df AS df_a, db.df AS df_b
    FROM top t
    JOIN df da ON da.tok = t.tok_a
    JOIN df db ON db.tok = t.tok_b
"""


def q_neardup_edit_docs(sf_dir: str):
    """Edit-distance near-duplicate pairs over the 16-byte text prefix
    (``stages.editdist.editdist_pairs``): FastSS deletion-neighborhood
    blocking (lossless for distance <= 1) with an exact vectorized
    verifier — the typo/OCR-noise dedup family shingle methods miss.
    Identical prefixes collapse before the variant fan-out, so exact-dup
    clusters cost one exchange, not a 17x-duplicated quadratic."""
    from feast_ray.stages.editdist import editdist_pairs

    return editdist_pairs(
        _docs(sf_dir), id_col="doc_id", text_col="text", prefix_len=16
    )


QUERIES_DOCS["neardup_edit_docs"] = q_neardup_edit_docs
ORACLE_SQL_DOCS["neardup_edit_docs"] = """
    WITH d AS (SELECT doc_id, substr(text, 1, 16) AS key FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS edit_dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE abs(length(a.key) - length(b.key)) <= 1
      AND levenshtein(a.key, b.key) <= 1
"""


def q_dedup_chunks_docs(sf_dir: str):
    """Chunk-level exact dedup (the remove-boilerplate-paragraphs pass):
    every 32-token/stride-24 chunk seen more than once across the corpus,
    with its total occurrence count and distinct-doc spread.  Chunking is
    shuffle-free (``stages.text.chunk_texts``); per-batch distinct
    (chunk, doc) partials feed ONE grouped exchange on the chunk text
    whose kernel folds duplicate partials and counts doc runs."""
    import numpy as np

    from feast_ray.grouped import grouped_map
    from feast_ray.stages.text import chunk_texts

    chunks = chunk_texts(
        _docs(sf_dir), chunk_tokens=32, stride_tokens=24,
        idx_name="chunk_idx", out_name="chunk_text", len_name="n_tokens",
    )

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        txt = t["chunk_text"].combine_chunks()
        did = t["doc_id"].combine_chunks()
        if n == 0:
            return pa.table(
                {"chunk_text": txt.slice(0, 0), "doc_id": did.slice(0, 0),
                 "__n": pa.array([], pa.int64())}
            )
        ti = txt.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = did.to_numpy(zero_copy_only=False)
        order = np.lexsort((d, ti))
        st, sd = ti[order], d[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (st[1:] != st[:-1]) | (sd[1:] != sd[:-1])
        firsts = order[new]
        cnt = np.diff(np.concatenate((np.flatnonzero(new), [n])))
        return pa.table(
            {
                "chunk_text": pc.take(txt, pa.array(firsts)),
                "doc_id": pc.take(did, pa.array(firsts)),
                "__n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = chunks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        import numpy as np

        txt = t["chunk_text"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"chunk_text": txt.slice(0, 0),
                 "n_copies": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64())}
            )
        firsts = starts[:-1]
        cnt = t["__n"].combine_chunks().to_numpy(zero_copy_only=False)
        n_copies = np.add.reduceat(cnt, firsts)
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n_rows = len(d)
        new_doc = np.empty(n_rows, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = d[1:] != d[:-1]
        new_doc[firsts] = True
        gidx = np.repeat(np.arange(len(firsts)), np.diff(starts))
        n_docs = np.bincount(gidx[new_doc], minlength=len(firsts)).astype(np.int64)
        keep = n_copies > 1
        take = pa.array(firsts[keep])
        return pa.table(
            {
                "chunk_text": pc.take(txt, take),
                "n_copies": pa.array(n_copies[keep].astype(np.int64)),
                "n_docs": pa.array(n_docs[keep]),
            }
        )

    return grouped_map(partials, ["chunk_text"], kernel, sort_keys=["doc_id"])


QUERIES_DOCS["dedup_chunks_docs"] = q_dedup_chunks_docs
ORACLE_SQL_DOCS["dedup_chunks_docs"] = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents),
    mm AS (
      SELECT doc_id, tl, CAST(len(tl) AS BIGINT) AS m
      FROM toks WHERE len(tl) > 0),
    cc AS (
      SELECT doc_id, tl, m,
             CASE WHEN m <= 32 THEN 1
                  ELSE 1 + CAST(CEIL((m - 32) / 24.0) AS BIGINT) END AS n_chunks
      FROM mm),
    ch AS (
      SELECT doc_id,
             array_to_string(tl[g.k * 24 + 1 : LEAST(g.k * 24 + 32, m)], ' ')
               AS chunk_text
      FROM cc, LATERAL unnest(range(0, n_chunks)) AS g(k))
    SELECT chunk_text,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM ch GROUP BY chunk_text HAVING COUNT(*) > 1
"""


BOILER_DF_MAX = 2


def q_strip_boilerplate_docs(sf_dir: str):
    """Boilerplate removal (the header/footer/nav-bar stripping pass of web
    corpus curation): docs split into NON-overlapping 32-token chunks,
    chunks appearing in more than BOILER_DF_MAX distinct docs dropped,
    survivors reassembled in order into a cleaned normalized text.  Chunking
    is shuffle-free; document frequency is one grouped exchange over
    per-batch distinct (chunk, doc) partials; the reassembly is one more
    exchange on doc_id whose kernel is a single vectorized list-join.
    Docs whose every chunk is boilerplate drop out entirely."""
    import numpy as np

    from feast_ray.grouped import grouped_map
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.text import chunk_texts

    chunks = chunk_texts(
        _docs(sf_dir), chunk_tokens=32, stride_tokens=32,
        idx_name="chunk_idx", out_name="chunk_text", len_name="n_tokens",
    ).drop_columns(["n_tokens"])

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        txt = t["chunk_text"].combine_chunks()
        did = t["doc_id"].combine_chunks()
        if n == 0:
            return pa.table({"chunk_text": txt.slice(0, 0), "doc_id": did.slice(0, 0)})
        ti = txt.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = did.to_numpy(zero_copy_only=False)
        order = np.lexsort((d, ti))
        st, sd = ti[order], d[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (st[1:] != st[:-1]) | (sd[1:] != sd[:-1])
        take = pa.array(order[new])
        return pa.table({"chunk_text": pc.take(txt, take), "doc_id": pc.take(did, take)})

    partials = chunks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def df_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        import numpy as np

        txt = t["chunk_text"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"chunk_text": txt.slice(0, 0), "__df": pa.array([], pa.int64())}
            )
        firsts = starts[:-1]
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n_rows = len(d)
        new_doc = np.empty(n_rows, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = d[1:] != d[:-1]
        new_doc[firsts] = True
        gidx = np.repeat(np.arange(len(firsts)), np.diff(starts))
        df = np.bincount(gidx[new_doc], minlength=len(firsts)).astype(np.int64)
        return pa.table(
            {"chunk_text": pc.take(txt, pa.array(firsts)), "__df": pa.array(df)}
        )

    df_tbl = grouped_map(partials, ["chunk_text"], df_kernel, sort_keys=["doc_id"])

    joined = equi_join(chunks, df_tbl, keys=["chunk_text"], how="inner")
    kept = joined.map_batches(
        lambda t: t.filter(pc.less_equal(t["__df"], BOILER_DF_MAX)).select(
            ["doc_id", "chunk_idx", "chunk_text"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def reassemble(t: pa.Table, starts: np.ndarray) -> pa.Table:
        import numpy as np

        did = t["doc_id"].combine_chunks()
        txt = t["chunk_text"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": did.slice(0, 0),
                    "clean_text": txt.slice(0, 0),
                    "n_kept": pa.array([], pa.int64()),
                }
            )
        # large_list offsets: bucket row counts are memory-bounded but int32
        # offsets would silently cap a bucket at 2^31 chunk rows
        lists = pa.LargeListArray.from_arrays(pa.array(starts), txt)
        return pa.table(
            {
                "doc_id": pc.take(did, pa.array(starts[:-1])),
                "clean_text": pc.binary_join(lists, " "),
                "n_kept": pa.array(np.diff(starts).astype(np.int64)),
            }
        )

    return grouped_map(kept, ["doc_id"], reassemble, sort_keys=["chunk_idx"])


QUERIES_DOCS["strip_boilerplate_docs"] = q_strip_boilerplate_docs
ORACLE_SQL_DOCS["strip_boilerplate_docs"] = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents),
    mm AS (
      SELECT doc_id, tl, CAST(len(tl) AS BIGINT) AS m
      FROM toks WHERE len(tl) > 0),
    cc AS (
      SELECT doc_id, tl, m,
             CASE WHEN m <= 32 THEN 1
                  ELSE 1 + CAST(CEIL((m - 32) / 32.0) AS BIGINT) END AS n_chunks
      FROM mm),
    ch AS (
      SELECT doc_id, CAST(g.k AS BIGINT) AS chunk_idx,
             array_to_string(tl[g.k * 32 + 1 : LEAST(g.k * 32 + 32, m)], ' ')
               AS chunk_text
      FROM cc, LATERAL unnest(range(0, n_chunks)) AS g(k)),
    df AS (SELECT chunk_text, COUNT(DISTINCT doc_id) AS df
           FROM ch GROUP BY chunk_text)
    SELECT ch.doc_id,
           string_agg(ch.chunk_text, ' ' ORDER BY ch.chunk_idx) AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM ch JOIN df USING (chunk_text)
    WHERE df.df <= {BOILER_DF_MAX}
    GROUP BY ch.doc_id
"""


def q_contamination_stats_docs(sf_dir: str):
    """Per-training-doc contamination PROFILE (the release-gate report, not
    just the flag): distinct 4-shingle count, distinct shingles shared with
    the eval split, and the contamination fraction — decide drop vs keep
    by threshold instead of binary decontam.  Totals are one grouped
    exchange over per-batch distinct (doc, shingle) partials; shared
    counts reuse ``stages.decontam.decontaminate`` (co-partitioned
    semi-join); one LEFT join stitches the profile.  The fraction is one
    float64 division of exact counts."""
    import numpy as np

    from feast_ray.grouped import grouped_map
    from feast_ray.stages.decontam import shingle_table
    from feast_ray.stages.join import equi_join

    docs = _docs(sf_dir)

    def split(keep_eval):
        def f(t):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if keep_eval else (ids % 20 != 0)
            return t.filter(pa.array(m))

        return f

    train = docs.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    ev = docs.map_batches(split(True), batch_format="pyarrow", zero_copy_batch=True)

    tsh = shingle_table(train, w=4)

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sh = t["shingle"].combine_chunks()
        did = t["doc_id"].combine_chunks()
        if n == 0:
            return pa.table({"doc_id": did.slice(0, 0), "shingle": sh.slice(0, 0)})
        si = sh.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = did.to_numpy(zero_copy_only=False)
        order = np.lexsort((si, d))
        sd, ss = d[order], si[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (sd[1:] != sd[:-1]) | (ss[1:] != ss[:-1])
        take = pa.array(order[new])
        return pa.table({"doc_id": pc.take(did, take), "shingle": pc.take(sh, take)})

    partials = tsh.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    # eval shingles, globally distinct (the small side), tagged __hit=1
    esh = shingle_table(ev, w=4)

    def e_partial(t: pa.Table) -> pa.Table:
        sh = t["shingle"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"shingle": sh.slice(0, 0)})
        enc = sh.dictionary_encode()
        return pa.table({"shingle": enc.dictionary})

    def e_first(t: pa.Table, starts: np.ndarray) -> pa.Table:
        out = t.take(pa.array(starts[:-1]))
        return out.append_column(
            "__hit", pa.array(np.ones(len(starts) - 1, np.int64))
        )

    eset = grouped_map(
        esh.map_batches(e_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["shingle"],
        e_first,
    )

    # ONE left join flags every (doc, shingle) partial; the doc exchange
    # dedups batch-local partials (run detection) and counts both totals
    # and hits in the same kernel — the train shingles are generated and
    # shuffled exactly once
    flagged = equi_join(partials, eset, keys=["shingle"], how="left")

    def profile_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        import numpy as np

        did = t["doc_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": did.slice(0, 0),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                    "contam_frac": pa.array([], pa.float64()),
                }
            )
        firsts = starts[:-1]
        sh = t["shingle"].combine_chunks()
        codes = sh.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        new_run = np.empty(len(codes), dtype=bool)
        new_run[0] = True
        new_run[1:] = codes[1:] != codes[:-1]
        new_run[firsts] = True
        gidx = np.repeat(np.arange(len(firsts)), np.diff(starts))
        hit = pc.is_valid(t["__hit"].combine_chunks()).to_numpy(zero_copy_only=False)
        n_sh = np.bincount(gidx[new_run], minlength=len(firsts)).astype(np.int64)
        n_hit = np.bincount(
            gidx[new_run & hit], minlength=len(firsts)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.take(did, pa.array(firsts)),
                "n_shingles": pa.array(n_sh),
                "n_shared": pa.array(n_hit),
                "contam_frac": pa.array(
                    n_hit.astype(np.float64) / n_sh.astype(np.float64)
                ),
            }
        )

    return grouped_map(flagged, ["doc_id"], profile_kernel, sort_keys=["shingle"])


QUERIES_DOCS["contamination_stats_docs"] = q_contamination_stats_docs
ORACLE_SQL_DOCS["contamination_stats_docs"] = """
    WITH lt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                         l[i+3])) AS s
      FROM lt WHERE len(l) >= 4),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
    tr AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
            FROM tr GROUP BY doc_id),
    shd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM tr WHERE s IN (SELECT s FROM ev) GROUP BY doc_id)
    SELECT t.doc_id, t.n_shingles,
           COALESCE(d.n_shared, 0) AS n_shared,
           CAST(COALESCE(d.n_shared, 0) AS DOUBLE)
             / CAST(t.n_shingles AS DOUBLE) AS contam_frac
    FROM tot t LEFT JOIN shd d USING (doc_id)
"""


def q_dedup_minhash_incremental(sf_dir: str):
    """Incremental near-dedup (the daily-ingest story): docs with
    doc_id % 10 == 9 are the NEW ARRIVALS, the rest the existing corpus;
    report every verified Jaccard >= 0.5 pair involving at least one new
    doc.  The at-least-one-new predicate prunes candidates AT THE BAND
    BUCKET (``minhash_pair_pipeline(pair_keep=...)``), so candidate
    generation, pair dedup and exact verification all scale with the new
    batch — at 100 TB you never re-verify existing-vs-existing pairs, and
    the band signatures of the existing corpus are reusable from a prior
    run's persisted output."""
    import numpy as np

    from feast_ray.stages.dedup import minhash_pair_pipeline

    pairs = minhash_pair_pipeline(
        _docs(sf_dir), k=JACCARD_K, tau=MINHASH_TAU,
        pair_keep=lambda lo, hi: (lo % 10 == 9) | (hi % 10 == 9),
    )
    return pairs.select_columns(["doc_a", "doc_b", "jaccard"])


QUERIES_DOCS["dedup_minhash_incremental"] = q_dedup_minhash_incremental
ORACLE_SQL_DOCS["dedup_minhash_incremental"] = f"""
    WITH {_JACCARD_PAIRS_CTE}
    SELECT doc_a, doc_b, j AS jaccard FROM jac
    WHERE j >= {MINHASH_TAU}
      AND (doc_a % 10 = 9 OR doc_b % 10 = 9)
"""


def q_tokens_by_source(sf_dir: str):
    """Corpus token budget per source (the number every mixing decision
    starts from): doc count, exact token total and share of the corpus
    token budget per source — one stateless tokenize map, one
    map-side-combined exchange over the (tiny) source domain, shares from
    the driver-side total of the per-source aggregates (one division)."""
    import numpy as np

    from feast_ray.stages.stats import partial_count_sum

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def toks(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_tok = np.bincount(parent[keep], minlength=t.num_rows).astype(np.int64)
        return pa.table({"source": t["source"], "n_tokens": pa.array(n_tok)})

    per_doc = docs.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_count_sum(
        per_doc, ["source"], "n_tokens", count_name="n_docs", sum_name="n_tokens"
    ).materialize()  # tiny: one row per source
    total = sum(int(r["n_tokens"]) for r in agg.take_all())

    def share(t: pa.Table) -> pa.Table:
        s = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "token_share",
            pa.array(s.astype(np.float64) / np.float64(total)),
        )

    return agg.map_batches(share, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_DOCS["tokens_by_source"] = q_tokens_by_source
ORACLE_SQL_DOCS["tokens_by_source"] = """
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) AS DOUBLE)
             / CAST((SELECT SUM(n_tokens) FROM d) AS DOUBLE) AS token_share
    FROM d GROUP BY source
"""


def q_dup_rate_by_source(sf_dir: str):
    """Corpus hygiene by provenance: per source, doc count, docs belonging
    to an exact-duplicate text cluster, and the duplicate rate (one
    division of exact counts) — the report that decides which feeds need
    upstream dedup.  ONE grouped exchange on the text (source carried),
    per-source counts map-side combined off the kernel's flags."""
    import numpy as np

    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        src = t["source"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"source": src.slice(0, 0),
                 "__n": pa.array([], pa.int64()),
                 "__dup": pa.array([], pa.int64())}
            )
        sizes = np.diff(starts)
        is_dup = np.repeat(sizes > 1, sizes).astype(np.int64)
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        n_src = np.bincount(codes, minlength=k).astype(np.int64)
        d_src = np.zeros(k, dtype=np.int64)
        np.add.at(d_src, codes, is_dup)
        return pa.table(
            {"source": enc.dictionary, "__n": pa.array(n_src),
             "__dup": pa.array(d_src)}
        )

    partials = grouped_map(docs, ["text"], kernel)
    agg = sum_by(partials, ["source"], ["__n", "__dup"])

    def finish(t: pa.Table) -> pa.Table:
        n = t["__n"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["__dup"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(n),
                "n_dup_docs": pa.array(d),
                "dup_rate": pa.array(d.astype(np.float64) / n.astype(np.float64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_DOCS["dup_rate_by_source"] = q_dup_rate_by_source
ORACLE_SQL_DOCS["dup_rate_by_source"] = """
    WITH d AS (
      SELECT source,
             (COUNT(*) OVER (PARTITION BY text)) > 1 AS is_dup
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM d GROUP BY source
"""


def q_doc_rarity_score(sf_dir: str):
    """Lexical-rarity quality signal: per doc, the mean document frequency
    of its DISTINCT tokens (exact int64 df sum, one division) plus the
    count of singleton tokens (df = 1 — typo/garbage evidence).  Distinct
    (doc, token) pairs meet the global token-df table on ONE
    co-partitioned exchange keyed by token; per-doc folding is a second
    exchange; everything else is map-side."""
    import numpy as np

    from feast_ray.grouped import grouped_map

    docs = _docs(sf_dir)

    def doc_tokens(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = parent[keep]
        n = len(flat)
        if n == 0:
            return pa.table(
                {"doc_id": t["doc_id"].combine_chunks().slice(0, 0),
                 "tok": flat}
            )
        codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, parent))
        sp, sc = parent[order], codes[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1])
        take = pa.array(order[new])
        return pa.table(
            {"doc_id": pc.take(t["doc_id"].combine_chunks(), pa.array(sp[new])),
             "tok": pc.take(flat, take)}
        )

    dt = docs.map_batches(doc_tokens, batch_format="pyarrow", zero_copy_batch=True)

    def df_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return t.append_column("df", pa.array([], pa.int64()))
        # rows within a token group are distinct (doc, token) pairs
        return t.append_column(
            "df",
            pa.array(np.repeat(np.diff(starts), np.diff(starts)).astype(np.int64)),
        )

    with_df = grouped_map(dt, ["tok"], df_kernel)

    def fold(t: pa.Table, starts: np.ndarray) -> pa.Table:
        import numpy as np

        did = t["doc_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": did.slice(0, 0),
                 "n_tokens_distinct": pa.array([], pa.int64()),
                 "n_singletons": pa.array([], pa.int64()),
                 "mean_df": pa.array([], pa.float64())}
            )
        firsts = starts[:-1]
        df = t["df"].combine_chunks().to_numpy(zero_copy_only=False)
        n = np.diff(starts)
        s = np.add.reduceat(df, firsts)
        gidx = np.repeat(np.arange(len(firsts)), n)
        singles = np.bincount(gidx[df == 1], minlength=len(firsts)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.take(did, pa.array(firsts)),
                "n_tokens_distinct": pa.array(n.astype(np.int64)),
                "n_singletons": pa.array(singles),
                "mean_df": pa.array(s.astype(np.float64) / n.astype(np.float64)),
            }
        )

    return grouped_map(with_df, ["doc_id"], fold)


QUERIES_DOCS["doc_rarity_score"] = q_doc_rarity_score
ORACLE_SQL_DOCS["doc_rarity_score"] = """
    WITH dt AS (
      SELECT DISTINCT doc_id, u.t AS tok
      FROM documents,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok)
    SELECT dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_distinct,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(SUM(df.df) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_df
    FROM dt JOIN df USING (tok)
    GROUP BY dt.doc_id
"""


def q_lang_mix_by_source(sf_dir: str):
    """Language mix per source (the per-feed quality dashboard a corpus
    operator watches): doc counts per (source, predicted language) and
    the share within the source — language ID is the engine's stateless
    stopword-argmax scan, counts map-side combined on the tiny
    (source x lang) domain, share computed per source off ONE grouped
    exchange."""
    import numpy as np

    from feast_ray.stages.encode import share_of_entity
    from feast_ray.stages.text import add_lang_id

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))
    tagged = add_lang_id(docs).select_columns(["source", "lang_pred"])
    return share_of_entity(
        tagged, key="source", sub_key="lang_pred",
        count_name="n_docs", share_name="lang_share",
    )


QUERIES_DOCS["lang_mix_by_source"] = q_lang_mix_by_source
ORACLE_SQL_DOCS["lang_mix_by_source"] = f"""
    WITH lp AS ({_lang_sql()}),
    j AS (
      SELECT d.source, lp.lang_pred
      FROM documents d JOIN lp USING (doc_id))
    SELECT source, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY source) AS lang_share
    FROM j GROUP BY source, lang_pred
"""


def q_neardup_survival_by_source(sf_dir: str):
    """Near-dedup observability: per source, docs before and after the
    MinHash keep-smallest-id rule and the survival rate — which feeds
    lose the most to near-duplication (complements the exact-dup
    `dup_rate_by_source`).  The dedup pipeline runs once; survivors
    LEFT-mark the corpus via the thresholded drop-set broadcast already
    inside `minhash_dedup_pipeline`; per-source counts map-side
    combined."""
    import numpy as np

    from feast_ray.stages.dedup import minhash_dedup_pipeline
    from feast_ray.stages.stats import partial_count_sum, sum_by
    from feast_ray.stages.join import equi_join

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))
    kept = minhash_dedup_pipeline(
        docs.select_columns(["doc_id", "text"]), tau=MINHASH_TAU, k=JACCARD_K
    ).select_columns(["doc_id"])
    kept = kept.map_batches(
        lambda t: t.append_column(
            "__kept", pa.array(np.ones(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    marked = equi_join(
        docs.select_columns(["doc_id", "source"]), kept, keys=["doc_id"], how="left"
    )

    def flag(t: pa.Table) -> pa.Table:
        k = t["__kept"].combine_chunks().fill_null(0)
        return pa.table({"source": t["source"], "__kept": k})

    flagged = marked.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_count_sum(
        flagged, ["source"], "__kept", count_name="n_docs", sum_name="n_kept"
    )

    def rate(t: pa.Table) -> pa.Table:
        n = t["n_docs"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["n_kept"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "survival_rate", pa.array(s.astype(np.float64) / n.astype(np.float64))
        )

    return agg.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_DOCS["neardup_survival_by_source"] = q_neardup_survival_by_source
ORACLE_SQL_DOCS["neardup_survival_by_source"] = f"""
    WITH {_JACCARD_PAIRS_CTE},
    kept AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM jac WHERE j >= {MINHASH_TAU})),
    m AS (
      SELECT d.source,
             CASE WHEN k.doc_id IS NULL THEN 0 ELSE 1 END AS kept
      FROM documents d LEFT JOIN kept k USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS survival_rate
    FROM m GROUP BY source
"""


def q_word_stats_docs(sf_dir: str):
    """Readability proxies per doc (the cheap quality gates): token count,
    exact total token chars, mean word length (one division of exact
    ints), longest token, and long-word (> 7 chars) count — one stateless
    tokenize map, no shuffle."""
    import numpy as np

    docs = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        n = t.num_rows
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = lens > 0
        parent = parent[keep]
        lens = lens[keep].astype(np.int64)
        n_tok = np.bincount(parent, minlength=n).astype(np.int64)
        tot = np.zeros(n, dtype=np.int64)
        np.add.at(tot, parent, lens)
        mx = np.zeros(n, dtype=np.int64)
        np.maximum.at(mx, parent, lens)
        nlong = np.bincount(parent[lens > 7], minlength=n).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = tot.astype(np.float64) / n_tok.astype(np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "total_chars": pa.array(tot),
                "max_word_len": pa.array(mx),
                "n_long_words": pa.array(nlong),
                "mean_word_len": pa.array(mean, mask=n_tok == 0),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_DOCS["word_stats_docs"] = q_word_stats_docs
ORACLE_SQL_DOCS["word_stats_docs"] = """
    WITH d AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents)
    SELECT doc_id,
           CAST(len(tl) AS BIGINT) AS n_tokens,
           CAST(COALESCE(list_sum(list_transform(tl, x -> length(x))), 0)
                AS BIGINT) AS total_chars,
           CAST(COALESCE(list_max(list_transform(tl, x -> length(x))), 0)
                AS BIGINT) AS max_word_len,
           CAST(len(list_filter(tl, x -> length(x) > 7)) AS BIGINT)
             AS n_long_words,
           CASE WHEN len(tl) > 0
                THEN CAST(COALESCE(list_sum(list_transform(tl, x -> length(x))), 0)
                          AS DOUBLE) / CAST(len(tl) AS DOUBLE) END
             AS mean_word_len
    FROM d
"""


def q_dup_span_docs(sf_dir: str):
    """Duplicated-span coverage per document (exact-substring dedup
    evidence, Lee et al. 2022): which fraction of each doc is covered by
    5-token windows that also occur verbatim in another document —
    merged-interval union, not window double-counting
    (``stages.decontam.dup_span_coverage``)."""
    from feast_ray.stages.decontam import dup_span_coverage

    return dup_span_coverage(_docs(sf_dir), w=5)


QUERIES_DOCS["dup_span_docs"] = q_dup_span_docs
ORACLE_SQL_DOCS["dup_span_docs"] = """
    WITH lt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    tok AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens, l FROM lt),
    win AS (
      SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS pos,
             array_to_string(l[g.i:g.i+4], ' ') AS s
      FROM tok, LATERAL unnest(range(1, n_tokens - 5 + 2)) AS g(i)
      WHERE n_tokens >= 5),
    dup AS (SELECT s FROM win GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
    dwin AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (s)),
    cov AS (
      SELECT doc_id, CAST(COUNT(DISTINCT tp) AS BIGINT) AS covered FROM (
        SELECT d.doc_id, d.pos + u.j AS tp
        FROM dwin d, LATERAL unnest(range(0, 5)) AS u(j))
      GROUP BY doc_id),
    nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
           FROM dwin GROUP BY doc_id)
    SELECT t.doc_id, t.n_tokens,
           CAST(GREATEST(t.n_tokens - 5 + 1, 0) AS BIGINT) AS n_windows,
           COALESCE(nd.n_dup_windows, 0) AS n_dup_windows,
           COALESCE(cov.covered, 0) AS covered_tokens,
           CASE WHEN t.n_tokens > 0
                THEN ROUND(CAST(COALESCE(cov.covered, 0) AS DOUBLE)
                           / t.n_tokens, 6)
                ELSE 0.0 END AS covered_frac
    FROM tok t
    LEFT JOIN nd USING (doc_id)
    LEFT JOIN cov USING (doc_id)
"""


def q_bloom_decontam_docs(sf_dir: str):
    """Bloom-prefiltered benchmark decontamination — identical contract to
    ``decontam_docs`` (same split, same 4-token shingles, same oracle) but
    the training shingles pass a broadcast Bloom bitmap of the eval set
    BEFORE the exchange, shrinking the shuffle to contaminated +
    false-positive shingles; the exact semi-join then removes Bloom FPs so
    the answer is unchanged (``stages.decontam.bloom_decontaminate``)."""
    from feast_ray.stages.decontam import bloom_decontaminate

    docs = _docs(sf_dir)

    def split(keep_eval):
        def f(t):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if keep_eval else (ids % 20 != 0)
            return t.filter(pa.array(m))

        return f

    train = docs.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    ev = docs.map_batches(split(True), batch_format="pyarrow", zero_copy_batch=True)
    return bloom_decontaminate(train, ev, w=4)


QUERIES_DOCS["bloom_decontam_docs"] = q_bloom_decontam_docs
ORACLE_SQL_DOCS["bloom_decontam_docs"] = ORACLE_SQL_DOCS["decontam_docs"]


def q_weighted_sample_docs(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    50 documents drawn with inclusion probability proportional to char
    length, via the deterministic exponential key ln(u)/w with u derived
    bijectively from doc_id by the engine's splitmix mixer — reproducible
    on any cluster shape and replayable in SQL
    (``stages.sampling.weighted_reservoir_sample``)."""
    from feast_ray.stages.sampling import weighted_reservoir_sample

    docs = _docs(sf_dir)

    def add_w(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_chars": n})

    ds = docs.map_batches(add_w, batch_format="pyarrow", zero_copy_batch=True)
    return weighted_reservoir_sample(
        ds, key_col="doc_id", weight_col="n_chars", n=50
    )


_MIX64_DOC = """
        ((CAST(doc_id AS HUGEINT) % 4294967296) * 2135587861
         + (((CAST(doc_id AS HUGEINT) % 4294967296) * 2654435769
             + (CAST(doc_id AS HUGEINT) // 4294967296) * 2135587861)
            % 4294967296) * 4294967296)
        % CAST(18446744073709551616 AS HUGEINT)"""

def q_lm_surprisal_docs(sf_dir: str):
    """Unigram-LM surprisal quality score (the CCNet/Gopher 'perplexity
    bucket' signal, with the LM trained on the corpus itself): each token
    costs an integer number of bits — ``blen(N) - blen(cf)``, the
    bit-length gap between the corpus token total and the token's corpus
    frequency — so the oracle contract stays integer-exact end to end
    (the continuous-cost variant is this same pipeline with a float cost
    vector; quantization is the only difference).  tf rows are map-side,
    corpus frequencies meet them on ONE token-co-partitioned exchange,
    per-doc folding is a second doc-keyed exchange; the corpus total N is
    a bounded one-row-per-block partial sum.  Scale: both exchanges move
    one int64-keyed row per distinct (doc, token); nothing corpus-sized
    touches the driver."""
    from feast_ray.grouped import grouped_map

    docs = _docs(sf_dir)

    def partial_n(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        k = pc.sum(pc.cast(pc.not_equal(flat, ""), pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([k], pa.int64())})

    n_total = sum(
        r["n"]
        for r in docs.map_batches(
            partial_n, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    )
    blen_total = int(np.frexp(np.float64(max(n_total, 1)))[1])

    def doc_tf(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = parent[keep]
        n = len(flat)
        if n == 0:
            return pa.table(
                {"doc_id": t["doc_id"].combine_chunks().slice(0, 0),
                 "tok": flat, "tf": pa.array([], pa.int64())}
            )
        codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, parent))
        sp, sc = parent[order], codes[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1])
        firsts = np.flatnonzero(new)
        tf = np.diff(np.append(firsts, n))
        return pa.table(
            {"doc_id": pc.take(t["doc_id"].combine_chunks(), pa.array(sp[new])),
             "tok": pc.take(flat, pa.array(order[new])),
             "tf": pa.array(tf.astype(np.int64))}
        )

    dt = docs.map_batches(doc_tf, batch_format="pyarrow", zero_copy_batch=True)

    def cf_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("cf", pa.array([], pa.int64()))
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        per_group = np.add.reduceat(tf, starts[:-1])
        return t.append_column(
            "cf", pa.array(np.repeat(per_group, np.diff(starts)).astype(np.int64))
        )

    with_cf = grouped_map(dt, ["tok"], cf_kernel)

    def fold(t: pa.Table, starts: np.ndarray) -> pa.Table:
        did = t["doc_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": did.slice(0, 0),
                 "n_tokens": pa.array([], pa.int64()),
                 "total_bits": pa.array([], pa.int64()),
                 "bits_per_token": pa.array([], pa.float64())}
            )
        firsts = starts[:-1]
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        cf = t["cf"].combine_chunks().to_numpy(zero_copy_only=False)
        # exact integer bit-length: frexp exponent (cf < 2^53 holds through
        # 10^12-turn corpora; int64 corpus totals overflow long before it)
        cost = blen_total - np.frexp(cf.astype(np.float64))[1]
        n_tok = np.add.reduceat(tf, firsts).astype(np.int64)
        bits = np.add.reduceat(tf * cost, firsts).astype(np.int64)
        return pa.table(
            {"doc_id": pc.take(did, pa.array(firsts)),
             "n_tokens": pa.array(n_tok),
             "total_bits": pa.array(bits),
             "bits_per_token": pa.array(
                 bits.astype(np.float64) / n_tok.astype(np.float64)
             )}
        )

    return grouped_map(with_cf, ["doc_id"], fold)


def q_cross_source_overlap(sf_dir: str):
    """Source x source shingle-overlap matrix (the between-feed duplication
    dashboard a corpus operator watches before mixing): for every unordered
    source pair, the number of distinct 20-char shingles both feeds contain
    and the overlap coefficient shared/min(|A|,|B|).  Scale shape: batch-
    distinct (source, gram-hash) rows meet on ONE gram-keyed exchange whose
    kernel dedupes sources per gram and pre-aggregates pair/size partials
    (vectorized `pairs_within_groups`, per-gram fan-out bounded by the
    source count — cap sources-per-gram like max_df when feeds number in
    the thousands); a second tiny exchange folds partials to <= n_sources^2
    rows, the only thing the driver ever holds.  Gram hashing is the
    64-bit rolling polynomial (`dedup.distinct_gram_hashes` — collisions
    ~n^2/2^64, the documented fingerprint trade-off)."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.dedup import distinct_gram_hashes, pairs_within_groups

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def source_grams(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray
        ) else t["text"]
        rows, gh = distinct_gram_hashes(
            texts, np.arange(t.num_rows, dtype=np.int64), JACCARD_K
        )
        src = t["source"].combine_chunks()
        if len(rows) == 0:
            return pa.table(
                {"source": src.slice(0, 0), "gh": pa.array([], pa.int64())}
            )
        # batch-level dedupe of (source, gram): sources repeat across docs
        codes = src.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)[rows]
        order = np.lexsort((gh, codes))
        cs, gs = codes[order], gh[order]
        keep = np.ones(len(cs), dtype=bool)
        keep[1:] = (cs[1:] != cs[:-1]) | (gs[1:] != gs[:-1])
        return pa.table(
            {"source": pc.take(src, pa.array(rows[order][keep])),
             "gh": pa.array(gs[keep].view(np.int64))}
        )

    sg = docs.map_batches(source_grams, batch_format="pyarrow", zero_copy_batch=True)

    def per_gram(t: pa.Table, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {"source_a": pa.array([], pa.string()),
             "source_b": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        src = t["source"].combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.asarray(src.dictionary.to_pylist(), dtype=object)
        # dictionary codes are first-appearance ordered; pair contract is
        # LEXICAL (source_a < source_b) -> remap via argsort
        rank = np.empty(len(vals), dtype=np.int64)
        rank[np.argsort(vals)] = np.arange(len(vals))
        lex = rank[codes]
        sorted_vals = vals[np.argsort(vals)]
        gidx = np.repeat(
            np.arange(len(starts) - 1, dtype=np.int64), np.diff(starts)
        )
        order = np.lexsort((lex, gidx))
        gs, ls = gidx[order], lex[order]
        keep = np.ones(len(gs), dtype=bool)
        keep[1:] = (gs[1:] != gs[:-1]) | (ls[1:] != ls[:-1])
        gs, ls = gs[keep], ls[keep]
        new_starts = np.concatenate(
            ([0], np.cumsum(np.bincount(gs, minlength=len(starts) - 1)))
        )
        la, lb = pairs_within_groups(ls, new_starts)
        out_a, out_b, out_n = [], [], []
        if len(la):
            K = len(vals)
            uk, cnt = np.unique(la * K + lb, return_counts=True)
            out_a.append(sorted_vals[(uk // K)])
            out_b.append(sorted_vals[(uk % K)])
            out_n.append(cnt.astype(np.int64))
        sz = np.bincount(ls, minlength=len(vals)).astype(np.int64)
        nz = np.flatnonzero(sz)
        out_a.append(sorted_vals[nz])
        out_b.append(np.asarray([""] * len(nz), dtype=object))
        out_n.append(sz[nz])
        return pa.table(
            {"source_a": pa.array(np.concatenate(out_a), pa.string()),
             "source_b": pa.array(np.concatenate(out_b), pa.string()),
             "n": pa.array(np.concatenate(out_n))}
        )

    partials = grouped_map(sg, ["gh"], per_gram)

    def fold(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return t
        firsts = starts[:-1]
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"source_a": pc.take(t["source_a"].combine_chunks(), pa.array(firsts)),
             "source_b": pc.take(t["source_b"].combine_chunks(), pa.array(firsts)),
             "n": pa.array(np.add.reduceat(n, firsts).astype(np.int64))}
        )

    rows = grouped_map(partials, ["source_a", "source_b"], fold).take_all()
    sizes = {r["source_a"]: r["n"] for r in rows if r["source_b"] == ""}
    pairs = [r for r in rows if r["source_b"] != ""]
    pairs.sort(key=lambda r: (r["source_a"], r["source_b"]))
    return pa.table(
        {"source_a": pa.array([r["source_a"] for r in pairs], pa.string()),
         "source_b": pa.array([r["source_b"] for r in pairs], pa.string()),
         "shared_grams": pa.array([int(r["n"]) for r in pairs], pa.int64()),
         "overlap_coeff": pa.array(
             [r["n"] / min(sizes[r["source_a"]], sizes[r["source_b"]])
              for r in pairs],
             pa.float64(),
         )}
    )


# GPT-2-style pre-tokenizer, RE2-safe (no lookahead — pyarrow and DuckDB
# both run RE2 with identical leftmost semantics, so counts match exactly):
# contraction suffixes, space-prefixed letter/digit/punct runs, whitespace.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|'| ?\s+"


def q_bpe_token_count_docs(sf_dir: str):
    """Token counting under a BPE-ish pre-tokenizer (the training-budget
    estimate a tokenizer-aware pipeline needs before the real BPE merges
    run): per doc, whitespace token count, GPT-2-style pre-token count
    (`BPE_SPLIT_RE`), and chars-per-pre-token (one exact division).
    Stateless vectorized scan — both regex engines are RE2, so the SQL
    twin counts the identical matches."""
    docs = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        n_ws = pc.cast(pc.count_substring_regex(low, r"\S+"), pa.int64())
        n_bpe = pc.cast(pc.count_substring_regex(low, BPE_SPLIT_RE), pa.int64())
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        ws = n_ws.to_numpy(zero_copy_only=False).astype(np.float64)
        bp = n_bpe.to_numpy(zero_copy_only=False).astype(np.float64)
        ch = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        none = bp == 0
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = ch / bp
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_ws_tokens": n_ws,
             "n_bpe_tokens": n_bpe,
             "chars_per_bpe_token": pa.array(
                 np.where(none, 0.0, ratio), mask=none
             )}
        )

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


_BPE_RE_SQL = BPE_SPLIT_RE.replace("'", "''")

QUERIES_DOCS["bpe_token_count_docs"] = q_bpe_token_count_docs
ORACLE_SQL_DOCS["bpe_token_count_docs"] = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}'))
                AS BIGINT) AS n_bpe_tokens,
           CASE WHEN len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')) > 0
                THEN CAST(length(text) AS DOUBLE)
                     / len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}'))
           END AS chars_per_bpe_token
    FROM documents
"""


QUERIES_DOCS["cross_source_overlap"] = q_cross_source_overlap
ORACLE_SQL_DOCS["cross_source_overlap"] = f"""
    WITH g AS (SELECT DISTINCT source, substr(text, t.gs, {JACCARD_K}) AS g
               FROM documents,
                    UNNEST(generate_series(1, length(text) - {JACCARD_K - 1}))
                      t(gs)),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
    p AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(COUNT(*) AS BIGINT) AS shared_grams
          FROM g a JOIN g b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
    SELECT p.source_a, p.source_b, p.shared_grams,
           CAST(p.shared_grams AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE)
             AS overlap_coeff
    FROM p JOIN sizes sa ON sa.source = p.source_a
           JOIN sizes sb ON sb.source = p.source_b
"""


QUERIES_DOCS["lm_surprisal_docs"] = q_lm_surprisal_docs
ORACLE_SQL_DOCS["lm_surprisal_docs"] = """
    WITH toks AS (
      SELECT doc_id, u.t AS tok
      FROM documents,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
    n AS (SELECT CAST(SUM(cf) AS BIGINT) AS nt FROM cf)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * (length(bin((SELECT nt FROM n)))
                             - length(bin(cf.cf)))) AS BIGINT) AS total_bits,
           CAST(SUM(tf.tf * (length(bin((SELECT nt FROM n)))
                             - length(bin(cf.cf)))) AS DOUBLE)
             / CAST(SUM(tf.tf) AS DOUBLE) AS bits_per_token
    FROM tf JOIN cf USING (tok)
    GROUP BY tf.doc_id
"""


def q_bpe_merges_docs(sf_dir: str):
    """BPE vocabulary training (Sennrich et al. 2016) on the documents
    corpus: the first 8 merge rules learned from word frequencies — the
    tokenizer-construction step of an LLM data pipeline, distributed as
    one corpus scan + vocabulary-sized merge rounds
    (`stages.text.bpe_train`).  Iterative and therefore not
    SQL-expressible (rows-only); the merge sequence is pinned exactly by
    the pure-python twin in tests/test_text_dedup.py."""
    from feast_ray.stages.text import bpe_train

    return bpe_train(_docs(sf_dir), n_merges=8)


QUERIES_DOCS["bpe_merges_docs"] = q_bpe_merges_docs
# no ORACLE_SQL entry: iterative merge training is not SQL-expressible


class _Compressor:
    """Actor-pool zlib scorer: the codec context is per-actor state (the
    stateful-stage shape a real tokenizer/model scorer uses); per batch it
    deflates each doc and emits exact integer sizes."""

    def __init__(self, level: int = 6):
        import zlib

        self._zlib = zlib
        self.level = level

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        texts = t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray
        ) else t["text"]
        raw = np.empty(t.num_rows, dtype=np.int64)
        comp = np.empty(t.num_rows, dtype=np.int64)
        for i, s in enumerate(texts.to_pylist()):
            b = (s or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(self._zlib.compress(b, self.level))
        none = comp == 0
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = raw.astype(np.float64) / comp.astype(np.float64)
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_bytes": pa.array(raw),
             "n_compressed": pa.array(comp),
             "compression_ratio": pa.array(
                 np.where(none, 0.0, ratio), mask=none
             )}
        )


def q_compression_ratio_docs(sf_dir: str):
    """Compressibility quality signal (the classic repetitive-junk
    detector: boilerplate and template spam deflate far better than
    natural text): per doc, raw vs zlib-deflated byte counts and their
    exact-division ratio, on an actor pool holding the codec state.
    Deterministic (fixed zlib level) but not SQL-expressible — the gate
    records rows-only; exactness is pinned by the pytest twin, which
    recomputes every size with the same stdlib zlib."""
    from feast_ray.stages.multimodal import (  # reuse the actor-pool wiring
        add_media_features,  # noqa: F401  (documentation cross-ref only)
    )

    docs = _docs(sf_dir)
    return docs.map_batches(
        _Compressor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,  # leaves CPU headroom for the read stage even in a
        num_cpus=1.0,   # 4-CPU session (actor pools can starve the reader)
    )


QUERIES_DOCS["compression_ratio_docs"] = q_compression_ratio_docs
# no ORACLE_SQL entry: zlib is not SQL-expressible; rows-only + pytest twin


def q_lm_bigram_surprisal_docs(sf_dir: str):
    """Bigram conditional-surprisal quality score (the LM-filter signal one
    order up from `lm_surprisal_docs`): per token position, the
    integer-quantized conditional cost ``blen(ctx(prev)) - blen(c(prev,
    tok))`` — context count over exact bigram count, document starts
    modeled with a BOS sentinel context.  The LM is trained on the corpus
    itself, so every scored bigram has count >= 1 and no backoff branch is
    needed; every quantity is an exact integer, making the twin bit-exact.
    Three co-partitioned exchanges over the bigram instance rows (by
    (prev, tok) for c, by prev for ctx, by doc for the fold) — the exact
    shape the SQL twin's three GROUP BYs take, each linear in tokens."""
    from feast_ray.grouped import grouped_map

    docs = _docs(sf_dir)

    def bigram_rows(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = parent[keep]
        n = len(flat)
        if n == 0:
            return pa.table(
                {"doc_id": t["doc_id"].combine_chunks().slice(0, 0),
                 "prev": flat, "tok": flat}
            )
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = parent[1:] != parent[:-1]
        idx = np.arange(n, dtype=np.int64) - 1
        prev = pc.if_else(
            pa.array(first),
            pa.scalar("", pa.string()),
            pc.take(flat, pa.array(np.maximum(idx, 0))),
        )
        return pa.table(
            {"doc_id": pc.take(t["doc_id"].combine_chunks(), pa.array(parent)),
             "prev": prev, "tok": flat}
        )

    inst = docs.map_batches(bigram_rows, batch_format="pyarrow", zero_copy_batch=True)

    def count_kernel(col_name: str):
        def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column(col_name, pa.array([], pa.int64()))
            per_group = np.diff(starts)
            return t.append_column(
                col_name,
                pa.array(np.repeat(per_group, per_group).astype(np.int64)),
            )

        return kernel

    with_bf = grouped_map(inst, ["prev", "tok"], count_kernel("bf"))
    with_ctx = grouped_map(with_bf, ["prev"], count_kernel("ctx"))

    def fold(t: pa.Table, starts: np.ndarray) -> pa.Table:
        did = t["doc_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": did.slice(0, 0),
                 "n_tokens": pa.array([], pa.int64()),
                 "total_bits": pa.array([], pa.int64()),
                 "bits_per_token": pa.array([], pa.float64())}
            )
        firsts = starts[:-1]
        bf = t["bf"].combine_chunks().to_numpy(zero_copy_only=False)
        ctx = t["ctx"].combine_chunks().to_numpy(zero_copy_only=False)
        cost = np.frexp(ctx.astype(np.float64))[1] - np.frexp(
            bf.astype(np.float64)
        )[1]
        n_tok = np.diff(starts).astype(np.int64)
        bits = np.add.reduceat(cost, firsts).astype(np.int64)
        return pa.table(
            {"doc_id": pc.take(did, pa.array(firsts)),
             "n_tokens": pa.array(n_tok),
             "total_bits": pa.array(bits),
             "bits_per_token": pa.array(
                 bits.astype(np.float64) / n_tok.astype(np.float64)
             )}
        )

    return grouped_map(with_ctx, ["doc_id"], fold)


QUERIES_DOCS["lm_bigram_surprisal_docs"] = q_lm_bigram_surprisal_docs
ORACLE_SQL_DOCS["lm_bigram_surprisal_docs"] = """
    WITH arr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS a
      FROM documents),
    inst AS (
      SELECT doc_id,
             CASE WHEN u.i = 1 THEN '' ELSE a[u.i - 1] END AS prev,
             a[u.i] AS tok
      FROM arr, unnest(generate_series(1, len(a))) u(i)),
    bf AS (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS bf
           FROM inst GROUP BY 1, 2),
    ctx AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS ctx FROM inst GROUP BY 1)
    SELECT i.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(length(bin(ctx.ctx)) - length(bin(bf.bf))) AS BIGINT)
             AS total_bits,
           CAST(SUM(length(bin(ctx.ctx)) - length(bin(bf.bf))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bits_per_token
    FROM inst i JOIN bf USING (prev, tok) JOIN ctx USING (prev)
    GROUP BY i.doc_id
"""


DSIR_BUCKETS = 4096
DSIR_FX = 16_777_216  # 2^24 fixed-point quantum for the log-ratio vector
DSIR_TARGET_LANG = "en"
DSIR_K = 50


def q_dsir_select_docs(sf_dir: str):
    """DSIR data selection (Xie et al. 2023, 'Data Selection for Language
    Models via Importance Resampling'): hashed-unigram bucket counts for
    the target slice (lang = 'en') and the raw corpus, add-one-smoothed
    per-bucket log-likelihood ratio quantized ONCE to 2^-24-bit fixed
    point, per-doc importance weight = exact BIGINT sum of its tokens'
    quantized ratios (order-independent — no float-summation hash risk),
    top-50 docs by weight.  Scale: bucket partials are map-side (<= 4096
    nonzero rows per block), folded on a bucket-keyed exchange whose
    result is <= 4096 rows driver-side by construction; the lambda vector
    broadcasts via ``ray.put``; scoring is one stateless scan + top-k.
    Token-hash convention: `stages.text.token_bucket_ids` (SQL-replayable
    Horner codepoint polynomial)."""
    import ray

    from feast_ray.grouped import grouped_map, sorted_head
    from feast_ray.stages.text import token_bucket_ids

    B = DSIR_BUCKETS
    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))

    def partial_counts(t: pa.Table) -> pa.Table:
        row_of, buckets = token_bucket_ids(t["text"], B)
        if len(buckets) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "c_raw": pa.array([], pa.int64()),
                 "c_tgt": pa.array([], pa.int64())}
            )
        is_tgt = pc.fill_null(
            pc.equal(t["lang"], DSIR_TARGET_LANG), False
        ).to_numpy(zero_copy_only=False)
        cr = np.bincount(buckets, minlength=B)
        ct = np.bincount(buckets[is_tgt[row_of]], minlength=B)
        nz = np.flatnonzero(cr)
        return pa.table(
            {"bucket": pa.array(nz.astype(np.int64)),
             "c_raw": pa.array(cr[nz].astype(np.int64)),
             "c_tgt": pa.array(ct[nz].astype(np.int64))}
        )

    parts = docs.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    def sum_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return t
        firsts = starts[:-1]
        cr = t["c_raw"].combine_chunks().to_numpy(zero_copy_only=False)
        ct = t["c_tgt"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"bucket": pc.take(t["bucket"].combine_chunks(), pa.array(firsts)),
             "c_raw": pa.array(np.add.reduceat(cr, firsts).astype(np.int64)),
             "c_tgt": pa.array(np.add.reduceat(ct, firsts).astype(np.int64))}
        )

    cr = np.zeros(B, dtype=np.int64)
    ct = np.zeros(B, dtype=np.int64)
    for row in grouped_map(parts, ["bucket"], sum_kernel).take_all():  # <= 4096 rows
        cr[row["bucket"]] = row["c_raw"]
        ct[row["bucket"]] = row["c_tgt"]
    n_raw, n_tgt = int(cr.sum()), int(ct.sum())
    lam = np.log((ct + 1).astype(np.float64) / float(n_tgt + B)) - np.log(
        (cr + 1).astype(np.float64) / float(n_raw + B)
    )
    lam_fx = np.floor(lam * DSIR_FX + 0.5).astype(np.int64)
    ref = ray.put(lam_fx)

    def score_fn(t: pa.Table) -> pa.Table:
        lam_fx = ray.get(ref)
        row_of, buckets = token_bucket_ids(t["text"], B)
        n = t.num_rows
        ntok = np.bincount(row_of, minlength=n).astype(np.int64)
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, row_of, lam_fx[buckets])
        out = pa.table(
            {"doc_id": t["doc_id"],
             "n_tokens": pa.array(ntok),
             "score_fx": pa.array(s),
             "log_weight": pa.array(s.astype(np.float64) / DSIR_FX)}
        )
        return out.filter(pa.array(ntok > 0))

    scored = docs.map_batches(score_fn, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_head(scored, ["score_fx", "doc_id"], [True, False], DSIR_K)


QUERIES_DOCS["dsir_select_docs"] = q_dsir_select_docs
ORACLE_SQL_DOCS["dsir_select_docs"] = f"""
    WITH toks AS (
      SELECT d.doc_id, d.lang, u.t AS tok
      FROM documents d,
           unnest(regexp_split_to_array(lower(d.text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    tb AS (
      SELECT doc_id, lang,
             CAST(list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                            list_transform(str_split(tok, ''),
                                           c -> CAST(unicode(c) AS HUGEINT))),
               (a, b) -> (a * 1000003 + b)
                         % CAST(18446744073709551616 AS HUGEINT))
                  % {DSIR_BUCKETS} AS BIGINT) AS bucket
      FROM toks),
    cnt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct
      FROM tb GROUP BY bucket),
    tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr,
                   CAST(SUM(ct) AS BIGINT) AS nt FROM cnt),
    lam AS (
      SELECT bucket,
             CAST(floor((ln(CAST(ct + 1 AS DOUBLE)
                            / CAST(nt + {DSIR_BUCKETS} AS DOUBLE))
                         - ln(CAST(cr + 1 AS DOUBLE)
                              / CAST(nr + {DSIR_BUCKETS} AS DOUBLE)))
                        * {DSIR_FX}.0 + 0.5) AS BIGINT) AS lam_fx
      FROM cnt CROSS JOIN tot),
    score AS (
      SELECT tb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(lam.lam_fx) AS BIGINT) AS score_fx
      FROM tb JOIN lam USING (bucket) GROUP BY tb.doc_id)
    SELECT doc_id, n_tokens, score_fx,
           CAST(score_fx AS DOUBLE) / {DSIR_FX}.0 AS log_weight
    FROM score ORDER BY score_fx DESC, doc_id LIMIT {DSIR_K}
"""


QUERIES_DOCS["weighted_sample_docs"] = q_weighted_sample_docs
ORACLE_SQL_DOCS["weighted_sample_docs"] = f"""
    WITH t AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents WHERE length(text) > 0),
    k AS (
      SELECT doc_id, n_chars,
             ln((CAST(({_MIX64_DOC}) // 2048 AS DOUBLE) + 0.5)
                / 9007199254740992.0) / n_chars AS skey
      FROM t)
    SELECT doc_id, n_chars FROM k ORDER BY skey DESC LIMIT 50
"""


def q_token_entropy_docs(sf_dir: str):
    """Per-document token entropy in bits (``stages.text.token_entropy``):
    the lexical-diversity quality gate (template spam and keyword stuffing
    score near 0) — fully batch-local (a doc is one row), zero shuffles,
    fixed-point micro-bit terms for bit-exact SQL parity."""
    from feast_ray.stages.text import token_entropy

    ds = _docs(sf_dir, columns=("doc_id", "text"))
    return token_entropy(ds, id_col="doc_id", text_col="text")


QUERIES_DOCS["token_entropy_docs"] = q_token_entropy_docs
ORACLE_SQL_DOCS["token_entropy_docs"] = """
    WITH toks AS (
      SELECT doc_id, u.t AS token
      FROM documents,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    c AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1, 2),
    t2 AS (
      SELECT doc_id, cnt,
             CAST(ROUND(cnt * log2(cnt) * 1000000) AS BIGINT) AS term
      FROM c),
    s AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(term) AS BIGINT) AS ts
      FROM t2 GROUP BY 1)
    SELECT doc_id, n_tokens, n_types,
           log2(CAST(n_tokens AS DOUBLE))
             - (CAST(ts AS DOUBLE) / 1000000.0) / CAST(n_tokens AS DOUBLE)
             AS entropy_bits
    FROM s
"""


PII_PATTERNS = {
    "n_email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "n_url": r"https?://[^\s]+",
    "n_longnum": r"[0-9]{7,}",
}


def q_pii_count_docs(sf_dir: str):
    """Per-document PII-risk profile (``stages.text.pattern_counts``):
    counts of email addresses, URLs and 7+-digit runs — the screening pass
    that decides redaction vs drop in an LLM-data pipeline.  Stateless
    vectorized RE2 scan, zero shuffles."""
    from feast_ray.stages.text import pattern_counts

    ds = _docs(sf_dir, columns=("doc_id", "text"))
    return pattern_counts(ds, PII_PATTERNS)


QUERIES_DOCS["pii_count_docs"] = q_pii_count_docs
ORACLE_SQL_DOCS["pii_count_docs"] = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                '{PII_PATTERNS["n_email"]}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(lower(text),
                '{PII_PATTERNS["n_url"]}')) AS BIGINT) AS n_url,
           CAST(len(regexp_extract_all(lower(text),
                '{PII_PATTERNS["n_longnum"]}')) AS BIGINT) AS n_longnum
    FROM documents
"""


def q_zipf_slope_docs(sf_dir: str):
    """Corpus Zipf-fit health summary (``stages.text.zipf_slope``): OLS
    slope of log2(freq) on log2(rank) over the vocabulary with count >= 3
    — distributed token counts, range-partitioned frequency ranks,
    fixed-point milli-log term sums, one-row output."""
    from feast_ray.stages.text import zipf_slope

    ds = _docs(sf_dir, columns=("doc_id", "text"))
    return zipf_slope(ds, min_count=3)


QUERIES_DOCS["zipf_slope_docs"] = q_zipf_slope_docs
ORACLE_SQL_DOCS["zipf_slope_docs"] = """
    WITH toks AS (
      SELECT u.t AS token
      FROM documents,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    c AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1 HAVING COUNT(*) >= 3),
    r AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM c),
    t AS (
      SELECT CAST(ROUND(log2(CAST(rnk AS DOUBLE)) * 1000) AS BIGINT) AS xm,
             CAST(ROUND(log2(CAST(cnt AS DOUBLE)) * 1000) AS BIGINT) AS ym
      FROM r),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xm) AS BIGINT) AS sx, CAST(SUM(ym) AS BIGINT) AS sy,
             CAST(SUM(xm * xm) AS BIGINT) AS sxx,
             CAST(SUM(xm * ym) AS BIGINT) AS sxy
      FROM t)
    SELECT n AS n_vocab,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(n AS DOUBLE))
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              / CAST(n AS DOUBLE)) AS zipf_slope
    FROM s
"""


def q_ks_doclen_sources(sf_dir: str):
    """Exact two-sample KS statistic between the document-length
    distributions of two feeds (``stages.stats.ks_two_sample``): the
    supremum gap is an exact int64 cross-multiple over cumulative counts
    at distinct lengths; one float divide at the end."""
    from feast_ray.stages.stats import ks_two_sample

    ds = _docs(sf_dir, columns=("source", "n_chars"))
    return ks_two_sample(ds, "n_chars", "source", "src0", "src1")


QUERIES_DOCS["ks_doclen_sources"] = q_ks_doclen_sources
ORACLE_SQL_DOCS["ks_doclen_sources"] = """
    WITH f AS (
      SELECT n_chars AS v, source AS g FROM documents
      WHERE source IN ('src0', 'src1')),
    c AS (
      SELECT v,
             CAST(SUM(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM f GROUP BY v),
    t AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM c),
    w AS (
      SELECT SUM(a) OVER (ORDER BY v) AS ca, SUM(b) OVER (ORDER BY v) AS cb
      FROM c),
    m AS (
      SELECT CAST(MAX(ABS(ca * t.nb - cb * t.na)) AS BIGINT) AS mx
      FROM w, t GROUP BY t.na, t.nb)
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST(m.mx AS DOUBLE)
             / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS ks_stat
    FROM m, t
"""


from feast_ray.pipelines.queries_ml import _mix64_sql as _MIX64_DOCS  # noqa: E402


def q_split_leak_docs(sf_dir: str):
    """Train/test duplicate-leak audit: docs split 80/20 by mix64(doc_id);
    a text that appears on BOTH sides is a leak (the dup-across-split
    contamination that inflates eval scores).  One grouped exchange keyed
    on the text (at corpus scale key on the fingerprint hash instead —
    same pipeline shape); per-group side flags OR-fold vectorized."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.sampling import mix64

    ds = _docs(sf_dir, columns=("doc_id", "text"))

    def tag(t: pa.Table) -> pa.Table:
        k = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        tr = ((mix64(k) % np.uint64(100)) < np.uint64(80)).astype(np.int64)
        return pa.table({"text": t["text"], "is_train": pa.array(tr)})

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        cols = ["n_texts", "n_leaky_texts", "n_leaky_docs"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tr = t["is_train"].combine_chunks().to_numpy(zero_copy_only=False)
        firsts = starts[:-1]
        sizes = np.diff(starts)
        any_tr = np.add.reduceat(tr, firsts) > 0
        any_te = np.add.reduceat(1 - tr, firsts) > 0
        leaky = any_tr & any_te
        vals = [len(firsts), int(leaky.sum()), int(sizes[leaky].sum())]
        return pa.table({c: pa.array([v], pa.int64())
                         for c, v in zip(cols, vals)})

    rows = grouped_map(tagged, ["text"], kernel).take_all()
    return pa.table({
        "n_texts": pa.array([sum(int(r["n_texts"]) for r in rows)], pa.int64()),
        "n_leaky_texts": pa.array(
            [sum(int(r["n_leaky_texts"]) for r in rows)], pa.int64()),
        "n_leaky_docs": pa.array(
            [sum(int(r["n_leaky_docs"]) for r in rows)], pa.int64()),
    })


QUERIES_DOCS["split_leak_docs"] = q_split_leak_docs
ORACLE_SQL_DOCS["split_leak_docs"] = f"""
    WITH s AS (
      SELECT text,
             CASE WHEN {_MIX64_DOCS("doc_id")} % 100 < 80
                  THEN 1 ELSE 0 END AS is_train
      FROM documents),
    g AS (
      SELECT text, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(is_train) AS any_tr, MIN(is_train) AS all_tr
      FROM s GROUP BY text)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_texts,
           CAST(SUM(CASE WHEN any_tr = 1 AND all_tr = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaky_texts,
           CAST(SUM(CASE WHEN any_tr = 1 AND all_tr = 0 THEN n ELSE 0 END)
                AS BIGINT) AS n_leaky_docs
    FROM g
"""


def q_hashed_bow_docs(sf_dir: str):
    """Hashed bag-of-words featurization — every document as a sparse
    64-bucket unigram count vector (doc_id, bucket, n): the vocabulary-free
    text featurizer linear probes / DSIR-style selectors train on.  Tokens
    hash via the SQL-replayable Horner codepoint polynomial
    (``stages.text.token_bucket_ids``); counts ride one map-side-combined
    exchange.  Output is sparse long form — at most 64 rows per doc no
    matter the text length."""
    from feast_ray.stages.stats import partial_count_sum
    from feast_ray.stages.text import token_bucket_ids

    docs = _docs(sf_dir)

    def expand(t: pa.Table) -> pa.Table:
        row_of, bucket = token_bucket_ids(t["text"], 64)
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[row_of]),
            "bucket": pa.array(bucket),
        })

    b = docs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    return partial_count_sum(b, ["doc_id", "bucket"], count_name="n")


QUERIES_DOCS["hashed_bow_docs"] = q_hashed_bow_docs
ORACLE_SQL_DOCS["hashed_bow_docs"] = """
    WITH toks AS (
      SELECT d.doc_id, u.t AS tok
      FROM documents d,
           unnest(regexp_split_to_array(lower(d.text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> '')
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS HUGEINT),
                          list_transform(str_split(tok, ''),
                                         c -> CAST(unicode(c) AS HUGEINT))),
             (a, b) -> (a * 1000003 + b)
                       % CAST(18446744073709551616 AS HUGEINT))
                % 64 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM toks GROUP BY 1, 2
"""


CM_ROWS = 4
CM_WIDTH = 512
CM_SALT = 0x9E3779B97F4A7C15  # == sampling.MIX; row r keys off t64 + r*MIX


def q_countmin_tokens_docs(sf_dir: str):
    """Count-Min sketch token-frequency estimates, audited against exact
    counts for the exact top-20 tokens — the fixed-memory frequency oracle
    a streaming ingest keeps when the token domain is unbounded.  Sketch:
    4 rows x 512 cells; row r's cell is mix64(t64 + r*MIX) % 512 over the
    Horner token hash, so a DuckDB twin rebuilds the ENTIRE sketch
    bit-exactly.  The cell table is bounded (2048 rows) and comes from one
    map-side-combined exchange; estimates are min-over-rows.  CM guarantee
    (est >= exact) is pinned in tests."""
    from feast_ray.grouped import sorted_head
    from feast_ray.stages.sampling import mix64
    from feast_ray.stages.stats import partial_count_sum
    from feast_ray.stages.text import token_hash64

    docs = _docs(sf_dir, columns=("text",))

    def cells(t: pa.Table) -> pa.Table:
        _, h = token_hash64(t["text"])
        nt = len(h)
        r = np.repeat(np.arange(CM_ROWS, dtype=np.uint64), nt)
        hh = np.tile(h, CM_ROWS)
        cell = (mix64(hh + r * np.uint64(CM_SALT)) % np.uint64(CM_WIDTH))
        return pa.table({
            "r": pa.array(r.astype(np.int64)),
            "cell": pa.array(cell.astype(np.int64)),
        })

    cm = partial_count_sum(
        docs.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        ["r", "cell"], count_name="total",
    ).take_all()  # bounded: CM_ROWS x CM_WIDTH
    cm_map = {(int(x["r"]), int(x["cell"])): int(x["total"]) for x in cm}

    def tok_rows(t: pa.Table) -> pa.Table:
        from feast_ray.stages.text import tokenize_batch

        toks = tokenize_batch(t)
        return pa.table({"token": toks})

    cnts = partial_count_sum(
        docs.map_batches(tok_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], count_name="cnt",
    )
    top = sorted_head(cnts, ["cnt", "token"], [True, True], 20).to_pandas()

    from feast_ray.stages.dedup import GRAM_BASE

    ests = []
    m64 = 1 << 64
    for tok in top["token"]:
        h = 0
        for ch in tok:  # exact Python-int Horner, mod 2^64
            h = (h * int(GRAM_BASE) + ord(ch)) % m64
        ests.append(min(
            cm_map[(r, int(
                mix64(np.array([(h + r * CM_SALT) % m64], dtype=np.uint64))[0]
                % np.uint64(CM_WIDTH)))]
            for r in range(CM_ROWS)
        ))
    return pa.table({
        "token": pa.array(top["token"], pa.string()),
        "exact_cnt": pa.array(top["cnt"].to_numpy(), pa.int64()),
        "cm_est": pa.array(ests, pa.int64()),
    })


QUERIES_DOCS["countmin_tokens_docs"] = q_countmin_tokens_docs
_CM_T64 = """CAST(list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                            list_transform(str_split(token, ''),
                                           c -> CAST(unicode(c) AS HUGEINT))),
               (a, b) -> (a * 1000003 + b)
                         % CAST(18446744073709551616 AS HUGEINT))
             AS HUGEINT)"""
from feast_ray.pipelines.queries_ml import _mix64_sql as _cm_mix64_sql

ORACLE_SQL_DOCS["countmin_tokens_docs"] = f"""
    WITH toks AS (
      SELECT u.t AS token
      FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    th AS (
      SELECT token, {_CM_T64} AS t64, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY token),
    keyed AS (
      SELECT token, cnt, r.range AS r,
             (t64 + r.range * CAST({CM_SALT} AS HUGEINT))
               % CAST(18446744073709551616 AS HUGEINT) AS ck
      FROM th CROSS JOIN range({CM_ROWS}) r),
    tcell AS (
      SELECT token, cnt, r,
             CAST(({_cm_mix64_sql("ck")}) % {CM_WIDTH} AS BIGINT) AS cell
      FROM keyed),
    cells AS (
      SELECT r, cell, CAST(SUM(cnt) AS BIGINT) AS total
      FROM tcell GROUP BY 1, 2),
    top AS (SELECT token, cnt FROM th ORDER BY cnt DESC, token LIMIT 20)
    SELECT top.token, top.cnt AS exact_cnt,
           CAST(MIN(cells.total) AS BIGINT) AS cm_est
    FROM top JOIN tcell USING (token)
             JOIN cells ON cells.r = tcell.r AND cells.cell = tcell.cell
    GROUP BY 1, 2
"""


def q_js_divergence_sources(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between sources over the
    64-bucket hashed-unigram distribution — the corpus-mixing diagnostic
    that says WHICH ingest feeds actually differ (symmetric, bounded,
    unlike KL).  Bucket counts are one map-side-combined exchange bounded
    by |sources| x 64; the pairwise finalize walks the densified grid with
    Laplace +1 smoothing (zero buckets count).  Micro-nat ROUND(half-away)
    terms, exact int64 sum per pair, one final division — bit-equal to the
    DuckDB twin."""
    from feast_ray.stages.stats import partial_count_sum
    from feast_ray.stages.text import token_bucket_ids

    docs = _docs(sf_dir, columns=("source", "text"))

    def expand(t: pa.Table) -> pa.Table:
        row_of, bucket = token_bucket_ids(t["text"], 64)
        src = t["source"].combine_chunks()
        return pa.table({
            "source": pc.take(src, pa.array(row_of, pa.int64())),
            "bucket": pa.array(bucket),
        })

    cnt = partial_count_sum(
        docs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "bucket"], count_name="n",
    ).take_all()  # bounded: |sources| x 64
    import pandas as pd

    cdf = pd.DataFrame(cnt)
    sources = sorted(cdf["source"].unique())
    grid = pd.MultiIndex.from_product(
        [sources, range(64)], names=["source", "bucket"]).to_frame(index=False)
    dens = grid.merge(cdf, on=["source", "bucket"], how="left").fillna(0)
    dens["n"] = dens["n"].astype("int64")
    mat = dens.pivot(index="source", columns="bucket", values="n")
    rows = []
    for i, sa in enumerate(sources):
        na = int(mat.loc[sa].sum())
        for sb in sources[i + 1:]:
            nb = int(mat.loc[sb].sum())
            p = pa.array((mat.loc[sa].to_numpy() + 1.0) / (na + 64.0))
            q = pa.array((mat.loc[sb].to_numpy() + 1.0) / (nb + 64.0))
            m = pc.divide(pc.add(p, q), 2.0)
            term = pc.multiply(
                pc.multiply(
                    0.5,
                    pc.add(pc.multiply(p, pc.ln(pc.divide(p, m))),
                           pc.multiply(q, pc.ln(pc.divide(q, m))))),
                1_000_000.0)
            tm = pc.cast(pc.round(term, round_mode="half_towards_infinity"),
                         pa.int64())
            rows.append((sa, sb, na, nb, pc.sum(tm).as_py() / 1_000_000.0))
    return pa.table({
        "source_a": pa.array([r[0] for r in rows], pa.string()),
        "source_b": pa.array([r[1] for r in rows], pa.string()),
        "n_tokens_a": pa.array([r[2] for r in rows], pa.int64()),
        "n_tokens_b": pa.array([r[3] for r in rows], pa.int64()),
        "jsd": pa.array([r[4] for r in rows], pa.float64()),
    })


QUERIES_DOCS["js_divergence_sources"] = q_js_divergence_sources
ORACLE_SQL_DOCS["js_divergence_sources"] = """
    WITH toks AS (
      SELECT d.source, u.t AS tok
      FROM documents d,
           unnest(regexp_split_to_array(lower(d.text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    tb AS (
      SELECT source,
             CAST(list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                            list_transform(str_split(tok, ''),
                                           c -> CAST(unicode(c) AS HUGEINT))),
               (a, b) -> (a * 1000003 + b)
                         % CAST(18446744073709551616 AS HUGEINT))
                  % 64 AS BIGINT) AS bucket
      FROM toks),
    cnt AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM tb GROUP BY 1, 2),
    grid AS (SELECT s.source, r.range AS bucket
             FROM (SELECT DISTINCT source FROM documents) s
             CROSS JOIN range(64) r),
    dens AS (SELECT grid.source, grid.bucket, COALESCE(cnt.n, 0) AS n
             FROM grid LEFT JOIN cnt
               ON cnt.source = grid.source AND cnt.bucket = grid.bucket),
    tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nt
            FROM dens GROUP BY 1),
    pair AS (
      SELECT a.source AS source_a, b.source AS source_b,
             ta.nt AS n_tokens_a, tb2.nt AS n_tokens_b,
             CAST(ROUND(
               0.5 * ((a.n + 1.0) / (ta.nt + 64.0)
                      * ln(((a.n + 1.0) / (ta.nt + 64.0))
                           / (((a.n + 1.0) / (ta.nt + 64.0)
                               + (b.n + 1.0) / (tb2.nt + 64.0)) / 2.0))
                      + (b.n + 1.0) / (tb2.nt + 64.0)
                        * ln(((b.n + 1.0) / (tb2.nt + 64.0))
                             / (((a.n + 1.0) / (ta.nt + 64.0)
                                 + (b.n + 1.0) / (tb2.nt + 64.0)) / 2.0)))
               * 1000000.0) AS BIGINT) AS tm
      FROM dens a
      JOIN dens b ON a.bucket = b.bucket AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb2 ON tb2.source = b.source)
    SELECT source_a, source_b, n_tokens_a, n_tokens_b,
           CAST(CAST(SUM(tm) AS BIGINT) AS DOUBLE) / 1000000.0 AS jsd
    FROM pair GROUP BY 1, 2, 3, 4
"""


def q_token_burstiness_docs(sf_dir: str):
    """Token burstiness (Church-Gale): within containing documents, the
    variance-to-mean ratio of a token's per-doc count — separates CONTENT
    words (bursty: absent mostly, heavy where present) from FUNCTION words
    (evenly spread), the signal topical-keyword extractors use.  Each doc
    lives in one batch, so (doc, token) counts are batch-exact; tokens
    carry (df=1, count, count^2) partials through one token-keyed exchange;
    top-20 by corpus count finalize on the driver as exact ints with one
    float division: b = (ss*df - cnt^2) / (df*cnt)."""
    from feast_ray.grouped import sorted_head
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.text import tokenize_batch

    docs = _docs(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "ss": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        split = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), "[^a-z0-9]+")
        counts = pc.fill_null(pc.list_value_length(split), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.combine_chunks().flatten() if isinstance(
            split, pa.ChunkedArray) else split.flatten()
        keep = pc.not_equal(flat, "")
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        row_of = row_of[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
        if len(flat) == 0:
            return empty
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # per (doc, token-code) counts: one lexsort + run detection
        order = np.lexsort((codes, row_of))
        rr, cc = row_of[order], codes[order]
        new = np.empty(len(rr), dtype=bool)
        new[0] = True
        new[1:] = (rr[1:] != rr[:-1]) | (cc[1:] != cc[:-1])
        runs = np.flatnonzero(new)
        c_td = np.diff(np.concatenate((runs, [len(rr)]))).astype(np.int64)
        tok_codes = cc[runs]
        # combine per token within the batch
        o2 = np.argsort(tok_codes, kind="stable")
        tc, cv = tok_codes[o2], c_td[o2]
        new2 = np.empty(len(tc), dtype=bool)
        new2[0] = True
        new2[1:] = tc[1:] != tc[:-1]
        r2 = np.flatnonzero(new2)
        df = np.diff(np.concatenate((r2, [len(tc)]))).astype(np.int64)
        cnt = np.add.reduceat(cv, r2).astype(np.int64)
        ss = np.add.reduceat(cv * cv, r2).astype(np.int64)
        return pa.table({
            "token": pc.take(d.dictionary, pa.array(tc[r2], pa.int64())),
            "df": pa.array(df),
            "cnt": pa.array(cnt),
            "ss": pa.array(ss),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    agg = sum_by(partials, ["token"], ["df", "cnt", "ss"])
    top = sorted_head(agg, ["cnt", "token"], [True, True], 20).to_pandas()
    b = [
        float(int(r["ss"]) * int(r["df"]) - int(r["cnt"]) ** 2)
        / float(int(r["df"]) * int(r["cnt"]))
        for _, r in top.iterrows()
    ]
    return pa.table({
        "token": pa.array(top["token"], pa.string()),
        "df": pa.array(top["df"].to_numpy(), pa.int64()),
        "cnt": pa.array(top["cnt"].to_numpy(), pa.int64()),
        "burstiness": pa.array(b, pa.float64()),
    })


QUERIES_DOCS["token_burstiness_docs"] = q_token_burstiness_docs
ORACLE_SQL_DOCS["token_burstiness_docs"] = """
    WITH toks AS (
      SELECT d.doc_id, u.t AS token
      FROM documents d,
           unnest(regexp_split_to_array(lower(d.text), '[^a-z0-9]+')) u(t)
      WHERE u.t <> ''),
    td AS (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
    agg AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(c) AS BIGINT) AS cnt,
                   CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
            FROM td GROUP BY 1),
    top AS (SELECT * FROM agg ORDER BY cnt DESC, token LIMIT 20)
    SELECT token, df, cnt,
           CAST(ss * df - CAST(cnt AS HUGEINT) * cnt AS DOUBLE)
             / CAST(CAST(df AS HUGEINT) * cnt AS DOUBLE) AS burstiness
    FROM top
"""


def q_byte_weighted_len_docs(sf_dir: str):
    """Byte-weighted corpus length percentiles — 'half the corpus BYTES
    live in docs shorter than X' (the p50/p90 by bytes vs by docs gap is
    the long-tail evidence that drives chunking and packing budgets).
    Length counts ride one map-side-combined exchange bounded by the
    distinct-length domain (<= max doc length regardless of corpus size);
    the cumulative pick runs on the driver over that bounded table.
    quantile_disc semantics on both axes: smallest length whose cumulative
    count/bytes reaches ceil(q * total)."""
    from feast_ray.stages.stats import partial_count_sum

    docs = _docs(sf_dir, columns=("n_chars",))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"len": t["n_chars"].combine_chunks().cast(pa.int64())})

    cnt = partial_count_sum(
        docs.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda t: t.append_column(
            "b", t["len"]), batch_format="pyarrow", zero_copy_batch=True),
        ["len"], "b", count_name="n_docs", sum_name="bytes_",
    ).take_all()  # bounded by the distinct-length domain
    import pandas as pd

    cdf = pd.DataFrame(cnt).sort_values("len").reset_index(drop=True)
    nd = int(cdf["n_docs"].sum())
    nb = int(cdf["bytes_"].sum())
    cum_d = cdf["n_docs"].cumsum().to_numpy()
    cum_b = cdf["bytes_"].cumsum().to_numpy()
    lens = cdf["len"].to_numpy()

    def pick(cum, total, q):
        import math
        need = math.ceil(q * total)
        return int(lens[int(np.searchsorted(cum, need))])

    return pa.table({
        "n_docs": pa.array([nd], pa.int64()),
        "total_bytes": pa.array([nb], pa.int64()),
        "p50_by_docs": pa.array([pick(cum_d, nd, 0.5)], pa.int64()),
        "p50_by_bytes": pa.array([pick(cum_b, nb, 0.5)], pa.int64()),
        "p90_by_docs": pa.array([pick(cum_d, nd, 0.9)], pa.int64()),
        "p90_by_bytes": pa.array([pick(cum_b, nb, 0.9)], pa.int64()),
    })


QUERIES_DOCS["byte_weighted_len_docs"] = q_byte_weighted_len_docs
ORACLE_SQL_DOCS["byte_weighted_len_docs"] = """
    WITH l AS (SELECT CAST(n_chars AS BIGINT) AS len FROM documents),
    g AS (SELECT len, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len) AS BIGINT) AS bytes_
          FROM l GROUP BY 1),
    c AS (SELECT len,
                 SUM(n_docs) OVER (ORDER BY len) AS cd,
                 SUM(bytes_) OVER (ORDER BY len) AS cb
          FROM g),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nd,
                 CAST(SUM(bytes_) AS BIGINT) AS nb FROM g)
    SELECT t.nd AS n_docs, t.nb AS total_bytes,
           (SELECT MIN(len) FROM c WHERE cd >= CEIL(0.5 * t.nd))
             AS p50_by_docs,
           (SELECT MIN(len) FROM c WHERE cb >= CEIL(0.5 * t.nb))
             AS p50_by_bytes,
           (SELECT MIN(len) FROM c WHERE cd >= CEIL(0.9 * t.nd))
             AS p90_by_docs,
           (SELECT MIN(len) FROM c WHERE cb >= CEIL(0.9 * t.nb))
             AS p90_by_bytes
    FROM t
"""


def q_wav_spectral_docs(sf_dir: str):
    """REAL spectral audio features (numpy rfft, no audio library): each
    doc carries a deterministic sine-tone WAV (`attach_sine_wav_payloads`
    — tone 200 + (doc_id % 16)*200 Hz); the actor-pool stage decodes the
    PCM and emits dominant frequency, spectral centroid and RMS.  No SQL
    twin (DuckDB has no FFT) — rows-only for the driver; the planted-tone
    recovery (dominant bin == the synthesized frequency to bin resolution)
    and an exact numpy-recompute parity are pinned in
    tests/test_wave28_ops.py."""
    from feast_ray.stages.multimodal import (add_audio_spectral,
                                             attach_sine_wav_payloads)

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        attach_sine_wav_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_audio_spectral(ds, id_cols=("doc_id",), mode="decode",
                             concurrency=2, batch_size=64)
    return out.select_columns(
        ["doc_id", "n_samples", "dominant_hz", "centroid_hz", "rms"])


QUERIES_DOCS["wav_spectral_docs"] = q_wav_spectral_docs
# no ORACLE_SQL entry: FFT is not SQL-expressible; rows-only by design


def q_bmp_gradient_docs(sf_dir: str):
    """REAL image-gradient features over decoded BMP pixels
    (`stages.multimodal.ImageGradientExtractor`): exact |dx| / |dy|
    grayscale finite-difference sums + edge density per image — the
    blur / flat-region screen, computed on the true decoded pixel grid
    (the decoder undid BGR order, row padding and bottom-up layout).  The
    DuckDB twin re-derives every pixel from the payload generator's closed
    form and takes the same differences — a hash-exact oracle over a real
    binary decode path."""
    from feast_ray.stages.multimodal import (add_image_gradients,
                                             attach_bmp_payloads)

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        attach_bmp_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_image_gradients(ds, id_cols=("doc_id",), concurrency=2,
                              batch_size=64)
    return out.select_columns(
        ["doc_id", "width", "height", "sum_abs_dx", "sum_abs_dy",
         "edge_density"])


QUERIES_DOCS["bmp_gradient_docs"] = q_bmp_gradient_docs
ORACLE_SQL_DOCS["bmp_gradient_docs"] = """
    WITH dims AS (
      SELECT doc_id, CAST(doc_id % 37 + 1 AS BIGINT) AS w,
             CAST(doc_id % 23 + 1 AS BIGINT) AS h,
             CAST(doc_id % 256 AS BIGINT) AS m
      FROM documents),
    px AS (
      SELECT doc_id, w, h, u.p AS p,
             ((m + u.p * 3) % 256) + ((m + u.p * 3 + 1) % 256)
               + ((m + u.p * 3 + 2) % 256) AS gray
      FROM dims, unnest(generate_series(0, w * h - 1)) AS u(p)),
    dx AS (
      SELECT a.doc_id, CAST(SUM(ABS(b.gray - a.gray)) AS BIGINT) AS s
      FROM px a JOIN px b
        ON b.doc_id = a.doc_id AND b.p = a.p + 1
      WHERE (a.p % a.w) < a.w - 1
      GROUP BY 1),
    dy AS (
      SELECT a.doc_id, CAST(SUM(ABS(b.gray - a.gray)) AS BIGINT) AS s
      FROM px a JOIN px b
        ON b.doc_id = a.doc_id AND b.p = a.p + a.w
      WHERE (a.p // a.w) < a.h - 1
      GROUP BY 1)
    SELECT d.doc_id, d.w AS width, d.h AS height,
           COALESCE(dx.s, 0) AS sum_abs_dx,
           COALESCE(dy.s, 0) AS sum_abs_dy,
           CASE WHEN d.h * (d.w - 1) + (d.h - 1) * d.w > 0
                THEN CAST(COALESCE(dx.s, 0) + COALESCE(dy.s, 0) AS DOUBLE)
                     / CAST(d.h * (d.w - 1) + (d.h - 1) * d.w AS DOUBLE)
                ELSE 0.0 END AS edge_density
    FROM dims d
    LEFT JOIN dx ON dx.doc_id = d.doc_id
    LEFT JOIN dy ON dy.doc_id = d.doc_id
"""


def q_lognormal_fit_sources(sf_dir: str):
    """Per-source log-normal fit of document length — (mu, sigma) of
    ln(n_chars), the two numbers that summarize a web corpus's length
    distribution (length is classically log-normal; the fit drives
    chunk-size and packing-budget choices per ingest feed).  Micro-nat
    fixed-point ln terms; per-block (source, n, s, q) partials fold as
    exact Python ints on the driver (bounded by sources x blocks); mu and
    sigma run one fixed float schedule mirrored in the SQL twin."""
    docs = _docs(sf_dir, columns=("source", "n_chars"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_chars"], 0))
        empty = pa.table({
            "source": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "q": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        ln = pc.ln(t["n_chars"].combine_chunks().cast(pa.float64()))
        tm = pc.cast(pc.round(pc.multiply(ln, 1_000_000.0),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        src = t["source"].combine_chunks()
        d = src.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        cs, ts = codes[order], tm[order]
        new = np.empty(len(cs), dtype=bool)
        new[0] = True
        new[1:] = cs[1:] != cs[:-1]
        runs = np.flatnonzero(new)
        n_g = np.diff(np.concatenate((runs, [len(cs)]))).astype(np.int64)
        s_g = np.add.reduceat(ts, runs).astype(np.int64)
        q_g = np.add.reduceat(ts * ts, runs).astype(np.int64)
        return pa.table({
            "source": pc.take(d.dictionary, pa.array(cs[runs], pa.int64())),
            "n": pa.array(n_g), "s": pa.array(s_g), "q": pa.array(q_g),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict = {}
    for r in parts:  # exact Python-int fold, bounded by sources
        k = r["source"]
        n0, s0, q0 = agg.get(k, (0, 0, 0))
        agg[k] = (n0 + int(r["n"]), s0 + int(r["s"]), q0 + int(r["q"]))
    rows = sorted(agg.items())
    mus, sigmas = [], []
    import math

    for _, (n0, s0, q0) in rows:
        mu = (float(s0) / 1_000_000.0) / float(n0)
        var = (float(q0) / 1_000_000_000_000.0) / float(n0) - mu * mu
        mus.append(mu)
        sigmas.append(math.sqrt(var) if var > 0 else 0.0)
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_docs": pa.array([r[1][0] for r in rows], pa.int64()),
        "mu_ln": pa.array(mus, pa.float64()),
        "sigma_ln": pa.array(sigmas, pa.float64()),
    })


QUERIES_DOCS["lognormal_fit_sources"] = q_lognormal_fit_sources
ORACLE_SQL_DOCS["lognormal_fit_sources"] = """
    WITH t AS (
      SELECT source,
             CAST(ROUND(ln(CAST(n_chars AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS tm
      FROM documents WHERE n_chars > 0),
    m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(tm) AS BIGINT) AS s,
             CAST(SUM(CAST(tm AS HUGEINT) * tm) AS HUGEINT) AS q
      FROM t GROUP BY 1)
    SELECT source, n AS n_docs,
           (CAST(s AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE) AS mu_ln,
           CASE WHEN (CAST(q AS DOUBLE) / 1000000000000.0) / CAST(n AS DOUBLE)
                     - ((CAST(s AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))
                       * ((CAST(s AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))
                     > 0
                THEN sqrt((CAST(q AS DOUBLE) / 1000000000000.0)
                            / CAST(n AS DOUBLE)
                          - ((CAST(s AS DOUBLE) / 1000000.0)
                             / CAST(n AS DOUBLE))
                            * ((CAST(s AS DOUBLE) / 1000000.0)
                               / CAST(n AS DOUBLE)))
                ELSE 0.0 END AS sigma_ln
    FROM m
"""


def q_sentence_stats_docs(sf_dir: str):
    """Per-document sentence statistics — sentence count and exact mean
    sentence length in characters (the readability axis `word_stats_docs`
    doesn't cover: long-sentence legalese vs choppy SEO spam).  Sentences
    split on [.!?]+ runs via one vectorized Arrow regex; empty fragments
    (leading/trailing/double punctuation) drop on both sides; stateless
    map, zero shuffles."""
    docs = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern_regex(txt, r"[.!?]+")
        flat = split.flatten()
        # strip an EXPLICIT char set — DuckDB trim(s, chars) parity
        trimmed = pc.utf8_trim(flat, " \t\n\r")
        lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
        keep = lens > 0
        counts = pc.fill_null(pc.list_value_length(split), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        row_of = row_of[keep]
        lens = lens[keep].astype(np.int64)
        n_sent = np.bincount(row_of, minlength=t.num_rows).astype(np.int64)
        tot_len = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(tot_len, row_of, lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_len = np.where(
                n_sent > 0,
                tot_len.astype(np.float64) / n_sent.astype(np.float64),
                np.nan)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_sentences": pa.array(n_sent),
            "sum_sentence_chars": pa.array(tot_len),
            "mean_sentence_chars": pa.array(mean_len, pa.float64(),
                                            from_pandas=True),
        })

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_DOCS["sentence_stats_docs"] = q_sentence_stats_docs
ORACLE_SQL_DOCS["sentence_stats_docs"] = """
    WITH s AS (
      SELECT d.doc_id,
             length(trim(u.frag, ' ' || chr(9) || chr(10) || chr(13))) AS ln
      FROM documents d,
           unnest(regexp_split_to_array(d.text, '[.!?]+')) u(frag)
      WHERE length(trim(u.frag, ' ' || chr(9) || chr(10) || chr(13))) > 0),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sentences,
             CAST(SUM(ln) AS BIGINT) AS sum_sentence_chars
      FROM s GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(agg.n_sentences, 0) AS n_sentences,
           COALESCE(agg.sum_sentence_chars, 0) AS sum_sentence_chars,
           CASE WHEN agg.n_sentences > 0
                THEN CAST(agg.sum_sentence_chars AS DOUBLE)
                     / CAST(agg.n_sentences AS DOUBLE)
           END AS mean_sentence_chars
    FROM documents d LEFT JOIN agg USING (doc_id)
"""


def q_novelty_fraction_docs(sf_dir: str):
    """Forward-novelty fraction per document — the share of a doc's
    distinct 5-gram shingles never seen in any LOWER doc_id (doc_id as
    ingest order): the curriculum / freshness signal that separates
    contributing documents from rehashes, and the streaming view of
    duplication that `dup_shingles_docs` measures symmetrically.  One
    shingle-keyed exchange (per-gram min doc_id + per-(gram, doc) dedup
    fused in the kernel), one doc-keyed count exchange."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.decontam import shingle_table
    from feast_ray.stages.stats import partial_count_sum

    sh = shingle_table(_docs(sf_dir), w=5)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "novel": pa.array([], pa.int64())})
        ids = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        gmin = np.minimum.reduceat(ids, starts[:-1])
        order = np.lexsort((ids, gidx))
        gg, dd = gidx[order], ids[order]
        new = np.empty(len(gg), dtype=bool)
        new[0] = True
        new[1:] = (gg[1:] != gg[:-1]) | (dd[1:] != dd[:-1])
        docs_ = dd[new]
        novel = (docs_ == gmin[gg[new]]).astype(np.int64)
        return pa.table({"doc_id": pa.array(docs_),
                         "novel": pa.array(novel)})

    flags = grouped_map(sh, ["shingle"], kernel)
    agg = partial_count_sum(flags, ["doc_id"], "novel",
                            count_name="n_shingles", sum_name="n_novel")
    return agg.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": t["n_shingles"].cast(pa.int64()),
            "n_novel": t["n_novel"].cast(pa.int64()),
            "novelty": pc.divide(t["n_novel"].cast(pa.float64()),
                                 t["n_shingles"].cast(pa.float64())),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )


QUERIES_DOCS["novelty_fraction_docs"] = q_novelty_fraction_docs
ORACLE_SQL_DOCS["novelty_fraction_docs"] = """
    WITH lt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(l) - 3),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                         l[i+3] || ' ' || l[i+4])) AS s
      FROM lt WHERE len(l) >= 5),
    mn AS (SELECT s, MIN(doc_id) AS md FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE sh.doc_id = mn.md) AS BIGINT)
             AS n_novel,
           CAST(COUNT(*) FILTER (WHERE sh.doc_id = mn.md) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM sh JOIN mn ON mn.s = sh.s
    GROUP BY sh.doc_id
"""


def q_lang_agreement_docs(sf_dir: str):
    """Declared-vs-detected language confusion matrix — counts by
    (declared lang column, stopword-argmax detection): the metadata-trust
    audit that says whether the ingest feed's language labels can be used
    for routing or must be re-derived.  Detection is the established
    `add_lang_id` scan; the matrix is one map-side-combined exchange over
    the bounded langs x langs grid, with per-declared-language agreement
    rates as one float division each."""
    from feast_ray.stages.stats import partial_count_sum
    from feast_ray.stages.text import add_lang_id

    ds = add_lang_id(_docs(sf_dir, columns=("doc_id", "text", "lang")))
    cnt = partial_count_sum(
        ds.select_columns(["lang", "lang_pred"]),
        ["lang", "lang_pred"], count_name="n",
    ).take_all()  # bounded: langs x (langs + 'und')
    import pandas as pd

    cdf = pd.DataFrame(cnt).sort_values(["lang", "lang_pred"]).reset_index(
        drop=True)
    tot = cdf.groupby("lang")["n"].transform("sum")
    agree = (cdf["lang"] == cdf["lang_pred"])
    return pa.table({
        "lang_declared": pa.array(cdf["lang"], pa.string()),
        "lang_detected": pa.array(cdf["lang_pred"], pa.string()),
        "n_docs": pa.array(cdf["n"].to_numpy(), pa.int64()),
        "share_of_declared": pc.divide(
            pc.cast(pa.array(cdf["n"].to_numpy()), pa.float64()),
            pc.cast(pa.array(tot.to_numpy()), pa.float64())),
    })


QUERIES_DOCS["lang_agreement_docs"] = q_lang_agreement_docs
ORACLE_SQL_DOCS["lang_agreement_docs"] = f"""
    WITH det AS ({_lang_sql()}),
    j AS (
      SELECT d.lang AS lang_declared, det.lang_pred AS lang_detected
      FROM documents d JOIN det USING (doc_id)),
    c AS (SELECT lang_declared, lang_detected,
                 CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM j GROUP BY 1, 2),
    t AS (SELECT lang_declared, CAST(SUM(n_docs) AS BIGINT) AS nt
          FROM c GROUP BY 1)
    SELECT c.lang_declared, c.lang_detected, c.n_docs,
           CAST(c.n_docs AS DOUBLE) / CAST(t.nt AS DOUBLE)
             AS share_of_declared
    FROM c JOIN t USING (lang_declared)
"""


def q_avi_decode_docs(sf_dir: str):
    """REAL video decode (no video library): each doc gets a deterministic
    uncompressed-DIB AVI — a genuine RIFF tree (hdrl/strl/movi/idx1) with
    bottom-up padded BGR frames — with n_frames = doc_id%4+2 frames of
    width doc_id%11+1 x height doc_id%7+1 at fps 10+doc_id%5, where frame
    f's logical top-down RGB byte k is (doc_id*13 + f*97 + k*5)%256.  The
    actor-pool decoder walks the nested RIFF chunks, recovers fps from
    strh dwRate/dwScale and dims from strf, decodes every sampled frame
    (stride 2, max 5) and emits exact per-frame pixel moments.  The DuckDB
    twin re-derives every sampled pixel with generate_series — identical
    integer-sum moment arithmetic, bit-equal doubles."""
    from feast_ray.stages.multimodal import add_video_frame_features, attach_avi_payloads

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        attach_avi_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_video_frame_features(
        ds, id_cols=("doc_id",), stride=2, max_frames=5, mode="avi",
        concurrency=4, batch_size=32,
    )
    return out.select_columns(
        ["doc_id", "frame_idx", "n_frames", "fps", "width", "height",
         "frame_mean", "frame_std"]
    )


QUERIES_DOCS["avi_decode_docs"] = q_avi_decode_docs
ORACLE_SQL_DOCS["avi_decode_docs"] = """
    WITH dims AS (
      SELECT doc_id, doc_id % 11 + 1 AS w, doc_id % 7 + 1 AS h,
             doc_id % 4 + 2 AS nf, 10 + doc_id % 5 AS fps
      FROM documents),
    samp AS (
      SELECT doc_id, w, h, nf, fps, CAST((u.i - 1) * 2 AS BIGINT) AS frame_idx
      FROM dims,
           unnest(generate_series(1, CAST(LEAST((nf + 1) // 2, 5) AS INTEGER))) AS u(i)),
    px AS (
      SELECT doc_id, frame_idx,
             (doc_id * 13 + frame_idx * 97 + u.k * 5) % 256 AS b
      FROM samp, unnest(generate_series(0, w * h * 3 - 1)) AS u(k)),
    s AS (
      SELECT doc_id, frame_idx, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(b) AS DOUBLE) AS sb, CAST(sum(b * b) AS DOUBLE) AS sq
      FROM px GROUP BY doc_id, frame_idx)
    SELECT d.doc_id, s.frame_idx,
           CAST(d.nf AS BIGINT) AS n_frames,
           CAST(d.fps AS INTEGER) AS fps,
           CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height,
           s.sb / s.n AS frame_mean,
           SQRT(GREATEST(s.sq / s.n - (s.sb / s.n) * (s.sb / s.n), 0.0))
             AS frame_std
    FROM dims d JOIN s USING (doc_id)
"""
