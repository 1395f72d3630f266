"""Text-analysis, dedup, similarity, and multimodal stages vs independent
pure-Python oracles (SURVEY §5.2 pattern: golden = small independent
reimplementation, not stored files)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def docs_ds(ray_session, docs_tbl):
    import ray.data as rd

    return rd.from_arrow(docs_tbl).repartition(4)


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def _fp_oracle(s: str, k: int = 8):
    b = s.encode("utf8")
    if len(b) < k:
        return 0, None, None
    hs = []
    for i in range(len(b) - k + 1):
        h = 0
        for j in range(k):
            h = (h * 1_000_003 + b[i + j]) % (1 << 64)
        hs.append(h)
    x = 0
    for h in hs:
        x ^= h
    return len(hs), min(hs), x


def test_fingerprint_matches_oracle(ray_session, docs_ds, docs_tbl):
    from feast_ray.stages.text import add_fingerprints

    got = add_fingerprints(docs_ds).to_pandas().set_index("doc_id").sort_index()
    texts = dict(
        zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())
    )
    # spot-check a deterministic sample (pure-python oracle is O(len*k))
    for doc_id in sorted(texts)[:40]:
        c, mn, xr = _fp_oracle(texts[doc_id])
        row = got.loc[doc_id]
        assert row["fp_count"] == c
        assert np.uint64(row["fp_min"]) == np.uint64(mn)
        assert np.uint64(row["fp_xor"]) == np.uint64(xr)


def test_fingerprint_edge_cases():
    from feast_ray.stages.text import fingerprint_batch

    tbl = pa.table({"doc_id": [0, 1, 2, 3], "text": ["", "short", "x" * 8, "the quick brown fox"]})
    out = fingerprint_batch(tbl).to_pydict()
    assert out["fp_count"] == [0, 0, 1, 12]
    assert out["fp_min"][0] is None and out["fp_min"][1] is None
    assert out["fp_min"][2] is not None


# ---------------------------------------------------------------------------
# jaccard / minhash
# ---------------------------------------------------------------------------


def _jaccard_oracle(texts: dict[int, str], k: int, tau: float):
    grams = {d: {t[i : i + k] for i in range(len(t) - k + 1)} for d, t in texts.items()}
    out = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, gb = grams[a], grams[b]
            if not ga and not gb:
                continue
            inter = len(ga & gb)
            if inter == 0:
                continue
            j = inter / (len(ga) + len(gb) - inter)
            if j >= tau:
                out.append((a, b, j))
    return out


def test_jaccard_pairs_match_bruteforce(ray_session, docs_ds, docs_tbl):
    from feast_ray.stages.dedup import jaccard_pair_pipeline

    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    want = _jaccard_oracle(texts, 20, 0.2)
    got = (
        jaccard_pair_pipeline(docs_ds, k=20, tau=0.2)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == [(a, b) for a, b, _ in want]
    assert np.allclose(got["jaccard"], [j for _, _, j in want], atol=1e-6)


def test_minhash_pairs_equal_exact_on_testdata(ray_session, docs_ds, docs_tbl):
    """LSH recall on the fixed dataset is 100% (verified) and verification is
    exact, so minhash pairs == exact pairs at tau=0.5."""
    from feast_ray.stages.dedup import minhash_pair_pipeline

    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    want = [(a, b) for a, b, j in _jaccard_oracle(texts, 20, 0.5)]
    got = (
        minhash_pair_pipeline(docs_ds, k=20, tau=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == want


def test_minhash_dedup_rule(ray_session, docs_ds, docs_tbl):
    from feast_ray.stages.dedup import minhash_dedup_pipeline

    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    dropped = {b for _, b, _ in _jaccard_oracle(texts, 20, 0.5)}
    got = set(minhash_dedup_pipeline(docs_ds, tau=0.5, k=20).to_pandas()["doc_id"])
    assert got == set(texts) - dropped


def test_minhash_signature_estimates_jaccard():
    """Property: signature agreement approximates true Jaccard."""
    from feast_ray.stages.dedup import MinHasher, distinct_gram_hashes

    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("abcdefgh "), 400))
    variant = base[:200] + "XYZ" + base[200:]  # high overlap
    other = "".join(rng.choice(list("abcdefgh "), 400))
    texts = pa.array([base, variant, other])
    ids = np.arange(3, dtype=np.int64)
    d, g = distinct_gram_hashes(texts, ids, 8)
    hasher = MinHasher(num_perm=256, seed=5)
    uniq, sig = hasher.signatures(d, g)
    est_close = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    assert est_close > 0.8 and est_far < 0.2


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def test_simhash_pairs_match_bruteforce(ray_session, docs_ds, docs_tbl):
    from feast_ray.stages.dedup import _popcount64, simhash64, simhash_pair_pipeline

    sigs = simhash64(docs_tbl["text"].combine_chunks())
    ids = docs_tbl["doc_id"].to_numpy()
    hd = _popcount64(sigs[:, None] ^ sigs[None, :])
    ii, jj = np.nonzero((hd <= 3) & (ids[:, None] < ids[None, :]))
    want = sorted(zip(ids[ii].tolist(), ids[jj].tolist()))
    got = (
        simhash_pair_pipeline(docs_ds)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == want
    gm = {(r.doc_a, r.doc_b): r.hamming for r in got.itertuples()}
    for (a, b), h in gm.items():
        ia, ib = int(np.flatnonzero(ids == a)[0]), int(np.flatnonzero(ids == b)[0])
        assert h == hd[ia, ib]


def test_simhash_identical_and_disjoint():
    from feast_ray.stages.dedup import simhash64

    sigs = simhash64(pa.array(["alpha beta gamma", "alpha beta gamma", "delta epsilon zeta"]))
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


# ---------------------------------------------------------------------------
# text quality / lang id
# ---------------------------------------------------------------------------


def test_quality_and_lang_oracle_rows():
    import re

    from feast_ray.stages.text import LANG_STOPWORDS, lang_id_batch, text_quality_batch

    texts = ["The cat sat on the mat.", "der hund und die katze", "", "12345 !!!"]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    q = text_quality_batch(tbl).to_pydict()
    for i, t in enumerate(texts):
        low = t.lower()
        n_tok = len(re.findall(r"[a-z0-9_]+", low))
        assert q["n_tokens"][i] == n_tok
        assert q["n_chars"][i] == len(t)
        if len(t):
            assert abs(q["alpha_ratio"][i] - len(re.findall(r"[A-Za-z]", t)) / len(t)) < 1e-12
    l = lang_id_batch(tbl).to_pydict()
    assert l["lang_pred"][0] == "en"
    assert l["lang_pred"][1] == "de"
    assert l["lang_pred"][2] == "und"
    assert l["lang_pred"][3] == "und"


def test_lang_id_ds(ray_session, docs_ds):
    from feast_ray.stages.text import add_lang_id

    out = add_lang_id(docs_ds).to_pandas()
    assert set(out["lang_pred"]) <= {"de", "en", "es", "fr", "zh", "und"}
    assert (out["lang_score"] >= 0).all()


# ---------------------------------------------------------------------------
# embeddings: near-dup pairs + LSH ANN recall
# ---------------------------------------------------------------------------


def test_embedding_pairs_bruteforce(ray_session):
    import ray.data as rd

    from feast_ray.stages.dedup import embedding_pair_pipeline

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cs = nm @ nm.T
    ii, jj = np.nonzero((cs >= 0.4) & (ids[:, None] < ids[None, :]))
    want = sorted(zip(ids[ii].tolist(), ids[jj].tolist()))
    got = (
        embedding_pair_pipeline(rd.from_arrow(tbl).repartition(4), tau=0.4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == want


def test_lsh_topk_recall(ray_session):
    """LSH ANN must recover a decent fraction of the exact top-10 (bucket
    pruning with 4 planes keeps ~1/16 of the corpus)."""
    import ray.data as rd

    from feast_ray.stages.similarity import brute_force_topk, lsh_bucket_topk

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = rd.from_arrow(tbl).repartition(4)
    qvec = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    exact = set(brute_force_topk(ds, qvec, k=10, exclude_ids=(0,)).to_pandas()["vec_id"])
    approx = set(
        lsh_bucket_topk(ds, qvec, k=10, exclude_ids=(0,), n_planes=4).to_pandas()["vec_id"]
    )
    assert len(approx) > 0
    assert len(exact & approx) / 10 >= 0.3  # bucket pruning trade-off, pinned


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_actor_stage(ray_session, docs_ds, docs_tbl):
    from feast_ray.stages.multimodal import add_media_features, attach_fake_payloads

    ds = docs_ds.map_batches(attach_fake_payloads, batch_format="pyarrow", zero_copy_batch=True)
    out = add_media_features(ds, id_cols=("doc_id",), concurrency=2, batch_size=64).to_pandas()
    assert len(out) == docs_tbl.num_rows
    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    out = out.set_index("doc_id").sort_index()
    for doc_id in sorted(texts)[:20]:
        b = texts[doc_id].encode("utf8")
        row = out.loc[doc_id]
        assert row["n_bytes"] == len(b)
        assert row["width"] == len(b) % 640 + 1
        arr = np.frombuffer(b, dtype=np.uint8).astype(float)
        assert abs(row["byte_mean"] - arr.mean()) < 1e-9
        assert abs(row["byte_std"] - arr.std()) < 1e-9


def test_image_codecs_roundtrip():
    """Dependency-free BMP/PPM codecs: exact pixel recovery, including BMP
    row padding, bottom-up AND top-down layouts, and PPM comment headers."""
    import struct

    from feast_ray.stages.multimodal import (
        decode_bmp, decode_image, decode_ppm, encode_bmp, encode_ppm)

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (23, 37), (8, 2)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for enc, dec in ((encode_bmp, decode_bmp), (encode_ppm, decode_ppm)):
            w2, h2, px2 = dec(enc(px))
            assert (w2, h2) == (w, h) and (px2 == px).all()
        assert decode_image(encode_bmp(px))[2].shape == (h, w, 3)
    # top-down BMP (negative height in the DIB header)
    px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    stride = (3 * 5 + 3) & ~3
    rows = np.zeros((4, stride), np.uint8)
    rows[:, :15] = px[:, :, ::-1].reshape(4, 15)
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, 5, -4, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    buf = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + dib + data
    w2, h2, px2 = decode_bmp(buf)
    assert (w2, h2) == (5, 4) and (px2 == px).all()
    # PPM with a comment line in the header
    w2, h2, px2 = decode_ppm(b"P6\n# a comment\n5 4\n255\n" + px.tobytes())
    assert (w2, h2) == (5, 4) and (px2 == px).all()
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")


def test_wav_codec_roundtrip():
    import struct

    from feast_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(8)
    for n in (1, 100, 499):
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        r, c, s2 = decode_wav(encode_wav(s, sample_rate=44100))
        assert r == 44100 and c == 1 and (s2 == s).all()
    # extra chunk before data is skipped by the chunk walk
    buf = encode_wav(np.array([1, -2, 3], np.int16))
    buf = buf[:12] + b"LIST" + struct.pack("<I", 5) + b"INFOX\x00" + buf[12:]
    assert decode_wav(buf)[2].tolist() == [1, -2, 3]
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI ")


def test_media_decode_actor_stage(ray_session, docs_ds, docs_tbl):
    """Real BMP decode on the actor pool: header width/height + exact pixel
    moments vs the generator's closed form."""
    from feast_ray.stages.multimodal import add_media_features, attach_bmp_payloads

    ds = docs_ds.map_batches(
        attach_bmp_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_media_features(
        ds, id_cols=("doc_id",), mode="decode", concurrency=2, batch_size=64
    ).to_pandas().set_index("doc_id").sort_index()
    assert len(out) == docs_tbl.num_rows
    for doc_id in sorted(out.index[:20]):
        w, h, v = doc_id % 37 + 1, doc_id % 23 + 1, doc_id % 256
        k = np.arange(w * h * 3, dtype=np.int64)
        b = ((v + k) % 256).astype(np.float64)
        row = out.loc[doc_id]
        assert row["width"] == w and row["height"] == h
        assert row["n_bytes"] == 54 + h * ((3 * w + 3) & ~3)
        m = b.sum() / b.size
        assert row["byte_mean"] == m
        assert row["byte_std"] == np.sqrt(max((b * b).sum() / b.size - m * m, 0.0))


def test_audio_decode_actor_stage(ray_session, docs_ds, docs_tbl):
    """Real WAV decode on the actor pool: RIFF chunk walk + exact sample
    moments vs the generator's closed form."""
    from feast_ray.stages.multimodal import add_audio_features, attach_wav_payloads

    ds = docs_ds.map_batches(
        attach_wav_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_audio_features(
        ds, id_cols=("doc_id",), concurrency=2, batch_size=64
    ).to_pandas().set_index("doc_id").sort_index()
    assert len(out) == docs_tbl.num_rows
    for doc_id in sorted(out.index[:20]):
        n = doc_id % 400 + 100
        i = np.arange(n, dtype=np.int64)
        s = ((doc_id * 31 + i * 7) % 65536 - 32768).astype(np.float64)
        row = out.loc[doc_id]
        assert row["sample_rate"] == 8000 and row["n_channels"] == 1
        assert row["n_samples"] == n
        m = s.sum() / n
        assert row["amp_mean"] == m
        assert row["amp_std"] == np.sqrt(max((s * s).sum() / n - m * m, 0.0))
        assert row["duration_s"] == n / 8000.0


def test_jaccard_max_df_cap_contract(ray_session):
    """Pin the max_df cap semantics (the documented 100-TB boilerplate
    guard): grams shared by MORE than max_df docs are dropped at pair
    generation, so inter = |shared grams with df <= max_df| while the
    per-doc sizes stay the UNCAPPED full distinct-gram counts.  Capping
    changes answers by design — this is the capped contract, verified
    against a brute-force python twin, including a boilerplate-only pair
    that must vanish entirely."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.dedup import jaccard_pair_pipeline

    k, tau, max_df = 8, 0.25, 5
    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES AND OFFERS! "
    rng = np.random.default_rng(3)

    def rand_text(n):
        return "".join(rng.choice(list("abcdefghij xyz"), n))

    texts = {}
    # 8 docs dominated by shared boilerplate (df=8 > max_df) + unique tails
    for d in range(8):
        texts[d] = boiler * 3 + rand_text(40)
    # one genuinely-similar low-df pair
    base = rand_text(120)
    texts[8] = base
    texts[9] = base[:100] + rand_text(20)
    tbl = pa.table(
        {"doc_id": pa.array(sorted(texts), pa.int64()),
         "text": pa.array([texts[d] for d in sorted(texts)])}
    )
    got = (
        jaccard_pair_pipeline(
            rd.from_arrow(tbl).repartition(3), k=k, tau=tau, max_df=max_df
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    # brute-force twin of the capped contract
    gsets = {d: {t[i : i + k] for i in range(len(t) - k + 1)}
             for d, t in texts.items()}
    df = {}
    for s in gsets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    want = []
    for a, b in itertools.combinations(sorted(texts), 2):
        inter = sum(1 for g in gsets[a] & gsets[b] if df[g] <= max_df)
        if inter == 0:
            continue  # capped pairs are never even generated
        j = inter / (len(gsets[a]) + len(gsets[b]) - inter)
        if j >= tau:
            want.append((a, b, j))
    want_df = (
        pd.DataFrame(want, columns=["doc_a", "doc_b", "jaccard"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # the boilerplate block must NOT pair up under the cap...
    assert not ((want_df.doc_a < 8) & (want_df.doc_b < 8)).any()
    # ...while the genuine low-df pair survives
    assert ((want_df.doc_a == 8) & (want_df.doc_b == 9)).any()
    assert got[["doc_a", "doc_b"]].values.tolist() == want_df[["doc_a", "doc_b"]].values.tolist()
    assert np.allclose(got["jaccard"], want_df["jaccard"])

    # sanity: UNCAPPED, the boilerplate block pairs up densely
    uncapped = jaccard_pair_pipeline(
        rd.from_arrow(tbl).repartition(3), k=k, tau=tau
    ).to_pandas()
    assert ((uncapped.doc_a < 8) & (uncapped.doc_b < 8)).sum() == 28


def test_cooccurrence_max_doc_tokens_cap_contract(ray_session):
    """Pin the max_doc_tokens cap semantics: a doc with more distinct
    tokens than the cap is dropped from PAIR generation (n_ab) but still
    counts in the df marginals — the scale guard changes collocation
    counts by exactly that rule."""
    import ray.data as rd

    from feast_ray.stages.text import cooccurrence_topk

    docs = {
        0: "alpha beta",            # 2 tokens: pairs
        1: "alpha beta",            # same pair again
        2: "alpha beta gamma delta epsilon zeta",  # 6 distinct > cap: no pairs
        3: "alpha gamma",
    }
    tbl = pa.table(
        {"doc_id": pa.array(sorted(docs), pa.int64()),
         "text": pa.array([docs[d] for d in sorted(docs)])}
    )
    out = cooccurrence_topk(
        rd.from_arrow(tbl).repartition(2), k=10, max_doc_tokens=5
    ).to_pandas().set_index(["tok_a", "tok_b"])
    # (alpha, beta) co-occurs in docs 0,1 only — doc 2 is capped out
    assert out.loc[("alpha", "beta"), "n_ab"] == 2
    # (alpha, gamma) from doc 3 only (doc 2 capped)
    assert out.loc[("alpha", "gamma"), "n_ab"] == 1
    # marginals stay UNCAPPED: alpha appears in all 4 docs, beta in 3
    assert out.loc[("alpha", "beta"), "df_a"] == 4
    assert out.loc[("alpha", "beta"), "df_b"] == 3
    # no pair sourced from the capped doc alone survives
    assert ("delta", "epsilon") not in out.index


def test_embedding_broadcast_byte_ceiling(ray_session, monkeypatch):
    """Broadcast mode is a small-corpus opt-in: past the byte ceiling it must
    refuse with a pointer to blockpair rather than driver-materialize."""
    import ray.data as rd

    from feast_ray.stages import dedup as dd

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = rd.from_arrow(tbl).repartition(2).materialize()
    monkeypatch.setattr(dd, "_BROADCAST_BYTE_CEILING", 1)
    with pytest.raises(ValueError, match="blockpair"):
        dd._embedding_pairs_broadcast(
            ds, id_col="vec_id", emb_col="embedding", tau=0.4, round_digits=6
        )


def test_pil_mode_falls_back_to_builtin_decoder():
    """mode='pil' uses Pillow when present and the built-in codecs when not
    — it never raises for the formats the engine's fixtures emit."""
    from feast_ray.stages.multimodal import MediaFeatureExtractor, encode_bmp

    ext = MediaFeatureExtractor(mode="pil", id_cols=("doc_id",))
    px = np.full((2, 3, 3), 9, dtype=np.uint8)
    tbl = pa.table({"doc_id": [1], "payload": pa.array([encode_bmp(px)], pa.binary())})
    out = ext(tbl).to_pydict()
    assert out["width"] == [3] and out["height"] == [2]
    assert out["byte_mean"] == [9.0] and out["byte_std"] == [0.0]


def test_ivf_topk_recall(ray_session):
    """IVF with nprobe=4/16 must recover most of the exact top-10 (the
    query's own cluster plus 3 neighbors usually hold the near vectors)."""
    import ray.data as rd

    from feast_ray.stages.similarity import IvfIndex, brute_force_topk, ivf_topk

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = rd.from_arrow(tbl).repartition(4)
    qvec = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    exact = set(brute_force_topk(ds, qvec, k=10, exclude_ids=(0,)).to_pandas()["vec_id"])
    approx = set(ivf_topk(ds, qvec, k=10, exclude_ids=(0,), nlist=16, nprobe=4).to_pandas()["vec_id"])
    assert len(approx) == 10
    assert len(exact & approx) / 10 >= 0.5


def test_ivf_assign_deterministic():
    from feast_ray.stages.similarity import IvfIndex

    rng = np.random.default_rng(1)
    data = rng.normal(size=(300, 8))
    a = IvfIndex(nlist=8, seed=5).fit(data).assign(data)
    b = IvfIndex(nlist=8, seed=5).fit(data).assign(data)
    assert (a == b).all()
    assert len(np.unique(a)) > 1


def test_embedding_pair_modes_agree(ray_session):
    """blockpair (exact, distributed) == broadcast (exact, small-corpus);
    lsh is a subset with exact precision and decent recall."""
    import ray.data as rd

    from feast_ray.stages.dedup import embedding_pair_pipeline

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    # plant near-duplicates: 10 vectors are noisy copies of earlier ones
    emb = np.vstack([base, base[:10] + rng.normal(scale=0.05, size=(10, 16))])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(emb), dtype=np.int64)),
            "embedding": pa.array(list(emb.astype(np.float32))),
        }
    )
    ds = rd.from_arrow(tbl)
    kw = dict(tau=0.8, num_buckets=4)
    exact = embedding_pair_pipeline(ds, mode="blockpair", n_chunks=3, **kw).to_pandas()
    bc = embedding_pair_pipeline(ds, mode="broadcast", tau=0.8).to_pandas()
    key = lambda df: set(zip(df.doc_a, df.doc_b))
    assert key(exact) == key(bc) and len(exact) >= 10
    lsh = embedding_pair_pipeline(ds, mode="lsh", **kw).to_pandas()
    assert key(lsh) <= key(exact)  # exact precision
    assert len(lsh) >= 0.5 * len(exact)  # documented recall on near-dups


def test_frame_sampler_means(ray_session, docs_ds, docs_tbl):
    """Frame walk + per-frame byte means vs a direct numpy oracle."""
    from feast_ray.stages.multimodal import add_frame_samples, attach_fake_payloads

    ds = docs_ds.map_batches(
        attach_fake_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    got = add_frame_samples(
        ds, id_cols=("doc_id",), frame_bytes=64, stride=2, max_frames=4,
        concurrency=2, batch_size=32,
    ).to_pandas().sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    texts = {i: t for i, t in zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())}
    want = []
    for did, text in texts.items():
        raw = text.encode("utf-8")
        n_full = len(raw) // 64
        idxs = list(range(0, n_full, 2))[:4]
        for fi in idxs:
            seg = raw[fi * 64 : fi * 64 + 64]
            want.append((did, fi, fi * 64, np.frombuffer(seg, np.uint8).mean()))
    want.sort()
    assert len(got) == len(want)
    for (r, (did, fi, off, mean)) in zip(got.itertuples(), want):
        assert (r.doc_id, r.frame_idx, r.frame_off) == (did, fi, off)
        assert abs(r.frame_mean - mean) < 1e-9


def test_editdist_pairs_bruteforce(ray_session):
    """FastSS blocking + exact verify vs a brute-force Levenshtein oracle
    over adversarial prefixes: substitutions, insertions (front/middle/
    end), an ed-2 transposition that SHARES a deletion variant (must be
    rejected by the verifier), prefix-of relationships, an exact-dup
    cluster, and an empty string."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.editdist import editdist_pairs

    texts = [
        "abcdef",      # 0
        "abcdef",      # 1 exact dup of 0
        "abcdef",      # 2 exact dup of 0
        "abcxef",      # 3 substitution of 0
        "abcdefg",     # 4 trailing insert on 0
        "xabcdef",     # 5 front insert on 0
        "abcqdef",     # 6 middle insert on 0
        "abdcef",      # 7 transposition of 0 (ed 2, shares del variants)
        "abcde",       # 8 deletion of 0's last char
        "zzzzzz",      # 9 unrelated
        "",            # 10 empty
        "a",           # 11 ed 1 from empty
        "ab",          # 12 ed 1 from 11
    ]

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    import pyarrow as _pa

    out = (
        editdist_pairs(
            rd.from_arrow(_pa.Table.from_pandas(df, preserve_index=False)),
            id_col="doc_id", text_col="text", prefix_len=16,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    exp_rows = [
        (a, b, lev(texts[a], texts[b]))
        for a, b in itertools.combinations(range(len(texts)), 2)
        if lev(texts[a], texts[b]) <= 1
    ]
    exp = pd.DataFrame(exp_rows, columns=["doc_a", "doc_b", "edit_dist"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # the transposition must NOT appear
    assert not (((out["doc_a"] == 0) & (out["doc_b"] == 7)).any())


def test_knn_graph_bruteforce_with_ties(ray_session):
    """knn_graph vs per-node brute force, with DUPLICATE embeddings so
    rounded-score ties are real — ties must break to the smaller id at
    both the partial (per chunk pair) and final selection."""
    import pandas as pd
    import pyarrow as _pa
    import ray.data as rd

    from feast_ray.stages.similarity import knn_graph

    rng = np.random.default_rng(23)
    n, d, k = 60, 8, 3
    mat = rng.normal(size=(n, d))
    mat[10] = mat[3]          # exact duplicates across chunks (10%8=2, 3%8=3)
    mat[17] = mat[3]
    mat[25] = mat[9]
    tbl = _pa.table(
        {
            "vec_id": _pa.array(np.arange(n, dtype=np.int64)),
            "embedding": _pa.array(list(mat.astype(np.float32))),
        }
    )
    out = (
        knn_graph(rd.from_arrow(tbl), k=k, n_chunks=4)
        .to_pandas()
        .sort_values(["vec_id", "nbr_rank"])
        .reset_index(drop=True)
    )
    m64 = mat.astype(np.float32).astype(np.float64)
    nm = np.linalg.norm(m64, axis=1)
    cs = np.round((m64 / nm[:, None]) @ (m64 / nm[:, None]).T, 6)
    rows = []
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i), key=lambda j: (-cs[i, j], j)
        )
        for r, j in enumerate(order[:k], start=1):
            rows.append((i, j, cs[i, j], r))
    exp = pd.DataFrame(rows, columns=["vec_id", "nbr_id", "cos_sim", "nbr_rank"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_strip_boilerplate_roundtrip(ray_session):
    """Docs sharing a 32-token boilerplate block lose exactly that block;
    unique docs keep their full normalized text; an all-boilerplate doc
    drops out."""
    import pandas as pd
    import pyarrow as _pa
    import ray.data as rd

    from feast_ray.pipelines.queries_docs import BOILER_DF_MAX  # noqa: F401

    boiler = " ".join(f"b{i}" for i in range(32))
    uniq = [" ".join(f"u{d}x{i}" for i in range(40)) for d in range(4)]
    texts = [boiler + " " + uniq[d] for d in range(3)] + [uniq[3], boiler]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    from feast_ray.pipelines.queries import QUERIES  # registry import side effect

    import feast_ray.pipelines.queries_docs as qd

    # drive the stage composition directly on an in-memory table
    import types

    ds = rd.from_arrow(_pa.Table.from_pandas(df, preserve_index=False))
    orig = qd._docs
    qd._docs = lambda sf_dir, columns=("doc_id", "text"): ds.select_columns(
        list(columns)
    )
    try:
        out = qd.q_strip_boilerplate_docs("ignored").to_pandas()
    finally:
        qd._docs = orig
    out = out.set_index("doc_id")
    # boilerplate block (df=3 > 2) stripped from docs 0-2
    for d in range(3):
        assert out.loc[d, "clean_text"] == uniq[d]
    # unique doc untouched (normalized join equals its own tokens)
    assert out.loc[3, "clean_text"] == uniq[3]
    # all-boilerplate doc vanished
    assert 4 not in out.index


def test_verify_pruning_semijoin_branch_parity(ray_session, monkeypatch):
    """Force the candidate-id semi-join fallback (threshold 0) and assert
    the minhash pair pipeline output is identical to the broadcast path."""
    import pandas as pd
    import pyarrow as _pa
    import ray.data as rd

    import feast_ray.stages.dedup as dd

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [base, base + "extra tail", base.replace("quick", "quack"),
             "completely different text body " * 6, base]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_arrow(_pa.Table.from_pandas(df, preserve_index=False))

    out_bc = (
        dd.minhash_pair_pipeline(ds, k=8, tau=0.3)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    monkeypatch.setattr(dd, "_VERIFY_BROADCAST_MAX_IDS", 0)
    out_sj = (
        dd.minhash_pair_pipeline(ds, k=8, tau=0.3)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert len(out_bc) > 0
    pd.testing.assert_frame_equal(out_bc, out_sj)


def test_knn_graph_lsh_recall(ray_session):
    """Approximate kNN graph: recall of true top-3 edges vs the exact
    blockpair graph on random vectors; precision is exact by construction
    (true cosine, same rounding + tie rule), so every returned edge must
    also appear in the exact graph at the same or better rank."""
    import pandas as pd
    import pyarrow as _pa
    import ray.data as rd

    from feast_ray.stages.similarity import knn_graph, knn_graph_lsh

    rng = np.random.default_rng(47)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = _pa.table(
        {"vec_id": _pa.array(np.arange(n, dtype=np.int64)),
         "embedding": _pa.array(list(mat))}
    )
    ds = rd.from_arrow(tbl)
    exact = knn_graph(ds, k=3, n_chunks=4).to_pandas()
    approx = knn_graph_lsh(ds, k=3, n_planes=4, n_tables=6).to_pandas()
    exact_edges = set(zip(exact["vec_id"], exact["nbr_id"]))
    approx_edges = set(zip(approx["vec_id"], approx["nbr_id"]))
    recall = len(exact_edges & approx_edges) / len(exact_edges)
    assert recall >= 0.6, recall
    # cos_sim values must agree exactly on shared edges (exact verify)
    m = approx.merge(exact, on=["vec_id", "nbr_id"], suffixes=("_a", "_e"))
    assert (m["cos_sim_a"] == m["cos_sim_e"]).all()
    # determinism
    approx2 = knn_graph_lsh(ds, k=3, n_planes=4, n_tables=6).to_pandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["vec_id", "nbr_rank"]).reset_index(drop=True),
        approx2.sort_values(["vec_id", "nbr_rank"]).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# hashed token buckets / LM surprisal / DSIR
# ---------------------------------------------------------------------------


def test_token_bucket_ids_pure_python():
    """Bucket hash vs character-by-character pure-python Horner."""
    from feast_ray.stages.text import token_bucket_ids

    texts = ["Hello, WORLD world", "", None, "a b2  c", "ünïcode tok"]
    row_of, buckets = token_bucket_ids(pa.array(texts), 4096)

    import re

    exp_rows, exp_buckets = [], []
    for i, s in enumerate(texts):
        if s is None:
            continue
        for tok in re.split(r"[^a-z0-9]+", s.lower()):
            if not tok:
                continue
            h = 0
            for c in tok:
                h = (h * 1_000_003 + ord(c)) % (1 << 64)
            exp_rows.append(i)
            exp_buckets.append(h % 4096)
    assert row_of.tolist() == exp_rows
    assert buckets.tolist() == exp_buckets


def test_lm_surprisal_bruteforce(ray_session):
    """Per-doc integer-quantized unigram surprisal vs a dict-based oracle."""
    import re

    from feast_ray.pipelines.queries_docs import q_lm_surprisal_docs

    got = (
        q_lm_surprisal_docs(SF)
        .to_pandas().set_index("doc_id").sort_index()
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        did: [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]
        for did, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    from collections import Counter

    cf = Counter()
    for ts in toks.values():
        cf.update(ts)
    n_total = sum(cf.values())
    blen_n = n_total.bit_length()
    for did, ts in sorted(toks.items()):
        if not ts:
            assert did not in got.index
            continue
        total = sum(blen_n - cf[t].bit_length() for t in ts)
        row = got.loc[did]
        assert row["n_tokens"] == len(ts)
        assert row["total_bits"] == total
        assert row["bits_per_token"] == total / len(ts)


def test_dsir_select_bruteforce(ray_session):
    """DSIR top-k vs a pure-python hashed-unigram importance model."""
    import math
    import re

    from feast_ray.pipelines.queries_docs import (
        DSIR_BUCKETS,
        DSIR_FX,
        DSIR_K,
        DSIR_TARGET_LANG,
        q_dsir_select_docs,
    )

    got = q_dsir_select_docs(SF).to_pandas().reset_index(drop=True)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    cr = [0] * DSIR_BUCKETS
    ct = [0] * DSIR_BUCKETS
    per_doc: dict[int, list[int]] = {}
    for did, s, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(),
        docs["lang"].to_pylist(),
    ):
        bs = []
        for tok in re.split(r"[^a-z0-9]+", (s or "").lower()):
            if not tok:
                continue
            h = 0
            for c in tok:
                h = (h * 1_000_003 + ord(c)) % (1 << 64)
            bs.append(h % DSIR_BUCKETS)
        per_doc[did] = bs
        for b in bs:
            cr[b] += 1
            if lang == DSIR_TARGET_LANG:
                ct[b] += 1
    nr, nt = sum(cr), sum(ct)
    lam_fx = [
        math.floor(
            (math.log((ct[b] + 1) / (nt + DSIR_BUCKETS))
             - math.log((cr[b] + 1) / (nr + DSIR_BUCKETS))) * DSIR_FX + 0.5
        )
        for b in range(DSIR_BUCKETS)
    ]
    scores = {
        did: sum(lam_fx[b] for b in bs)
        for did, bs in per_doc.items() if bs
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:DSIR_K]
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert list(got["score_fx"]) == [s for _, s in want]
    assert (got["log_weight"] == got["score_fx"] / DSIR_FX).all()
    assert list(got["n_tokens"]) == [len(per_doc[d]) for d, _ in want]


# ---------------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters():
    """encode_png cycles filter types 0-4 across rows; decode must invert
    every unfilter path bit-exactly, including 1-pixel edge shapes."""
    from feast_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 2), (5, 3), (6, 40), (19, 29), (1, 7)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, out = decode_png(bytes(encode_png(px)))
        assert (w2, h2) == (w, h)
        assert np.array_equal(out, px)


def test_png_crc_and_magic_guard():
    from feast_ray.stages.multimodal import decode_png, encode_png

    px = np.zeros((3, 3, 3), dtype=np.uint8)
    buf = bytearray(encode_png(px))
    buf[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + bytes(30))


def test_png_decode_actor_stage(ray_session, docs_ds, docs_tbl):
    """Real PNG decode (zlib inflate + unfilter) on the actor pool vs the
    generator's closed pixel form."""
    from feast_ray.stages.multimodal import add_media_features, attach_png_payloads

    ds = docs_ds.map_batches(
        attach_png_payloads, batch_format="pyarrow", zero_copy_batch=True
    )
    out = add_media_features(
        ds, id_cols=("doc_id",), mode="decode", concurrency=2, batch_size=64
    ).to_pandas().set_index("doc_id").sort_index()
    assert len(out) == docs_tbl.num_rows
    for doc_id in sorted(out.index[:20]):
        w, h = doc_id % 29 + 1, doc_id % 19 + 1
        k = np.arange(w * h * 3, dtype=np.int64)
        b = ((doc_id * 7 + k * 3) % 256).astype(np.float64)
        row = out.loc[doc_id]
        assert row["width"] == w and row["height"] == h
        assert row["n_px"] == w * h * 3
        m = b.sum() / b.size
        assert row["byte_mean"] == m
        assert row["byte_std"] == np.sqrt(max((b * b).sum() / b.size - m * m, 0.0))


def test_cross_source_overlap_bruteforce(ray_session):
    """Pair-matrix vs pure-python sets of 20-char shingles per source."""
    from feast_ray.pipelines.queries_docs import JACCARD_K, q_cross_source_overlap

    got = q_cross_source_overlap(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"])
    per_src: dict[str, set] = {}
    for s, src in zip(docs["text"].to_pylist(), docs["source"].to_pylist()):
        g = per_src.setdefault(src, set())
        for i in range(len(s) - JACCARD_K + 1):
            g.add(s[i : i + JACCARD_K])
    want = []
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                want.append(
                    (a, b, shared, shared / min(len(per_src[a]), len(per_src[b])))
                )
    got_t = list(
        got.sort_values(["source_a", "source_b"]).itertuples(index=False, name=None)
    )
    assert got_t == want


def test_lm_bigram_surprisal_bruteforce(ray_session):
    """Bigram conditional bit costs vs a Counter-based oracle with BOS."""
    import re
    from collections import Counter

    from feast_ray.pipelines.queries_docs import q_lm_bigram_surprisal_docs

    got = (
        q_lm_bigram_surprisal_docs(SF)
        .to_pandas().set_index("doc_id").sort_index()
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        did: [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]
        for did, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    bf, ctx = Counter(), Counter()
    for ts in toks.values():
        prev = ""
        for t in ts:
            bf[(prev, t)] += 1
            ctx[prev] += 1
            prev = t
    for did, ts in sorted(toks.items()):
        if not ts:
            assert did not in got.index
            continue
        total, prev = 0, ""
        for t in ts:
            total += ctx[prev].bit_length() - bf[(prev, t)].bit_length()
            prev = t
        row = got.loc[did]
        assert row["n_tokens"] == len(ts)
        assert row["total_bits"] == total
        assert row["bits_per_token"] == total / len(ts)


def test_compression_ratio_exact(ray_session):
    """zlib sizes vs direct stdlib recomputation — bit-exact."""
    import zlib

    from feast_ray.pipelines.queries_docs import q_compression_ratio_docs

    got = (
        q_compression_ratio_docs(SF)
        .to_pandas().set_index("doc_id").sort_index()
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == docs.num_rows
    for did, s in list(
        zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    )[:60]:
        b = (s or "").encode("utf-8")
        row = got.loc[did]
        assert row["n_bytes"] == len(b)
        assert row["n_compressed"] == len(zlib.compress(b, 6))
        assert row["compression_ratio"] == len(b) / len(zlib.compress(b, 6))


def test_bpe_train_matches_pure_python(ray_session):
    """Merge sequence vs a Counter-based reference BPE on word counts:
    same tokenization, same overlap-counting pairs, same (count desc,
    lexical pair) tie rule, same left-to-right non-overlapping apply."""
    import re
    from collections import Counter

    import ray.data as rd

    from feast_ray.pipelines.queries_docs import q_bpe_merges_docs

    got = q_bpe_merges_docs(SF).to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = Counter()
    for s in docs["text"].to_pylist():
        for w in re.split(r"[^a-z0-9]+", (s or "").lower()):
            if w:
                wc[w] += 1
    syms = {w: " ".join(w) for w in wc}
    merges = []
    for rank in range(8):
        pc_ = Counter()
        for w, cnt in wc.items():
            toks = syms[w].split(" ")
            for a, b in zip(toks, toks[1:]):
                pc_[(a, b)] += cnt
        if not pc_:
            break
        (l, r), c = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w in syms:
            syms[w] = (" " + syms[w] + " ").replace(
                f" {l} {r} ", f" {l}{r} "
            ).strip()
    assert list(got.itertuples(index=False, name=None)) == merges
