"""token_count_topk: exact corpus top-k vs a pure-Python Counter oracle."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.text import token_count_topk


@pytest.fixture()
def corpus(ray_session):
    texts = [
        "the quick brown fox JUMPS over the lazy dog",
        "the dog! the dog? THE DOG.",
        "",
        None,
        "fox 42 fox 42 42 aaa-bbb ccc_ddd",  # '_' splits: ccc, ddd
        "zzz " * 7,
    ]
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def _oracle(texts, k):
    c = Counter()
    for t in texts:
        if t:
            c.update(tok for tok in re.split(r"[^a-z0-9]+", t.lower()) if tok)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_topk_matches_counter(corpus):
    got = token_count_topk(
        rd.from_pandas(corpus), k=5, num_buckets=3
    ).to_pandas()
    want = _oracle(corpus["text"], 5)
    assert list(zip(got["token"], got["cnt"])) == want
    # deterministic tie-break: token ascending within equal counts
    assert got["cnt"].is_monotonic_decreasing


def test_k_larger_than_vocab(corpus):
    got = token_count_topk(rd.from_pandas(corpus), k=1000).to_pandas()
    want = _oracle(corpus["text"], 1000)
    assert list(zip(got["token"], got["cnt"])) == want


def test_tfidf_top_term_matches_python(corpus):
    import math
    from feast_ray.stages.text import tfidf_top_term

    n_docs = len(corpus)
    # python oracle
    tf: dict[tuple[int, str], int] = {}
    df = Counter()
    for _, row in corpus.iterrows():
        toks = [t for t in re.split(r"[^a-z0-9]+", (row["text"] or "").lower()) if t]
        for t in toks:
            tf[(row["doc_id"], t)] = tf.get((row["doc_id"], t), 0) + 1
        df.update(set(toks))
    want = {}
    for (d, t), f in tf.items():
        score = f * math.log(n_docs / df[t])
        cur = want.get(d)
        if cur is None or score > cur[0] or (score == cur[0] and t < cur[1]):
            want[d] = (score, t, f, df[t])
    got = tfidf_top_term(
        rd.from_pandas(corpus), n_docs=n_docs, num_buckets=3
    ).to_pandas().set_index("doc_id")
    assert set(got.index) == set(want)
    for d, (_, t, f, dfv) in want.items():
        assert got.loc[d, "top_token"] == t
        assert got.loc[d, "tf"] == f
        assert got.loc[d, "df"] == dfv


def test_repetition_signals_match_counter(corpus):
    from feast_ray.stages.text import add_repetition

    out = (
        add_repetition(rd.from_pandas(corpus))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        text = corpus["text"].iloc[int(row["doc_id"])]
        toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
        bigrams = list(zip(toks, toks[1:]))
        c = Counter(toks)
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct_tokens"] == len(c)
        assert row["top_tok_cnt"] == (max(c.values()) if c else 0)
        assert row["n_bigrams"] == max(len(toks) - 1, 0)
        assert row["n_distinct_bigrams"] == len(set(bigrams))


def test_redaction_matches_python(corpus):
    from feast_ray.stages.text import add_redaction

    out = (
        add_redaction(rd.from_pandas(corpus), pattern=r"\b(dog|fox)\b")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        text = corpus["text"].iloc[int(row["doc_id"])]
        if text is None:
            assert row["text_clean"] is None and row["n_redacted"] == 0
            continue
        want = re.sub(r"\b(dog|fox)\b", "[REDACTED]", text)
        assert row["text_clean"] == want
        assert row["n_redacted"] == len(re.findall(r"\b(dog|fox)\b", text))
    assert out["n_redacted"].sum() > 0


def test_chunk_texts_matches_python(ray_session):
    from feast_ray.stages.text import chunk_texts

    texts = [
        "The quick brown fox jumps over the lazy dog again and again and again",
        "",
        "   \t  ",
        "!!! ??? ...",
        "one",
        "a b c d e f g h",  # exactly one chunk at size 8
        " ".join(f"tok{i}" for i in range(25)),  # multi-chunk with overlap
        None,
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    size, stride = 8, 5
    out = (
        chunk_texts(rd.from_pandas(df), chunk_tokens=size, stride_tokens=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    want = []
    for did, txt in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", (txt or "").lower()) if w]
        m = len(toks)
        if m == 0:
            continue
        n_chunks = 1 if m <= size else 1 + -(-(m - size) // stride)
        for k in range(n_chunks):
            w = toks[k * stride : min(k * stride + size, m)]
            want.append((did, k, " ".join(w), len(w)))
    assert list(map(tuple, out.itertuples(index=False))) == want
    # last window reaches the end of every doc
    last = out.groupby("doc_id").tail(1)
    for _, r in last.iterrows():
        toks = [w for w in re.split(r"[^a-z0-9]+", (texts[r["doc_id"]] or "").lower()) if w]
        assert r["chunk_text"].split(" ")[-1] == toks[-1]
    with pytest.raises(ValueError):
        chunk_texts(rd.from_pandas(df), chunk_tokens=0, stride_tokens=5)


def test_cooccurrence_topk_matches_python(ray_session):
    from itertools import combinations

    from feast_ray.stages.text import cooccurrence_topk

    texts = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog and a cat",
        "fish and chips and fish",
        "",
        None,
        "cat cat cat",  # distinctness: counts docs, not occurrences
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        cooccurrence_topk(rd.from_pandas(df), k=10)
        .to_pandas()
        .sort_values(["n_ab", "tok_a", "tok_b"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    pair_n, df_n = Counter(), Counter()
    for txt in texts:
        toks = sorted({w for w in re.split(r"[^a-z0-9]+", (txt or "").lower()) if w})
        df_n.update(toks)
        pair_n.update(combinations(toks, 2))
    want = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(out) == len(want)
    for i, ((a, b), n) in enumerate(want):
        r = out.iloc[i]
        assert (r["tok_a"], r["tok_b"], r["n_ab"]) == (a, b, n)
        assert r["df_a"] == df_n[a] and r["df_b"] == df_n[b]
    # max_doc_tokens=4 drops docs with 5+ distinct tokens from PAIR
    # generation (marginal dfs still count every doc)
    out2 = (
        cooccurrence_topk(rd.from_pandas(df), k=100, max_doc_tokens=4)
        .to_pandas()
        .sort_values(["n_ab", "tok_a", "tok_b"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    pair_n2 = Counter()
    for txt in texts:
        toks = sorted({w for w in re.split(r"[^a-z0-9]+", (txt or "").lower()) if w})
        if len(toks) <= 4:
            pair_n2.update(combinations(toks, 2))
    want2 = sorted(pair_n2.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["tok_a"], r["tok_b"], r["n_ab"]) for _, r in out2.iterrows()] == [
        (a, b, n) for (a, b), n in want2
    ]
