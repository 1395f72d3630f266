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
