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
