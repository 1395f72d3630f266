"""Shingle table + decontamination vs a pure-Python set oracle."""

from __future__ import annotations

import re

import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.decontam import decontaminate, shingle_table


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _shingles(text, w):
    toks = _toks(text)
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


@pytest.fixture()
def corpora(ray_session):
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma delta epsilon",  # shares a 3-shingle with eval
                "one two three four five six",  # clean
                "alpha beta gamma delta nothing",  # shares the same 3-shingle
                "",  # empty
            ],
        }
    )
    ev = pd.DataFrame(
        {
            "doc_id": [100],
            "text": ["zzz alpha beta gamma qqq alpha beta gamma delta"],
        }
    )
    return train, ev


def test_shingle_table_matches_python(corpora):
    train, _ = corpora
    got = shingle_table(rd.from_pandas(train), w=3).to_pandas()
    for doc_id, grp in got.groupby("doc_id"):
        text = train.loc[train["doc_id"] == doc_id, "text"].iloc[0]
        toks = _toks(text)
        want = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        assert sorted(grp["shingle"]) == sorted(want)
    # docs shorter than w emit nothing
    assert 4 not in set(got["doc_id"])


def test_decontaminate_matches_python(corpora):
    train, ev = corpora
    out = (
        decontaminate(rd.from_pandas(train), rd.from_pandas(ev), w=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    eval_sh = set().union(*(_shingles(t, 3) for t in ev["text"]))
    want = {}
    for _, row in train.iterrows():
        shared = _shingles(row["text"], 3) & eval_sh
        if shared:
            want[row["doc_id"]] = len(shared)
    assert dict(zip(out["doc_id"], out["n_shared"])) == want
    assert want  # the fixture does produce contamination


def test_crossdoc_shingle_stats_matches_python(corpora, ray_session):
    from feast_ray.stages.decontam import crossdoc_shingle_stats

    train, ev = corpora
    docs = pd.concat([train, ev], ignore_index=True)
    out = (
        crossdoc_shingle_stats(rd.from_pandas(docs), w=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    per_doc = {int(r["doc_id"]): _shingles(r["text"], 3) for _, r in docs.iterrows()}
    from collections import Counter

    owner_count = Counter()
    for sh in per_doc.values():
        for s in sh:
            owner_count[s] += 1
    for _, row in out.iterrows():
        sh = per_doc[int(row["doc_id"])]
        assert row["n_shingles"] == len(sh)
        assert row["n_dup_shingles"] == sum(1 for s in sh if owner_count[s] >= 2)
    # docs with no shingles are absent
    assert set(out["doc_id"]) == {d for d, sh in per_doc.items() if sh}
