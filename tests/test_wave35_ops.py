"""Round-4 wave-35: forward-novelty fraction vs a brute-force oracle."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
    n = len(texts)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )


def _shingles(txt, w=5):
    toks = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
    return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def test_novelty_fraction_matches_brute(ray_session, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        base,                               # doc 0: all novel
        base,                               # doc 1: exact copy -> 0 novel
        base + " iota kappa lambda mu nu",  # doc 2: suffix novel only
        "one two three four five six",      # doc 3: fully novel
        "tiny",                              # doc 4: < 5 tokens -> absent
    ]
    _write_docs(tmp_path, texts)
    from feast_ray.pipelines.queries_docs import q_novelty_fraction_docs

    out = (q_novelty_fraction_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # brute force: first-seen doc per shingle
    first = {}
    for i, txt in enumerate(texts):
        for s in sorted(_shingles(txt)):
            first.setdefault(s, i)
    for i, txt in enumerate(texts):
        sh = _shingles(txt)
        if not sh:
            assert i not in out.index
            continue
        novel = sum(1 for s in sh if first[s] == i)
        assert out.loc[i, "n_shingles"] == len(sh)
        assert out.loc[i, "n_novel"] == novel
        assert out.loc[i, "novelty"] == pytest.approx(novel / len(sh))
    assert out.loc[0, "novelty"] == 1.0
    assert out.loc[1, "novelty"] == 0.0
    assert 0.0 < out.loc[2, "novelty"] < 1.0
