"""Round-4 wave-31: hard-negative / hard-positive mining for metric
learning vs brute-force oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(tmp_path, mat, labels, ids=None):
    n, d = mat.shape
    pq.write_table(
        pa.table({
            "vec_id": pa.array(
                np.asarray(ids if ids is not None else np.arange(n),
                           dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.asarray(labels, dtype=np.int32)),
        }),
        tmp_path / "embeddings.parquet",
    )


def _brute(mat, labels, ids, mode):
    mn = mat.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 6)
    out = {}
    for i in range(len(ids)):
        if ids[i] >= 50:
            continue
        best = None
        for j in range(len(ids)):
            if mode == "neg":
                valid = labels[j] != labels[i]
                key = (-sims[j, i], ids[j])
            else:
                valid = labels[j] == labels[i] and ids[j] != ids[i]
                key = (sims[j, i], ids[j])
            if valid and (best is None or key < best):
                best = key
        if best is not None:
            out[ids[i]] = (best[1], -best[0] if mode == "neg" else best[0])
    return out


def test_hard_negative_and_positive_match_brute(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import (
        q_hard_negatives_embeddings, q_hard_positives_embeddings)

    rng = np.random.default_rng(12)
    n = 120
    labels = rng.integers(0, 4, n)
    mat = rng.normal(0, 1, (n, 8)).astype(np.float32)
    _write_embeddings(tmp_path, mat, labels)
    ids = np.arange(n)

    neg = (q_hard_negatives_embeddings(str(tmp_path)).to_pandas()
           .set_index("anchor_id"))
    want = _brute(mat, labels, ids, "neg")
    assert len(neg) == 50
    for a, (nid, sim) in want.items():
        assert neg.loc[a, "neg_id"] == nid
        assert neg.loc[a, "cos_sim"] == pytest.approx(sim, abs=1e-9)
        # sanity: the mined negative really has a different label
        assert labels[nid] != labels[a]

    pos = (q_hard_positives_embeddings(str(tmp_path)).to_pandas()
           .set_index("anchor_id"))
    want_p = _brute(mat, labels, ids, "pos")
    for a, (pid, sim) in want_p.items():
        assert pos.loc[a, "pos_id"] == pid
        assert pos.loc[a, "cos_sim"] == pytest.approx(sim, abs=1e-9)
        assert labels[pid] == labels[a] and pid != a

    # the hardest negative is MORE similar than the hardest positive on
    # random data only sometimes — but each anchor's hard positive must be
    # the MINIMUM same-label sim, i.e. <= any other same-label sim
    mn = mat.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 6)
    for a in range(50):
        same = [j for j in range(n) if labels[j] == labels[a] and j != a]
        if same:
            assert pos.loc[a, "cos_sim"] <= min(sims[j, a] for j in same) + 1e-12
