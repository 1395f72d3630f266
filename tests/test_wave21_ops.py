"""Round-4 wave-21 operators vs brute-force oracles: standardized embedding
outlier score, JS divergence between sources, rank-gauss transform."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(tmp_path, mat):
    n, d = mat.shape
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }),
        tmp_path / "embeddings.parquet",
    )


def _write_docs(tmp_path, texts, sources):
    n = len(texts)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )


def _write_events(tmp_path, value):
    n = len(value)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(["e"] * n),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def test_std_outlier_flags_planted_outlier(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_std_outlier_embeddings

    rng = np.random.default_rng(5)
    mat = rng.normal(0, 1, (200, 8)).astype(np.float32)
    mat[17] = 25.0  # planted gross outlier
    _write_embeddings(tmp_path, mat)
    out = (q_std_outlier_embeddings(str(tmp_path)).to_pandas()
           .set_index("vec_id").sort_index())
    # brute force with the same micro fixed-point
    x = np.round(mat.astype(np.float64) * 1e6)
    mean = x.sum(axis=0) / len(x)
    var = (np.einsum("ij,ij->j", x, x) - x.sum(axis=0) ** 2 / len(x)) / len(x)
    z = (x - mean) / np.sqrt(var)
    want = np.round(z * z * 1e6).sum(axis=1) / 1e6
    assert np.allclose(out["std_score"].to_numpy(), want, atol=1e-6)
    assert out["std_score"].idxmax() == 17
    # chi-square intuition: a clean row's score ~ d, the outlier's >> d
    assert out["std_score"][17] > 20 * out["std_score"].drop(17).median()


def test_jsd_zero_for_identical_and_symmetric_positive(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_js_divergence_sources

    # sources A and B identical corpora; C disjoint vocabulary
    texts = (["apple banana cherry"] * 10 + ["apple banana cherry"] * 10
             + ["xylophone zebra quartz"] * 10)
    sources = ["A"] * 10 + ["B"] * 10 + ["C"] * 10
    _write_docs(tmp_path, texts, sources)
    out = q_js_divergence_sources(str(tmp_path)).to_pandas()
    pairs = {(r["source_a"], r["source_b"]): r["jsd"]
             for _, r in out.iterrows()}
    assert set(pairs) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert pairs[("A", "B")] == pytest.approx(0.0, abs=1e-9)
    assert pairs[("A", "C")] > 0.1
    # symmetry by construction: A-C and B-C identical inputs
    assert pairs[("A", "C")] == pairs[("B", "C")]
    # JSD is bounded by ln 2
    assert out["jsd"].max() <= np.log(2) + 1e-9


def test_rank_gauss_median_zero_and_monotone(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import (
        _acklam_np, q_rank_gauss_values)

    n = 101
    vals = (np.arange(n) + 1) / 1.0  # strictly increasing -> rank = order
    _write_events(tmp_path, list(vals))
    out = (q_rank_gauss_values(str(tmp_path)).to_pandas()
           .set_index("event_id").sort_index())
    p = (np.arange(n) + 1.0) / (n + 1.0)
    want = np.round(_acklam_np(p) * 1e6) / 1e6
    assert np.allclose(out["rank_gauss"].to_numpy(), want, atol=1e-9)
    # median value maps to ~0, transform is monotone, tails engage both
    # Acklam branches (p < 0.02425 and p > 0.97575 exist at n = 101)
    assert abs(out["rank_gauss"][50]) < 1e-6
    assert (np.diff(out["rank_gauss"].to_numpy()) > 0).all()
    assert out["rank_gauss"][0] < -1.9 and out["rank_gauss"][n - 1] > 1.9


def test_acklam_accuracy_vs_inverse():
    """Forward-check the inverse CDF: Phi(ppf(p)) == p to ~1e-9 using the
    error function via numpy (no scipy in this env)."""
    from math import erf

    from feast_ray.pipelines.queries_ml import _acklam_np

    p = np.linspace(0.001, 0.999, 97)
    x = _acklam_np(p)
    phi = np.array([0.5 * (1.0 + erf(v / np.sqrt(2.0))) for v in x])
    assert np.allclose(phi, p, atol=2e-9)
