"""Round-4 wave-29 operators vs brute-force oracles: BMP gradient features,
log-normal length fit, harmonic mean."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, n, lengths=None, sources=None):
    lengths = lengths or [10] * n
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x" * ln for ln in lengths], pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources or ["s"] * n, pa.string()),
            "n_chars": pa.array(list(lengths), pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )


def test_bmp_gradient_matches_pixel_recompute(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_bmp_gradient_docs

    n = 40
    _write_docs(tmp_path, n)
    out = (q_bmp_gradient_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    for did in range(n):
        w, h, m = did % 37 + 1, did % 23 + 1, did % 256
        k = np.arange(w * h * 3, dtype=np.int64)
        px = ((m + k) % 256).reshape(h, w, 3)
        gray = px.sum(axis=2)
        sdx = int(np.abs(np.diff(gray, axis=1)).sum()) if w > 1 else 0
        sdy = int(np.abs(np.diff(gray, axis=0)).sum()) if h > 1 else 0
        assert out.loc[did, "width"] == w and out.loc[did, "height"] == h
        assert out.loc[did, "sum_abs_dx"] == sdx
        assert out.loc[did, "sum_abs_dy"] == sdy
        terms = h * (w - 1) + (h - 1) * w
        want = (sdx + sdy) / terms if terms else 0.0
        assert out.loc[did, "edge_density"] == pytest.approx(want, abs=1e-12)


def test_lognormal_fit_recovers_planted_distribution(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_lognormal_fit_sources

    rng = np.random.default_rng(6)
    # source A: ln-lengths ~ N(5, 0.5); source B: constant length
    la = np.clip(np.exp(rng.normal(5.0, 0.5, 300)).astype(int), 2, None)
    lb = np.full(100, 148)
    lengths = np.concatenate((la, lb)).tolist()
    sources = ["A"] * 300 + ["B"] * 100
    _write_docs(tmp_path, 400, lengths=lengths, sources=sources)
    out = (q_lognormal_fit_sources(str(tmp_path)).to_pandas()
           .set_index("source"))
    tm = np.round(np.log(la.astype(float)) * 1e6).astype(np.int64)
    mu = (tm.sum() / 1e6) / len(tm)
    var = ((tm.astype(object) * tm).sum() / 1e12) / len(tm) - mu * mu
    assert out.loc["A", "mu_ln"] == pytest.approx(mu, abs=1e-12)
    assert out.loc["A", "sigma_ln"] == pytest.approx(math.sqrt(var), abs=1e-9)
    assert abs(out.loc["A", "mu_ln"] - 5.0) < 0.15  # recovers the plant
    assert out.loc["B", "sigma_ln"] == 0.0          # constant -> zero spread


def test_harmonic_mean_rates(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_harmonic_mean_value_user

    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(4, dtype=np.int64)),
            "ts": pa.array(np.arange(4, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array([0, 0, 0, 0], pa.int64()),
            "event_type": pa.array(["e"] * 4, pa.string()),
            "value": pa.array([0.30, 0.60, -1.0, None], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }),
        tmp_path / "events.parquet",
    )
    from_cents = [30, 60]  # negative and null excluded
    out = q_harmonic_mean_value_user(str(tmp_path)).to_pandas()
    assert out["n"][0] == 2
    r = sum(round(1e9 / c) for c in from_cents)
    want = 2 / (r / 1e9)
    assert out["harmonic_mean_cents"][0] == pytest.approx(want, abs=1e-9)
    assert out["harmonic_mean_cents"][0] == pytest.approx(40.0, abs=1e-3)
