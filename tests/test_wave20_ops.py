"""Round-4 wave-20 operators vs brute-force oracles: hashed BOW, Count-Min
sketch, out-of-fold target encoding, feature correlation matrix."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _write_events(tmp_path, ts_us, user_id, event_type, value):
    n = len(ts_us)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(list(event_type), pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def _horner(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * 1_000_003 + ord(ch)) % (1 << 64)
    return h


def test_hashed_bow_matches_direct(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_hashed_bow_docs

    texts = ["Alpha beta GAMMA alpha", "x1 y2 x1", ""]
    _write_docs(tmp_path, texts)
    out = (q_hashed_bow_docs(str(tmp_path)).to_pandas()
           .sort_values(["doc_id", "bucket"]).reset_index(drop=True))
    rows = []
    for i, txt in enumerate(texts):
        toks = [t for t in __import__("re").split(
            r"[^a-z0-9]+", txt.lower()) if t]
        for t in toks:
            rows.append((i, _horner(t) % 64))
    want = (pd.DataFrame(rows, columns=["doc_id", "bucket"])
            .groupby(["doc_id", "bucket"]).size().rename("n").reset_index()
            .sort_values(["doc_id", "bucket"]).reset_index(drop=True))
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["bucket"].tolist() == want["bucket"].tolist()
    assert out["n"].tolist() == want["n"].tolist()
    assert 2 not in out["doc_id"].tolist()  # empty doc contributes nothing


def test_countmin_overestimate_guarantee(ray_session, tmp_path):
    """CM estimates must never underestimate, and with a near-empty domain
    (fewer tokens than cells) they equal the exact counts."""
    from feast_ray.pipelines.queries_docs import q_countmin_tokens_docs

    texts = ["the quick brown fox " * (i + 1) for i in range(10)]
    _write_docs(tmp_path, texts)
    out = q_countmin_tokens_docs(str(tmp_path)).to_pandas()
    assert (out["cm_est"] >= out["exact_cnt"]).all()
    # 4 distinct tokens into 4x512 cells: collisions are practically
    # impossible -> estimates exact
    assert (out["cm_est"] == out["exact_cnt"]).all()
    assert set(out["token"]) == {"the", "quick", "brown", "fox"}


def test_oof_excludes_own_fold(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_oof_target_encode_events
    from feast_ray.stages.sampling import mix64

    rng = np.random.default_rng(3)
    n = 300
    users = rng.integers(0, 40, n)
    types = rng.choice(["a", "b"], n)
    vals = rng.integers(1, 100, n) / 1.0
    _write_events(tmp_path, np.arange(n) * 1000, users, types, list(vals))
    out = q_oof_target_encode_events(str(tmp_path)).to_pandas()
    folds = (mix64(users.astype(np.int64)) % np.uint64(5)).astype(int)
    cents = np.round(vals * 100).astype(np.int64)
    df = pd.DataFrame({"event_type": types, "fold": folds, "c": cents})
    for (t, f), grp in df.groupby(["event_type", "fold"]):
        other = df[(df["event_type"] == t) & (df["fold"] != f)]
        want = other["c"].sum() / len(other)
        got = out[(out["event_type"] == t) & (out["fold"] == f)]
        assert np.allclose(got["oof_mean_cents"], want)
    # leakage check: per-(type,fold) encoding is NOT the in-fold mean
    g0 = df[(df["event_type"] == "a") & (df["fold"] == 0)]
    infold = g0["c"].mean()
    oof = out[(out["event_type"] == "a") & (out["fold"] == 0)][
        "oof_mean_cents"].iloc[0]
    assert abs(oof - infold) > 1e-9


def test_feature_corr_matrix_vs_pandas(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_feature_corr_matrix_user

    rng = np.random.default_rng(11)
    n = 500
    users = rng.integers(0, 60, n)
    ts = rng.integers(0, 30, n) * 86_400_000_000 + rng.integers(0, 1000, n)
    types = rng.choice(["a", "b", "c"], n)
    vals = rng.integers(0, 500, n) / 1.0
    _write_events(tmp_path, ts, users, types, list(vals))
    out = q_feature_corr_matrix_user(str(tmp_path)).to_pandas()
    df = pd.DataFrame({
        "user_id": users, "c": np.round(vals * 100).astype(np.int64),
        "t": types, "d": ts // 86_400_000_000})
    u = df.groupby("user_id").agg(
        n_events=("c", "size"), sum_cents=("c", "sum"),
        n_types=("t", "nunique"), n_active_days=("d", "nunique"))
    for _, r in out.iterrows():
        want = u[r["feat_a"]].corr(u[r["feat_b"]])
        assert r["corr"] == pytest.approx(want, abs=1e-9)
    assert (out["n_users"] == len(u)).all()
