"""Round-4 wave-30 operators vs brute-force oracles: Fisher ratio,
conversion by entry type, revenue concentration deciles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

MIN30 = 1800 * 1_000_000


def _write_embeddings(tmp_path, mat, labels):
    n, d = mat.shape
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.asarray(labels, dtype=np.int32)),
        }),
        tmp_path / "embeddings.parquet",
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


def test_fisher_ratio_separable_dimension_wins(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_fisher_ratio_embeddings

    rng = np.random.default_rng(4)
    n = 300
    labels = rng.integers(0, 3, n)
    mat = rng.normal(0, 1, (n, 4)).astype(np.float32)
    mat[:, 2] += labels * 10.0  # dim 2 perfectly separates classes
    _write_embeddings(tmp_path, mat, labels)
    out = (q_fisher_ratio_embeddings(str(tmp_path)).to_pandas()
           .set_index("dim").sort_index())
    assert len(out) == 4
    assert out["fisher_ratio"].idxmax() == 2
    assert out.loc[2, "fisher_ratio"] > 10 * out.drop(2)["fisher_ratio"].max()
    assert (out["n"] == n).all()


def test_conversion_by_entry_type(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_conversion_by_entry_type

    # user 0: session A starts 'view' then purchase; session B starts
    # 'click', no purchase; user 1: session starts 'view', no purchase
    ts = [0, 1_000_000, MIN30 * 3, MIN30 * 3 + 1_000_000, 0]
    users = [0, 0, 0, 0, 1]
    types = ["view", "purchase", "click", "view", "view"]
    _write_events(tmp_path, ts, users, types, [None] * 5)
    out = (q_conversion_by_entry_type(str(tmp_path)).to_pandas()
           .set_index("entry_type"))
    assert out.loc["view", "n_sessions"] == 2
    assert out.loc["view", "n_converted"] == 1
    assert out.loc["view", "conversion_rate"] == pytest.approx(0.5)
    assert out.loc["click", "n_sessions"] == 1
    assert out.loc["click", "n_converted"] == 0


def test_revenue_deciles_concentration(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_revenue_concentration_deciles

    # 100 users: user i spends i cents -> top decile share computable
    n = 100
    _write_events(tmp_path, list(range(n)), list(range(n)), ["e"] * n,
                  [i / 100.0 for i in range(n)])
    out = (q_revenue_concentration_deciles(str(tmp_path)).to_pandas()
           .set_index("decile").sort_index())
    assert len(out) == 10 and (out["n_users"] == 10).all()
    # deciles ordered by revenue: decile 10 holds users 90..99
    assert out.loc[10, "revenue_cents"] == sum(range(90, 100))
    assert out.loc[1, "revenue_cents"] == sum(range(0, 10))
    total = sum(range(n))
    assert out["revenue_cents"].sum() == total
    assert out.loc[10, "share"] == pytest.approx(
        sum(range(90, 100)) / total, abs=1e-12)
