"""Round-4 wave-27 operators vs brute-force oracles: Spearman rank
correlation, byte-weighted length percentiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, user_id, value):
    n = len(value)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(["e"] * n, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def _write_docs(tmp_path, lengths):
    n = len(lengths)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x" * ln for ln in lengths], pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(list(lengths), pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )


def test_spearman_monotone_and_ties(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_spearman_value_time_user

    # user 0: strictly increasing -> rho = 1; user 1: strictly decreasing
    # -> rho = -1; user 2: with ties -> matches pandas spearman
    vals = ([1.0, 2.0, 3.0, 4.0, 5.0] + [9.0, 7.0, 5.0, 3.0]
            + [1.0, 2.0, 2.0, 3.0, 2.0, 5.0])
    users = [0] * 5 + [1] * 4 + [2] * 6
    _write_events(tmp_path, users, vals)
    out = (q_spearman_value_time_user(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    # sqrt(va)*sqrt(vb) rounds one ulp off va when va == vb, so perfectly
    # monotone gives 1 - 1ulp — the same value the SQL twin computes
    assert out.loc[0, "spearman"] == pytest.approx(1.0, abs=1e-15)
    assert out.loc[1, "spearman"] == pytest.approx(-1.0, abs=1e-15)
    s = pd.Series([1.0, 2.0, 2.0, 3.0, 2.0, 5.0])
    want = s.rank(method="average").corr(
        pd.Series(range(6)).rank(), method="pearson")
    assert out.loc[2, "spearman"] == pytest.approx(want, abs=1e-12)


def test_byte_weighted_percentiles_long_tail(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_byte_weighted_len_docs

    # 99 tiny docs (10 chars) + 1 huge doc (9900 chars): by-docs median is
    # tiny, by-bytes median lands on the huge doc
    lengths = [10] * 99 + [9900]
    _write_docs(tmp_path, lengths)
    out = q_byte_weighted_len_docs(str(tmp_path)).to_pandas()
    assert out["n_docs"][0] == 100
    assert out["total_bytes"][0] == 99 * 10 + 9900
    assert out["p50_by_docs"][0] == 10
    assert out["p50_by_bytes"][0] == 9900
    assert out["p90_by_docs"][0] == 10
    assert out["p90_by_bytes"][0] == 9900
