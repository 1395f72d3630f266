"""Round-4 wave-33 operators vs brute-force oracles: sentence stats,
conversion latency quantiles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY = 86_400_000_000


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


def _write_events(tmp_path, ts_us, user_id, event_type):
    n = len(ts_us)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(list(event_type), pa.string()),
            "value": pa.array([None] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def test_sentence_stats_edges(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_sentence_stats_docs

    texts = [
        "One. Two two! Three three three?",  # sentences: 3, 7, 17 chars
        "no terminator here",                # 1 fragment
        "...",                               # punctuation only -> 0
        "",                                  # empty -> 0
    ]
    _write_docs(tmp_path, texts)
    out = (q_sentence_stats_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0, "n_sentences"] == 3
    assert out.loc[0, "sum_sentence_chars"] == 3 + 7 + 17
    assert out.loc[0, "mean_sentence_chars"] == pytest.approx(9.0)
    assert out.loc[1, "n_sentences"] == 1
    assert out.loc[2, "n_sentences"] == 0
    assert np.isnan(out.loc[2, "mean_sentence_chars"])
    assert out.loc[3, "n_sentences"] == 0


def test_conversion_latency_boundaries(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_conversion_latency_quantiles

    # user 0: signup day 0, purchase day 2 -> 2d latency
    # user 1: purchase BEFORE signup only -> excluded
    # user 2: purchase at the same instant as signup -> excluded
    # user 3: signup day 0, purchases day 1 and day 5 -> first = 1d
    ts = [0, 2 * DAY,
          DAY, 2 * DAY,
          3 * DAY, 3 * DAY,
          0, 1 * DAY, 5 * DAY]
    users = [0, 0, 1, 1, 2, 2, 3, 3, 3]
    types = ["signup", "purchase",
             "purchase", "signup",
             "signup", "purchase",
             "signup", "purchase", "purchase"]
    # user 2: purchase shares ts with signup -> strict > excludes it
    _write_events(tmp_path, ts, users, types)
    out = q_conversion_latency_quantiles(str(tmp_path)).to_pandas()
    assert out["n_converted"][0] == 2  # users 0 and 3 only
    lat = sorted([2 * DAY, 1 * DAY])
    # disc quantiles over [1d, 2d]: p50 = element ceil(.5*2)-1 = 1d
    assert out["p50_us"][0] == lat[0]
    assert out["p90_us"][0] == lat[1]
