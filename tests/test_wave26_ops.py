"""Round-4 wave-26 operators vs brute-force oracles: Tukey-fence outlier
counts, token burstiness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, value, event_type=None):
    n = len(value)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(event_type or ["e"] * n, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


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


def test_tukey_counts_planted_outliers(ray_session, tmp_path):
    from feast_ray.pipelines.queries import q_tukey_outliers_type

    # 20 values 1..20 (q1=5, q3=15 disc) + two gross outliers
    vals = [float(i) for i in range(1, 21)] + [1000.0, -1000.0]
    _write_events(tmp_path, vals)
    out = q_tukey_outliers_type(str(tmp_path)).to_pandas()
    assert len(out) == 1
    c = np.round(np.array(vals) * 100).astype(np.int64)
    q1 = int(np.sort(c)[int(np.ceil(0.25 * len(c))) - 1])
    q3 = int(np.sort(c)[int(np.ceil(0.75 * len(c))) - 1])
    iqr = q3 - q1
    want = int(((2 * c < 2 * q1 - 3 * iqr) | (2 * c > 2 * q3 + 3 * iqr)).sum())
    assert out["n_outliers"][0] == want >= 2
    assert out["q1_cents"][0] == q1 and out["q3_cents"][0] == q3


def test_burstiness_content_vs_function_words(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_token_burstiness_docs

    # 'the' once per doc (even spread, burstiness (n-1 terms) -> 0 within
    # containing docs); 'llama' concentrated: 10x in one doc, 1x in another
    texts = ["the llama " + "llama " * 9] + ["the llama"] + ["the x"] * 18
    _write_docs(tmp_path, texts)
    out = (q_token_burstiness_docs(str(tmp_path)).to_pandas()
           .set_index("token"))
    # brute force
    rows = []
    for i, txt in enumerate(texts):
        toks = [t for t in txt.lower().split() if t]
        s = pd.Series(toks).value_counts()
        for tok, c in s.items():
            rows.append((tok, i, c))
    df = pd.DataFrame(rows, columns=["token", "doc", "c"])
    agg = df.groupby("token").agg(df_=("doc", "nunique"), cnt=("c", "sum"),
                                  ss=("c", lambda x: int((x ** 2).sum())))
    for tok in out.index:
        r = agg.loc[tok]
        want = (int(r["ss"]) * int(r["df_"]) - int(r["cnt"]) ** 2) / (
            int(r["df_"]) * int(r["cnt"]))
        assert out.loc[tok, "burstiness"] == pytest.approx(want, abs=1e-12)
        assert out.loc[tok, "df"] == r["df_"] and out.loc[tok, "cnt"] == r["cnt"]
    # the planted content word is burstier than the function word
    assert out.loc["llama", "burstiness"] > out.loc["the", "burstiness"]
    assert out.loc["the", "burstiness"] == 0.0  # exactly 1 per containing doc
