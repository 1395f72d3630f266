"""Round-4 wave-32 operators vs brute-force oracles: Bowley/Moors shape
scores, session type trigrams."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

MIN30 = 1800 * 1_000_000


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


def test_bowley_moors_known_shapes(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_bowley_moors_type

    # symmetric uniform 1..100 -> Bowley ~ 0; right-skewed -> positive
    sym = [float(i) for i in range(1, 101)]
    skew = [1.0] * 50 + [float(10 * i) for i in range(1, 51)]
    vals = sym + skew
    types = ["sym"] * 100 + ["skew"] * 100
    _write_events(tmp_path, list(range(200)), [0] * 200, types, vals)
    out = (q_bowley_moors_type(str(tmp_path)).to_pandas()
           .set_index("event_type"))
    assert abs(out.loc["sym", "bowley_skew"]) < 0.05
    assert out.loc["skew", "bowley_skew"] > 0.5
    # brute-force octiles for 'sym'
    c = np.round(np.array(sym) * 100).astype(np.int64)
    cs = np.sort(c)
    e = {i: int(cs[int(np.ceil(i / 8 * len(cs))) - 1]) for i in range(1, 8)}
    want_moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    assert out.loc["sym", "moors_kurtosis"] == pytest.approx(want_moors,
                                                             abs=1e-12)
    # constant values -> zero IQR -> null shape scores
    tmp2 = tmp_path / "const"
    tmp2.mkdir()
    _write_events(tmp2, list(range(10)), [0] * 10, ["c"] * 10, [5.0] * 10)
    out2 = q_bowley_moors_type(str(tmp2)).to_pandas()
    assert out2["bowley_skew"].isna().all()


def test_trigrams_respect_session_boundaries(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_type_trigrams_session

    # session 1: a,b,c,b,c -> trigrams abc, bcb, cbc
    # session 2 (after gap): a,b,c -> abc again
    ts = [0, 1, 2, 3, 4] + [MIN30 * 2, MIN30 * 2 + 1, MIN30 * 2 + 2]
    ts = [v * 1_000_000 if v < 10 else v for v in ts]
    types = list("abcbc") + list("abc")
    _write_events(tmp_path, ts, [0] * 8, types, [None] * 8)
    out = q_type_trigrams_session(str(tmp_path)).to_pandas()
    got = {(r["t1"], r["t2"], r["t3"]): r["n"] for _, r in out.iterrows()}
    assert got[("a", "b", "c")] == 2
    assert got[("b", "c", "b")] == 1
    assert got[("c", "b", "c")] == 1
    # no trigram spans the session gap (e.g. b,c | a or c,a,b absent)
    assert ("c", "a", "b") not in got and ("b", "c", "a") not in got
