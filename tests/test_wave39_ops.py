"""Round-4 wave-39 operators vs brute-force oracles: Hill tail index,
Markov stationary distribution (the rows-only query's exact pytest twin)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


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


def test_hill_recovers_pareto_alpha(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_hill_tail_index_type

    rng = np.random.default_rng(8)
    alpha_true = 2.5
    n = 5000
    # Pareto(alpha): x = xm * U^(-1/alpha)
    x = 10.0 * rng.uniform(size=n) ** (-1.0 / alpha_true)
    _write_events(tmp_path, list(range(n)), [0] * n, ["e"] * n,
                  list(x))
    out = q_hill_tail_index_type(str(tmp_path)).to_pandas()
    # Hill on the top decile of a Pareto sample ~ alpha_true
    assert abs(out["hill_alpha"][0] - alpha_true) < 0.4
    # brute-force exactness of the estimator itself
    c = np.round(x * 100).astype(np.int64)
    c = c[c > 0]
    cs = np.sort(c)
    p90 = int(cs[int(np.ceil(0.9 * len(cs))) - 1])
    tail = c[c > p90]
    tm = np.round(np.log(tail / float(p90)) * 1e6).astype(np.int64)
    want = 1.0 / ((tm.sum() / 1e6) / len(tail))
    assert out["hill_alpha"][0] == pytest.approx(want, abs=1e-9)
    assert out["n_tail"][0] == len(tail)


def test_markov_stationary_matches_eig(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_markov_stationary_types

    rng = np.random.default_rng(3)
    # random walks over 3 types with a biased kernel
    types_dom = ["a", "b", "c"]
    P_true = np.array([[0.7, 0.2, 0.1],
                       [0.3, 0.4, 0.3],
                       [0.2, 0.2, 0.6]])
    seq = [0]
    for _ in range(4000):
        seq.append(rng.choice(3, p=P_true[seq[-1]]))
    types = [types_dom[s] for s in seq]
    _write_events(tmp_path, list(range(len(seq))), [0] * len(seq), types,
                  [None] * len(seq))
    out = (q_markov_stationary_types(str(tmp_path)).to_pandas()
           .set_index("event_type").sort_index())
    # exact twin: rebuild the EMPIRICAL transition matrix, numpy-eig it
    df = pd.DataFrame({"a": types[:-1], "b": types[1:]})
    cnt = df.groupby(["a", "b"]).size().unstack(fill_value=0)
    cnt = cnt.reindex(index=types_dom, columns=types_dom, fill_value=0)
    M = cnt.to_numpy().astype(float)
    P = M / M.sum(axis=1, keepdims=True)
    w, v = np.linalg.eig(P.T)
    pi = np.real(v[:, np.argmax(np.real(w))])
    pi = pi / pi.sum()
    for i, t in enumerate(types_dom):
        assert out.loc[t, "stationary_p"] == pytest.approx(pi[i], abs=1e-9)
    assert out["stationary_p"].sum() == pytest.approx(1.0, abs=1e-12)
