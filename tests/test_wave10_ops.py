"""Round-4 wave-10 operators vs brute-force oracles: PII pattern counts,
Zipf slope, Benford leading digits, chi-square type drift."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.text import pattern_counts, zipf_slope


def test_pattern_counts_matches_re(ray_session):
    pats = {"n_email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
            "n_num": r"[0-9]{3,}"}
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Mail A@B.COM and c.d+e@f-g.org, code 12345 9",
                 "nothing here",
                 "x 111 22 3333 y@z.io"],
    })
    out = pattern_counts(rd.from_pandas(docs), pats).to_pandas().set_index("doc_id")
    for _, r in docs.iterrows():
        low = r["text"].lower()
        for name, p in pats.items():
            assert out.loc[r["doc_id"], name] == len(re.findall(p, low)), (r["doc_id"], name)


def test_zipf_slope_matches_naive(ray_session):
    # synthetic corpus with a known heavy-tailed vocabulary
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    probs = 1.0 / np.arange(1, 201)
    probs /= probs.sum()
    words = rng.choice(vocab, size=20_000, p=probs)
    docs = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [" ".join(words[i * 500:(i + 1) * 500]) for i in range(40)],
    })
    got = zipf_slope(rd.from_pandas(docs), min_count=3).to_pandas()
    # naive: counts -> rank by (cnt desc, token asc) -> fixed-point OLS
    cnt = pd.Series(words).value_counts()
    cnt = cnt[cnt >= 3]
    order = sorted(cnt.index, key=lambda t: (-cnt[t], t))
    xm = np.array([round(math.log2(r + 1) * 1000) for r in range(len(order))],
                  dtype=np.int64)
    ym = np.array([round(math.log2(cnt[t]) * 1000) for t in order], dtype=np.int64)
    n = float(len(xm))
    sx, sy = float(xm.sum()), float(ym.sum())
    sxx, sxy = float((xm * xm).sum()), float((xm * ym).sum())
    want = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert got["n_vocab"][0] == len(order)
    assert got["zipf_slope"][0] == pytest.approx(want, abs=1e-9)
    assert -1.4 < want < -0.6  # sanity: Zipf-ish corpus


def test_benford_and_chisq_queries(ray_session, tmp_path):
    # tiny deterministic events parquet driven through the registered queries
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.pipelines.queries_ml import q_benford_values, q_chisq_type_drift

    n = 600
    rng = np.random.default_rng(9)
    vals = np.round(rng.lognormal(3, 1.2, n), 2)
    vals[5] = np.nan  # null dropped
    vals[6] = 0.0     # zero cents dropped by benford
    ts = pd.to_datetime(rng.integers(0, 10**6, n) * 1_000_000, unit="us")
    tbl = pa.table({
        "event_id": pa.array(np.arange(n)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 20, n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(pd.Series(vals)),  # NaN -> true null, as in testdata
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    ben = q_benford_values(str(tmp_path)).to_pandas().set_index("digit")["n"]
    cents = np.round(np.nan_to_num(vals) * 100).astype(np.int64)
    cents = cents[cents > 0]
    lead = np.array([int(str(c)[0]) for c in cents])
    for d in range(1, 10):
        want = int((lead == d).sum())
        if want:
            assert ben.loc[d] == want
    assert ben.sum() == len(cents)

    chi = q_chisq_type_drift(str(tmp_path)).to_pandas()
    us = pa.array(ts).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
    mid = us.min() + (us.max() - us.min()) // 2
    half = (us > mid).astype(int)
    et = tbl["event_type"].to_numpy(zero_copy_only=False)
    types = sorted(set(et))
    grid = np.zeros((len(types), 2))
    for t, h in zip(et, half):
        grid[types.index(t), h] += 1
    rt, ct, tot = grid.sum(1), grid.sum(0), grid.sum()
    e = rt[:, None] * ct[None, :] / tot
    naive = (((grid - e) ** 2) / e).sum()
    assert chi["chi2"][0] == pytest.approx(naive, abs=1e-4)
    assert chi["n_cells"][0] == grid.size and chi["dof"][0] == len(types) - 1
