"""Round-4 operators vs brute-force oracles: SemDeDup, duplicated-span
coverage, distributed k-means, Bloom-prefiltered decontamination."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.decontam import (
    bloom_decontaminate,
    decontaminate,
    dup_span_coverage,
)
from feast_ray.stages.dedup import semdedup
from feast_ray.stages.similarity import kmeans


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _rand_vecs(n=60, dim=8, seed=3, dup_pairs=6):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    for i in range(dup_pairs):  # plant near-duplicates across the id range
        j = n - 1 - i
        m[j] = m[i] + rng.normal(scale=0.01, size=dim)
    return m


def _semdedup_brute(m, k, tau, rd_digits=6):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cent = mn[:k]  # ids are 0..n-1 so the k lowest ids are the first rows
    cs = np.round(mn @ cent.T, rd_digits)
    cl = np.argmin(-cs, axis=1)  # argmax with lowest-index ties
    rows = []
    for i in range(len(m)):
        mates = [j for j in range(i) if cl[j] == cl[i]]
        mx = max((np.round(float(mn[i] @ mn[j]), rd_digits) for j in mates), default=None)
        rows.append((i, int(cl[i]), mx, int(mx is not None and mx >= tau)))
    return rows


def test_semdedup_matches_brute_force(ray_session):
    m = _rand_vecs()
    tau = 0.95
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(m)), "embedding": m.astype(np.float32).tolist()})
    )
    got = (
        semdedup(ds, id_col="vec_id", k=5, tau=tau)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # brute force on the same float32-rounded input the engine saw
    want = _semdedup_brute(m.astype(np.float32).astype(np.float64), 5, tau)
    assert list(got["vec_id"]) == [w[0] for w in want]
    assert list(got["cluster_id"]) == [w[1] for w in want]
    for g, w in zip(got["max_lower_cos"], [w[2] for w in want]):
        if w is None:
            assert pd.isna(g)
        else:
            assert abs(g - w) < 1e-9
    assert list(got["is_dup"]) == [w[3] for w in want]
    assert got["is_dup"].sum() >= 4  # the planted near-dups are caught


# ---------------------------------------------------------------------------
# Duplicated-span coverage
# ---------------------------------------------------------------------------


def _span_brute(docs, w):
    toks = {d: _toks(t) for d, t in docs.items()}
    wins = {
        d: {i: " ".join(tl[i : i + w]) for i in range(len(tl) - w + 1)}
        for d, tl in toks.items()
    }
    owner = {}
    for d, m in wins.items():
        for s in m.values():
            owner.setdefault(s, set()).add(d)
    out = {}
    for d, tl in toks.items():
        dup_pos = sorted(i for i, s in wins[d].items() if len(owner[s]) >= 2)
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + w))
        out[d] = (
            len(tl),
            max(len(tl) - w + 1, 0),
            len(dup_pos),
            len(covered),
            round(len(covered) / len(tl), 6) if tl else 0.0,
        )
    return out


def test_dup_span_coverage_merges_intervals(ray_session):
    # doc 1 and 2 share two OVERLAPPING windows -> union, not 2*w
    docs = {
        1: "a b c d e f g h zz yy xx",
        2: "q q a b c d e f g h q q",
        3: "totally unrelated words here only once",
        4: "",
    }
    w = 4
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (
        dup_span_coverage(rd.from_pandas(df), w=w)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _span_brute(docs, w)
    for _, r in got.iterrows():
        n_tok, n_win, n_dup, cov, frac = want[r["doc_id"]]
        assert r["n_tokens"] == n_tok
        assert r["n_windows"] == n_win
        assert r["n_dup_windows"] == n_dup
        assert r["covered_tokens"] == cov
        assert abs(r["covered_frac"] - frac) < 1e-9
    # doc 1: 5 dup windows over "a b c d e f g h" -> 8 covered, not 20
    row1 = got[got["doc_id"] == 1].iloc[0]
    assert row1["n_dup_windows"] == 5 and row1["covered_tokens"] == 8


def test_dup_span_coverage_randomized(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(30)]
    docs = {
        d: " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
        for d in range(25)
    }
    w = 3
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = dup_span_coverage(rd.from_pandas(df), w=w).to_pandas()
    want = _span_brute(docs, w)
    assert len(got) == len(docs)
    for _, r in got.iterrows():
        n_tok, n_win, n_dup, cov, frac = want[r["doc_id"]]
        assert (
            r["n_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["covered_tokens"],
        ) == (n_tok, n_win, n_dup, cov)
        assert abs(r["covered_frac"] - frac) < 1e-9


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def _kmeans_brute(m, k, n_iter, rd_digits=6):
    cent = m[:k].copy()
    for _ in range(n_iter + 1):
        d = np.round(((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2), rd_digits)
        asg = np.argmin(d, axis=1)
        if _ == n_iter:
            return asg, d[np.arange(len(m)), asg]
        for c in range(k):
            sel = asg == c
            if sel.any():
                cent[c] = m[sel].mean(axis=0)


def test_kmeans_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    m = np.concatenate(
        [rng.normal(loc=c, scale=0.3, size=(30, 6)) for c in (-3.0, 0.0, 3.0)]
    )
    order = rng.permutation(len(m))
    m = m[order]
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(m)), "embedding": m.astype(np.float32).tolist()})
    )
    got = (
        kmeans(ds, id_col="vec_id", k=3, n_iter=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    asg, dist = _kmeans_brute(m.astype(np.float32).astype(np.float64), 3, 3)
    assert list(got["cluster_id"]) == list(asg)
    assert np.allclose(got["dist"], dist, atol=1e-9)
    assert len(set(asg)) == 3  # all three planted blobs found


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # two coincident far blobs + one isolated init point: one centroid gets
    # no members in iteration 1 and must carry through unchanged
    m = np.array([[0.0, 0.0], [100.0, 100.0], [100.0, 100.1], [100.1, 100.0]])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(4), "embedding": m.tolist()})
    )
    got = kmeans(ds, id_col="vec_id", k=2, n_iter=2).to_pandas().sort_values("vec_id")
    asg, dist = _kmeans_brute(m.copy(), 2, 2)
    assert list(got["cluster_id"]) == list(asg)
    assert np.allclose(np.sort(got["dist"].to_numpy()), np.sort(dist), atol=1e-9)


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_equals_exact(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    train = pd.DataFrame(
        {
            "doc_id": np.arange(30),
            "text": [" ".join(rng.choice(vocab, size=20)) for _ in range(30)],
        }
    )
    ev = pd.DataFrame(
        {
            "doc_id": [1000, 1001],
            # eval reuses two full training docs -> guaranteed contamination
            "text": [train["text"][3], train["text"][17]],
        }
    )
    exact = (
        decontaminate(rd.from_pandas(train), rd.from_pandas(ev), w=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # tiny bitmap forces false positives through the prefilter; the exact
    # semi-join must still remove them
    bloom = (
        bloom_decontaminate(
            rd.from_pandas(train), rd.from_pandas(ev), w=3, m_bits=256, n_hashes=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, bloom)
    assert (exact["doc_id"] == [3, 17]).all() or len(exact) >= 2


def test_bloom_rejects_bad_m_bits(ray_session):
    with pytest.raises(ValueError):
        bloom_decontaminate(
            rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a b c"]})),
            rd.from_pandas(pd.DataFrame({"doc_id": [2], "text": ["a b c"]})),
            m_bits=100,
        )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (A-ES)
# ---------------------------------------------------------------------------


def _aes_brute(ids, w, n, seed_mult=1):
    from feast_ray.stages.sampling import mix64

    m = mix64(ids.astype(np.uint64) * np.uint64(seed_mult)) >> np.uint64(11)
    u = (m.astype(np.float64) + 0.5) / 9007199254740992.0
    key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1.0), -np.inf)
    order = np.argsort(-key, kind="stable")
    return set(ids[order[: min(n, int((w > 0).sum()))]].tolist())


def test_weighted_reservoir_matches_brute(ray_session):
    from feast_ray.stages.sampling import weighted_reservoir_sample

    rng = np.random.default_rng(9)
    ids = np.arange(200, dtype=np.int64)
    w = rng.integers(0, 50, size=200).astype(np.int64)  # some zero weights
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "wt": w}))
    got = weighted_reservoir_sample(ds, key_col="doc_id", weight_col="wt", n=30)
    got_ids = set(got.to_pandas()["doc_id"])
    assert got_ids == _aes_brute(ids, w.astype(np.float64), 30)
    assert len(got_ids) == 30
    # zero-weight rows can never be sampled
    assert not (set(ids[w == 0]) & got_ids)


def test_weighted_reservoir_prefers_heavy_rows(ray_session):
    from feast_ray.stages.sampling import weighted_reservoir_sample

    ids = np.arange(400, dtype=np.int64)
    w = np.where(ids < 200, 1, 100).astype(np.int64)  # heavy second half
    hits = np.zeros(400, dtype=np.int64)
    for s in (1, 3, 5, 7, 9):  # distinct deterministic draws
        ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "wt": w}))
        out = weighted_reservoir_sample(
            ds, key_col="doc_id", weight_col="wt", n=40, seed_mult=s
        ).to_pandas()
        hits[out["doc_id"]] += 1
        assert set(out["doc_id"]) == _aes_brute(ids, w.astype(np.float64), 40, s)
    # ~100x weight ratio: heavy rows dominate every draw
    assert hits[200:].sum() > 8 * hits[:200].sum()


# ---------------------------------------------------------------------------
# retention cohorts / shipping priority / leakage audit (late round 4)
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_retention_cohorts_bruteforce(ray_session):
    from feast_ray.pipelines.queries import WEEK_US, q_retention_cohorts

    got = q_retention_cohorts(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    first = ev.groupby("user_id")["us"].min()
    from collections import Counter

    cnt = Counter()
    seen = set()  # distinct (user, cohort, offset)
    for uid, us in zip(ev["user_id"], ev["us"]):
        f = first[uid]
        key = (uid, f // WEEK_US, (us - f) // WEEK_US)
        if key not in seen:
            seen.add(key)
            cnt[(f // WEEK_US, (us - f) // WEEK_US)] += 1
    want = sorted(
        (cw, off, n, n / cnt[(cw, 0)]) for (cw, off), n in cnt.items()
    )
    got_t = list(got.itertuples(index=False, name=None))
    assert got_t == want


def test_leakage_audit_zero(ray_session):
    from feast_ray.pipelines.queries import q_leakage_audit

    got = q_leakage_audit(SF).to_pandas().iloc[0]
    assert got["n_leaks"] == 0
    assert got["n_ttl_violations"] == 0
    assert 0 < got["n_matched"] <= got["n_rows"]
    assert 0 <= got["max_age_us"] <= 86400000000


def test_shipping_priority_duckdb_twin(ray_session):
    import duckdb

    from feast_ray.pipelines.queries import ORACLE_SQL, q_shipping_priority

    got = q_shipping_priority(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = con.execute(ORACLE_SQL["shipping_priority"]).fetchdf()
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])
    assert list(got["revenue"]) == list(want["revenue"])


def test_mode_event_type_user_bruteforce(ray_session):
    from collections import Counter

    from feast_ray.pipelines.queries import q_mode_event_type_user

    got = (
        q_mode_event_type_user(SF)
        .to_pandas().set_index("user_id").sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    for uid, grp in ev.groupby("user_id"):
        cnt = Counter(grp["event_type"])
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got.loc[uid, "top_event_type"] == best[0]
        assert got.loc[uid, "n_events"] == best[1]


def test_value_quantiles_type_bruteforce(ray_session):
    from feast_ray.pipelines.queries import q_value_quantiles_type

    got = (
        q_value_quantiles_type(SF)
        .to_pandas().set_index("event_type").sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for et, grp in ev.groupby("event_type"):
        vals = np.sort(grp["value"].dropna().to_numpy())
        assert got.loc[et, "n_values"] == len(vals)
        for q, col in [(0.5, "p50"), (0.9, "p90")]:
            idx = max(int(np.ceil(q * len(vals))) - 1, 0)
            assert got.loc[et, col] == vals[idx]
