"""Property-based tests (hypothesis) for the pure numpy kernels — each
kernel vs an independent naive-Python oracle on randomized small inputs.
No Ray involvement: these run in milliseconds per example."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from feast_ray.stages.windows import (
    rolling_aggs,
    rolling_rows_bounds,
    rolling_time_bounds,
    sessionize_ids,
    shift_indices,
)


# strategy: a list of group sizes + per-row values/timestamps
group_sizes = st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=6)


def _starts(sizes):
    return np.concatenate(([0], np.cumsum(sizes))).astype(np.int64)


def _row_bounds(sizes):
    starts = _starts(sizes)
    n = int(starts[-1])
    gstart = np.repeat(starts[:-1], sizes)
    gend = np.repeat(starts[1:], sizes)
    return n, starts, gstart, gend


@given(sizes=group_sizes, k=st.integers(min_value=1, max_value=5), lead=st.booleans())
@settings(max_examples=80, deadline=None)
def test_shift_indices_property(sizes, k, lead):
    n, starts, gstart, gend = _row_bounds(sizes)
    idx = shift_indices(n, gstart, gend, -k if lead else k)
    vals = np.arange(n)
    got = [None if not idx[i].is_valid else int(vals[idx[i].as_py()]) for i in range(n)]
    want = []
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        for i in range(lo, hi):
            j = i + k if lead else i - k
            want.append(int(vals[j]) if lo <= j < hi else None)
    assert got == want


@given(
    sizes=group_sizes,
    k=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_rolling_rows_aggs_property(sizes, k, data):
    n, starts, gstart, _ = _row_bounds(sizes)
    vals = data.draw(
        st.lists(
            st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
            min_size=n,
            max_size=n,
        )
    )
    v = np.array([np.nan if x is None else x for x in vals])
    ws, we = rolling_rows_bounds(n, gstart, k)
    out = rolling_aggs(v, ws, we, ("count", "sum", "mean", "last", "min", "max"), k_rows=k)
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        for i in range(lo, hi):
            window = [x for x in vals[max(lo, i - k + 1) : i + 1] if x is not None]
            assert out["count"][i].as_py() == len(window)
            if window:
                assert np.isclose(out["sum"][i].as_py(), sum(window))
                assert np.isclose(out["mean"][i].as_py(), sum(window) / len(window))
                assert np.isclose(out["last"][i].as_py(), window[-1])
                assert np.isclose(out["min"][i].as_py(), min(window))
                assert np.isclose(out["max"][i].as_py(), max(window))
            else:
                for a in ("sum", "mean", "last", "min", "max"):
                    assert not out[a][i].is_valid


@given(
    sizes=group_sizes,
    delta=st.integers(min_value=0, max_value=20),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_rolling_time_window_property(sizes, delta, data):
    n, starts, gstart, _ = _row_bounds(sizes)
    # nondecreasing int timestamps within each group
    ts = np.zeros(n, dtype=np.int64)
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        gaps = data.draw(
            st.lists(st.integers(min_value=0, max_value=15), min_size=hi - lo, max_size=hi - lo)
        )
        ts[lo:hi] = np.cumsum(gaps)
    ws, we = rolling_time_bounds(ts, starts, delta)
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        for i in range(lo, hi):
            in_win = [j for j in range(lo, hi) if ts[i] - delta <= ts[j] <= ts[i]]
            assert ws[i] == min(in_win) and we[i] == max(in_win) + 1


@given(sizes=group_sizes, gap=st.integers(min_value=0, max_value=10), data=st.data())
@settings(max_examples=60, deadline=None)
def test_sessionize_property(sizes, gap, data):
    n, starts, _, _ = _row_bounds(sizes)
    ts = np.zeros(n, dtype=np.int64)
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        gaps = data.draw(
            st.lists(st.integers(min_value=0, max_value=15), min_size=hi - lo, max_size=hi - lo)
        )
        ts[lo:hi] = np.cumsum(gaps)
    got = sessionize_ids(ts, starts, gap)
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        sid = 0
        for i in range(lo, hi):
            if i > lo and ts[i] - ts[i - 1] > gap:
                sid += 1
            assert got[i] == sid


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=6),
)
@settings(max_examples=60, deadline=None)
def test_pairs_within_groups_property(sizes):
    from itertools import combinations

    from feast_ray.stages.dedup import pairs_within_groups

    starts = _starts(sizes)
    vals = np.arange(int(starts[-1]), dtype=np.int64) * 10
    a, b = pairs_within_groups(vals, starts)
    got = list(zip(a.tolist(), b.tolist()))
    want = []
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        want += list(combinations(vals[lo:hi].tolist(), 2))
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_popcount_property(xs):
    from feast_ray.stages.dedup import _popcount64

    arr = np.array(xs, dtype=np.uint64)
    got = _popcount64(arr)
    assert got.tolist() == [bin(x).count("1") for x in xs]


@given(
    texts=st.lists(
        st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=30),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=6),
)
@settings(max_examples=40, deadline=None)
def test_distinct_gram_hashes_counts_property(texts, k):
    """Distinct hashed k-grams per doc == distinct k-char substrings
    (collision-free at these sizes)."""
    from feast_ray.stages.dedup import distinct_gram_hashes

    ids = np.arange(len(texts), dtype=np.int64)
    d, g = distinct_gram_hashes(pa.array(texts, type=pa.string()), ids, k)
    got = {int(i): 0 for i in ids}
    for i in d:
        got[int(i)] += 1
    for i, t in enumerate(texts):
        want = len({t[j : j + k] for j in range(len(t) - k + 1)})
        assert got[i] == want, (i, t)


@given(
    sizes=group_sizes,
    budget=st.integers(min_value=1, max_value=50),
    data=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_pack_kernel_property(sizes, budget, data):
    from feast_ray.stages.pack import pack_kernel

    starts = _starts(sizes)
    n = int(starts[-1])
    toks = data.draw(
        st.lists(st.integers(min_value=0, max_value=80), min_size=n, max_size=n)
    )
    t = pa.table({"g": np.repeat(np.arange(len(sizes)), sizes), "sz": toks})
    out = pack_kernel("sz", budget, "bin")(t, starts)
    bins = out["bin"].to_numpy(zero_copy_only=False)
    for g in range(len(sizes)):
        lo, hi = int(starts[g]), int(starts[g + 1])
        want, acc, b = [], 0, 0
        for i in range(lo, hi):
            s = toks[i]
            if i > lo and acc + s > budget:
                b += 1
                acc = s
            else:
                acc += s
            want.append(b)
        assert list(bins[lo:hi]) == want, (g, toks[lo:hi], budget)


@given(
    sizes=group_sizes,
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_expanding_distinct_kernel_property(sizes, data):
    import pandas as pd

    starts = _starts(sizes)
    n = int(starts[-1])
    cats = data.draw(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n)
    )
    # emulate the kernel's core: first-occurrence + rebased cumsum
    gidx = np.repeat(np.arange(len(sizes)), sizes)
    codes = pd.factorize(cats)[0].astype(np.int64)
    vocab = int(codes.max()) + 1 if n else 1
    _, first_idx = np.unique(gidx * vocab + codes, return_index=True)
    is_first = np.zeros(n, dtype=np.int64)
    is_first[first_idx] = 1
    cum = np.cumsum(is_first)
    base = np.repeat(cum[starts[:-1]] - is_first[starts[:-1]], sizes)
    got = cum - base
    want = []
    for g in range(len(sizes)):
        seen = set()
        for i in range(int(starts[g]), int(starts[g + 1])):
            seen.add(cats[i])
            want.append(len(seen))
    assert list(got) == want


@given(
    sizes=group_sizes,
    alpha=st.sampled_from([0.25, 0.5, 0.125, 1.0]),
    seed=st.integers(min_value=0, max_value=2**16),
)
@settings(max_examples=60, deadline=None)
def test_ewma_walk_property(sizes, alpha, seed):
    from feast_ray.stages.windows import ewma_walk

    starts = _starts(sizes)
    n = int(starts[-1])
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 10, n)
    got = ewma_walk(x, starts, alpha)
    for g in range(len(sizes)):
        lo, hi = starts[g], starts[g + 1]
        y = x[lo]
        assert got[lo] == y
        for i in range(lo + 1, hi):
            y = alpha * x[i] + (1.0 - alpha) * y
            assert got[i] == y  # bit-exact: same operation order


@given(
    sizes=st.lists(
        st.tuples(st.integers(min_value=0, max_value=8),
                  st.integers(min_value=1, max_value=8)),
        min_size=1, max_size=5,
    ),
    ttl=st.one_of(st.none(), st.integers(min_value=0, max_value=12)),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_asof_kernel_property(sizes, ttl, data):
    """The core point-in-time kernel (north-star J1) vs a naive per-row
    oracle: per spine row, the feature row with the LARGEST fts <= t (fts
    equal to t matches — features sort before spine at equal ts), ties on
    fts broken by max created_ts, TTL bound fts >= t - ttl inclusive,
    miss -> null.  Pure kernel test over the sorted union layout the
    exchange feeds it — no Ray."""
    from feast_ray.stages.asof import asof_kernel_factory

    rows = []  # (group, T, side, cts, spine_id, val)
    for g, (n_feat, n_spine) in enumerate(sizes):
        fts = data.draw(
            st.lists(st.integers(0, 20), min_size=n_feat, max_size=n_feat),
            label=f"fts_g{g}",
        )
        vals = data.draw(
            st.lists(st.integers(-50, 50), min_size=n_feat, max_size=n_feat),
            label=f"val_g{g}",
        )
        sts = data.draw(
            st.lists(st.integers(0, 20), min_size=n_spine, max_size=n_spine),
            label=f"sts_g{g}",
        )
        for i in range(n_feat):
            # unique created_ts per (group, fts) family keeps the
            # tie-break deterministic for the oracle
            rows.append((g, fts[i], 0, i, None, vals[i]))
        for i in range(n_spine):
            rows.append((g, sts[i], 1, -1, g * 100 + i, None))
    # sorted union layout: group, then (T, side, created)
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    import pyarrow as pa2

    tbl = pa2.table(
        {
            "__t": pa2.array([r[1] for r in rows], pa2.int64()),
            "__side": pa2.array([r[2] for r in rows], pa2.int8()),
            "spine_id": pa2.array([r[4] for r in rows], pa2.int64()),
            "val": pa2.array([r[5] for r in rows], pa2.int64()),
        }
    )
    # the kernel reads the internal _T column name
    from feast_ray.stages.asof import _T

    tbl = tbl.rename_columns([_T, "__side", "spine_id", "val"])
    group_of = [r[0] for r in rows]
    starts = [0] + [
        i for i in range(1, len(rows)) if group_of[i] != group_of[i - 1]
    ] + [len(rows)]
    starts = np.array(sorted(set(starts)), dtype=np.int64)

    kernel = asof_kernel_factory(
        ["spine_id"], ["val"], ttl, "mts", pa2.int64()
    )
    got = kernel(tbl, starts).to_pandas().set_index("spine_id")

    # naive oracle over the raw rows
    for g, (n_feat, n_spine) in enumerate(sizes):
        feats = [r for r in rows if r[0] == g and r[2] == 0]
        spines = [r for r in rows if r[0] == g and r[2] == 1]
        for r in spines:
            t = r[1]
            cand = [f for f in feats if f[1] <= t]
            if ttl is not None:
                cand = [f for f in cand if f[1] >= t - ttl]
            row = got.loc[r[4]]
            if not cand:
                assert row["val"] is None or np.isnan(row["val"])
                assert row["mts"] is None or np.isnan(row["mts"])
            else:
                best_t = max(f[1] for f in cand)
                best = max(f for f in cand if f[1] == best_t)  # max cts
                assert row["val"] == best[5]
                assert row["mts"] == best_t


@given(
    sizes=group_sizes,
    k=st.integers(min_value=1, max_value=6),
    q_pct=st.sampled_from([25, 50, 75]),
    data=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_rolling_discrete_quantile_property(sizes, k, q_pct, data):
    """quantile_disc over ROWS windows vs a per-window naive oracle:
    the element at 0-based sorted index ceil(q*n_valid)-1 among the
    window's non-null values, None when the window is all-null."""
    n, starts, gstart, gend = _row_bounds(sizes)
    vals = data.draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-50, max_value=50,
                    allow_nan=False, allow_infinity=False,
                ),
            ),
            min_size=n, max_size=n,
        )
    )
    v = np.array([np.nan if x is None else float(x) for x in vals])
    ws, we = rolling_rows_bounds(n, gstart, k)
    agg = "median" if q_pct == 50 else f"p{q_pct}"
    out = rolling_aggs(v, ws, we, [agg], k_rows=k)[agg].to_pylist()
    q = q_pct / 100.0
    for i in range(n):
        win = sorted(x for x in v[ws[i]: we[i]] if not np.isnan(x))
        if not win:
            assert out[i] is None
        else:
            idx = max(int(np.ceil(q * len(win))) - 1, 0)
            assert out[i] == win[idx], (i, win, out[i])


@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    """encode->decode is the identity for any 8-bit RGB image shape; the
    encoder's cycling filters mean tall-enough images hit all five
    unfilter paths."""
    from feast_ray.stages.multimodal import decode_png, encode_png

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    w2, h2, out = decode_png(bytes(encode_png(px)))
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@given(
    sizes=group_sizes,
    drift=st.integers(min_value=-5, max_value=20),
    data=st.data(),
)
@settings(max_examples=120, deadline=None)
def test_cusum_prefix_identity_matches_recursion(sizes, drift, data):
    """The vectorized prefix identity S = C - min(0, running-min C) used by
    `stats.add_group_cusum` equals the textbook recursion
    S_i = max(0, S_{i-1} + x_i - k) for every group independently."""
    n = sum(sizes)
    xs = data.draw(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=n, max_size=n)
    )
    x = np.array(xs, dtype=np.int64)
    starts = _starts(sizes)
    # vectorized path (same arithmetic as the kernel)
    gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    d = x - drift
    C = np.cumsum(d)
    base = np.repeat(C[starts[:-1]] - d[starts[:-1]], sizes)
    C_rel = C - base
    import pandas as pd

    runmin = pd.Series(C_rel).groupby(gidx).cummin().to_numpy()
    got = C_rel - np.minimum(runmin, 0)
    # naive recursion
    want = np.empty(n, dtype=np.int64)
    for g in range(len(sizes)):
        s = 0
        for i in range(starts[g], starts[g + 1]):
            s = max(0, s + int(x[i]) - drift)
            want[i] = s
    assert (got == want).all()
