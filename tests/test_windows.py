"""Window kernels vs the pandas oracle on the seeded transcript fixture
(edge cases baked into the fixture: single-turn conv, duplicate ts, a conv
whose every gap equals the session threshold, hot conv, shuffled file order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from feast_ray.stages.windows import (
    Lag,
    Lead,
    RollingRows,
    RollingTime,
    Sessionize,
    add_window_features,
)
from tests.oracle import (
    oracle_lag_lead,
    oracle_rolling_rows,
    oracle_rolling_time,
    oracle_sessionize,
)
from tests.util import assert_frames_match

GAP_US = 1800 * 1_000_000
KEYCOLS = ["conv_id", "ts", "turn_idx"]


@pytest.fixture(scope="module")
def turns_with_value(transcripts_tbl) -> pa.Table:
    """Transcripts + a numeric column with some nulls (for agg nullness)."""
    rng = np.random.default_rng(7)
    n = transcripts_tbl.num_rows
    v = rng.normal(10.0, 3.0, n)
    mask = rng.random(n) < 0.1
    return transcripts_tbl.append_column("value", pa.array(v, mask=mask))


def _run(ray_session, tbl, specs):
    import ray.data as rd

    ds = rd.from_arrow(tbl)
    out = add_window_features(
        ds,
        key="conv_id",
        ts_col="ts",
        order_cols=["ts", "turn_idx"],
        specs=specs,
        num_buckets=5,
    )
    return out.to_pandas()


def test_lag_lead(ray_session, turns_with_value):
    got = _run(ray_session, turns_with_value, [Lag("value", 1), Lead("value", 1), Lag("value", 3)])
    want = oracle_lag_lead(
        turns_with_value.to_pandas(), key="conv_id", order=["ts", "turn_idx"], col="value", k=1
    )
    want3 = oracle_lag_lead(
        turns_with_value.to_pandas(), key="conv_id", order=["ts", "turn_idx"], col="value", k=3
    )
    assert_frames_match(got, want, row_key=KEYCOLS, cols=["lag1_value", "lead1_value"])
    assert_frames_match(got, want3, row_key=KEYCOLS, cols=["lag3_value"])


def test_lag_string_column(ray_session, turns_with_value):
    got = _run(ray_session, turns_with_value, [Lag("role", 1)])
    want = oracle_lag_lead(
        turns_with_value.to_pandas(), key="conv_id", order=["ts", "turn_idx"], col="role", k=1
    )
    assert_frames_match(got, want, row_key=KEYCOLS, cols=["lag1_role"])


def test_rolling_rows(ray_session, turns_with_value):
    spec = RollingRows(
        "value", 5, aggs=("count", "sum", "mean", "last", "min", "max", "std"), prefix="roll"
    )
    got = _run(ray_session, turns_with_value, [spec])
    want = oracle_rolling_rows(
        turns_with_value.to_pandas(), key="conv_id", order=["ts", "turn_idx"], col="value", k=5
    )
    assert_frames_match(
        got,
        want,
        row_key=KEYCOLS,
        cols=[f"roll_{a}" for a in ("count", "sum", "mean", "last", "min", "max", "std")],
        atol=1e-8,
        rtol=1e-8,
    )


def test_rolling_time(ray_session, turns_with_value):
    delta = 600 * 1_000_000
    spec = RollingTime(
        "value", delta, aggs=("count", "sum", "mean", "min", "max"), prefix="troll"
    )
    got = _run(ray_session, turns_with_value, [spec])
    want = oracle_rolling_time(
        turns_with_value.to_pandas(),
        key="conv_id",
        order=["ts", "turn_idx"],
        ts="ts",
        col="value",
        delta_us=delta,
    )
    assert_frames_match(
        got,
        want,
        row_key=KEYCOLS,
        cols=["troll_count", "troll_sum", "troll_mean", "troll_min", "troll_max"],
        atol=1e-8,
    )


def test_sessionize(ray_session, turns_with_value):
    got = _run(ray_session, turns_with_value, [Sessionize(GAP_US)])
    want = oracle_sessionize(
        turns_with_value.to_pandas(), key="conv_id", order=["ts", "turn_idx"], ts="ts", gap_us=GAP_US
    )
    assert_frames_match(got, want, row_key=KEYCOLS, cols=["session_id"])
    # conv-00000001 has every gap exactly == threshold -> one single session
    g = got[got["conv_id"] == "conv-00000001"]
    assert (g["session_id"] == 0).all()


def test_single_turn_conv(ray_session, turns_with_value):
    got = _run(
        ray_session,
        turns_with_value,
        [Lag("value", 1), RollingRows("value", 3, aggs=("count",), prefix="r"), Sessionize(GAP_US)],
    )
    g = got[got["conv_id"] == "conv-00000000"]
    assert len(g) == 1
    assert g["lag1_value"].isna().all()
    assert (g["session_id"] == 0).all()


def test_all_window_specs_one_pass(ray_session, turns_with_value):
    """The flagship property: every spec family computed in ONE shuffle."""
    specs = [
        Lag("value", 1),
        Lead("value", 2),
        RollingRows("value", 4, aggs=("count", "mean", "last")),
        RollingTime("value", 300 * 1_000_000, aggs=("count",)),
        Sessionize(GAP_US),
    ]
    got = _run(ray_session, turns_with_value, specs)
    assert len(got) == turns_with_value.num_rows
    for c in ["lag1_value", "lead2_value", "value_r4_count", "value_r4_mean",
              "value_r4_last", "session_id"]:
        assert c in got.columns


def test_text_byte_equality_under_stable_order(ray_session, transcripts_tbl):
    """Per-turn text equality under stable turn ordering (BASELINE.json:15)."""
    got = _run(ray_session, transcripts_tbl, [Sessionize(GAP_US)])
    got = got.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    want = (
        transcripts_tbl.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert (got["text"] == want["text"]).all()
    assert (got["turn_idx"] == want["turn_idx"]).all()


def test_expanding_and_row_number(ray_session, transcripts_tbl):
    """Expanding count/sum and row_number vs a pandas oracle."""
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import Expanding, RowNumber, add_window_features

    tbl = transcripts_tbl.append_column(
        "msg_len", pc.utf8_length(transcripts_tbl["text"]).cast(pa.int32())
    )
    got = (
        add_window_features(
            rd.from_arrow(tbl).repartition(4),
            key="conv_id",
            ts_col="ts",
            order_cols=["ts", "turn_idx"],
            specs=[RowNumber(), Expanding("msg_len", aggs=("count", "sum", "mean"))],
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = tbl.to_pandas().sort_values(["conv_id", "ts", "turn_idx"])
    g = pdf.groupby("conv_id")["msg_len"]
    pdf["row_number"] = g.cumcount() + 1
    pdf["cum_count"] = g.cumcount() + 1
    pdf["cum_sum"] = g.cumsum().astype(float)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["row_number"].tolist() == pdf["row_number"].tolist()
    assert got["msg_len_cum_count"].tolist() == pdf["cum_count"].tolist()
    assert np.allclose(got["msg_len_cum_sum"], pdf["cum_sum"])
    assert np.allclose(got["msg_len_cum_mean"], pdf["cum_sum"] / pdf["cum_count"])


def test_salt_and_stream_reject_full_history_specs(ray_session, transcripts_tbl):
    import pytest as _pytest
    import ray
    import ray.data as rd

    from feast_ray.stages.salt import salted_window_features
    from feast_ray.stages.windows import Expanding, RowNumber
    from feast_ray.state.turn_buffer import TurnShardActor

    ds = rd.from_arrow(transcripts_tbl)
    # Round 4: EVERY Expanding agg + RowNumber + Ewma run salted-exact via
    # the two-phase prefix repair (parity in test_salt.py); only genuinely
    # unknown aggs are rejected
    with _pytest.raises(ValueError, match="unknown Expanding aggs"):
        salted_window_features(
            ds, specs=[Expanding("turn_idx", aggs=("median",))], chunk_rows=64
        )
    got = salted_window_features(
        ds, specs=[RowNumber(name="rn")], chunk_rows=64
    ).to_pandas()
    assert len(got) == transcripts_tbl.num_rows and (got["rn"] >= 1).all()
    # the STREAMING shard actor still rejects full-history specs (its state
    # is bounded per conv; unbounded history stays a batch-path feature)
    a = TurnShardActor.remote([RowNumber()])
    with _pytest.raises(Exception):
        ray.get(a.stats.remote())
    ray.kill(a)


def test_hopping_window_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import hopping_window_agg

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 23, n),
            "ts": rng.integers(0, 10_000_000, n).astype("datetime64[us]"),
            "v": rng.integers(-50, 500, n),
        }
    )
    W, S = 1_000_000, 250_000
    out = (
        hopping_window_agg(rd.from_pandas(df), "k", "ts", "v", window_us=W, slide_us=S)
        .to_pandas()
        .sort_values(["k", "wstart"])
        .reset_index(drop=True)
    )
    us = df["ts"].astype("int64")
    rows = []
    for j in range(W // S):
        d = df.assign(wstart=(us // S - j) * S)
        rows.append(d)
    want = (
        pd.concat(rows)
        .groupby(["k", "wstart"])
        .agg(w_count=("v", "size"), w_sum=("v", "sum"))
        .reset_index()
        .sort_values(["k", "wstart"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    for c in ["k", "wstart", "w_count", "w_sum"]:
        assert (out[c].to_numpy() == want[c].to_numpy()).all(), c
    # membership property: every window covering an event's ts is present
    ev = df.iloc[0]
    base = int(ev["ts"].value // 1000) // S
    for j in range(W // S):
        assert ((out["k"] == ev["k"]) & (out["wstart"] == (base - j) * S)).any()


def test_hopping_window_rejects_bad_params(ray_session):
    import pandas as pd
    import pytest as _pt
    import ray.data as rd

    from feast_ray.stages.windows import hopping_window_agg

    df = pd.DataFrame({"k": [1], "ts": pd.to_datetime([0]), "v": [1]})
    with _pt.raises(ValueError):
        hopping_window_agg(rd.from_pandas(df), "k", "ts", "v", window_us=10, slide_us=3)


def test_densify_calendar_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import densify_calendar

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, 400),
            "day": rng.integers(100, 140, 400).astype(np.int64),
        }
    )
    # a single-day entity (span 1) and a sparse two-point entity
    df = pd.concat(
        [df, pd.DataFrame({"k": [100, 101, 101], "day": [7, 3, 25]})],
        ignore_index=True,
    )
    out = (
        densify_calendar(rd.from_pandas(df), "k", "day", count_name="n")
        .to_pandas()
        .sort_values(["k", "day"])
        .reset_index(drop=True)
    )
    want_rows = []
    for k, g in df.groupby("k"):
        vc = g["day"].value_counts()
        for d in range(g["day"].min(), g["day"].max() + 1):
            want_rows.append((k, d, int(vc.get(d, 0))))
    want = sorted(want_rows)
    assert list(map(tuple, out.itertuples(index=False))) == want
    # zero-filled gaps exist and per-group totals are preserved
    assert (out["n"] == 0).any()
    got_tot = out.groupby("k")["n"].sum()
    want_tot = df.groupby("k").size()
    assert (got_tot.loc[want_tot.index] == want_tot).all()


def test_funnel_steps_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import funnel_steps

    rng = np.random.default_rng(61)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "ts": rng.integers(0, 100_000, n).astype(np.int64),
            "et": rng.choice(["A", "B", "C", "x"], n, p=[0.2, 0.2, 0.1, 0.5]),
        }
    )
    # a group that can never convert (no C) and one that stalls at step 1
    df = pd.concat(
        [df, pd.DataFrame({"k": [99, 99, 98], "ts": [10, 20, 5],
                           "et": ["A", "B", "A"]})],
        ignore_index=True,
    )
    out = (
        funnel_steps(rd.from_pandas(df), "k", "ts", "et", ["A", "B", "C"])
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for k, g in df.groupby("k"):
        got = out.loc[k]
        want = []
        bound = -1
        ok = True
        for step in ["A", "B", "C"]:
            cand = g[(g["et"] == step) & (g["ts"] > bound)]
            if ok and len(cand):
                bound = int(cand["ts"].min())
                want.append(bound)
            else:
                ok = False
                want.append(None)
        for i, w in enumerate(want, start=1):
            gv = got[f"t_step_{i}"]
            assert (pd.isna(gv) and w is None) or gv == w, (k, i)
        assert bool(got["converted"]) == (want[2] is not None)
    # both outcomes exercised
    assert out["converted"].any() and (~out["converted"]).any()


def test_ewma_spec_in_fused_window_kernel(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import Ewma, Lag, RowNumber, add_window_features

    rng = np.random.default_rng(71)
    n = 1500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 19, n),
            "ts": np.arange(n, dtype=np.int64),
            "x": rng.normal(size=n),
        }
    )
    out = (
        add_window_features(
            rd.from_pandas(df), key="k", ts_col="ts", order_cols=["ts"],
            specs=[Ewma("x", alpha=0.5), Lag("x", 1), RowNumber()],
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "ts"])
        .groupby("k")["x"]
        .transform(lambda s: s.ewm(alpha=0.5, adjust=False).mean())
        .to_numpy()
    )
    np.testing.assert_allclose(out["ewma_x"].to_numpy(), want, rtol=1e-12)
    assert "lag1_x" in out.columns and "row_number" in out.columns
    with pytest.raises(Exception, match="alpha"):
        add_window_features(
            rd.from_pandas(df), key="k", ts_col="ts", order_cols=["ts"],
            specs=[Ewma("x", alpha=1.5)],
        ).materialize()


def test_salt_and_stream_reject_ewma(ray_session, transcripts_tbl):
    import pytest as _pytest
    import ray
    import ray.data as rd

    from feast_ray.stages.salt import salted_window_features
    from feast_ray.stages.windows import Ewma
    from feast_ray.state.turn_buffer import TurnShardActor

    ds = rd.from_arrow(transcripts_tbl)
    # Round 4: Ewma runs salted via the per-chunk linear-map scan — parity
    # vs the unsalted walk in test_salt.py; here just prove it executes
    got = salted_window_features(
        ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"],
        specs=[Ewma("turn_idx", alpha=0.5)], chunk_rows=10,
    ).to_pandas()
    assert len(got) == transcripts_tbl.num_rows
    # the streaming shard actor still rejects it (bounded per-conv state)
    a = TurnShardActor.remote(specs=[Ewma("turn_idx", alpha=0.5)])
    with _pytest.raises(Exception, match="full-history"):
        ray.get(a.__ray_ready__.remote())


def test_aggregation_adapter_compile():
    """Declarative Aggregation specs compile to merged window specs with
    declared output names; grid-slide and unknown functions are rejected."""
    import pytest

    from feast_ray.stages.windows import (
        Aggregation,
        Expanding,
        RollingTime,
        compile_aggregations,
    )

    specs, rename = compile_aggregations(
        [
            Aggregation("v", "sum", 60_000_000),
            Aggregation("v", "avg", 60_000_000),
            Aggregation("v", "count"),
        ]
    )
    assert len(specs) == 2  # same (col, window) merged
    rt = [s for s in specs if isinstance(s, RollingTime)][0]
    assert rt.delta_us == 60_000_000 and rt.aggs == ("sum", "mean")
    assert [s for s in specs if isinstance(s, Expanding)][0].aggs == ("count",)
    assert {n for outs in rename.values() for n in outs} == {
        "v_sum_60s", "v_avg_60s", "v_count"
    }

    # same (column, window, function) under two declared names: ONE physical
    # pass, both names present in the rename fan-out (ADVICE r03 medium)
    specs2, rename2 = compile_aggregations(
        [
            Aggregation("v", "sum", 60_000_000, name="a"),
            Aggregation("v", "sum", 60_000_000, name="b"),
        ]
    )
    assert len(specs2) == 1 and specs2[0].aggs == ("sum",)
    (outs,) = rename2.values()
    assert outs == ["a", "b"]

    with pytest.raises(ValueError, match="GRID"):
        compile_aggregations([Aggregation("v", "sum", 60_000_000, 10_000_000)])
    with pytest.raises(ValueError, match="not one of"):
        compile_aggregations([Aggregation("v", "median", 60_000_000)])
    with pytest.raises(ValueError, match="duplicate declared"):
        compile_aggregations(
            [Aggregation("v", "sum", 60_000_000, name="x"),
             Aggregation("v", "count", None, name="x")]
        )


def test_aggregation_adapter_end_to_end(ray_session):
    """Adapter output equals the directly-specified window features."""
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import (
        Aggregation,
        RollingTime,
        add_declared_aggregations,
        add_window_features,
    )

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime([10, 20, 200, 10, 15], unit="s"),
            "i": [1, 2, 3, 4, 5],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    got = (
        add_declared_aggregations(
            rd.from_pandas(df),
            key="k",
            ts_col="ts",
            order_cols=["ts", "i"],
            aggs=[Aggregation("v", "sum", 60_000_000, name="s60")],
        )
        .to_pandas()
        .sort_values("i")
    )
    want = (
        add_window_features(
            rd.from_pandas(df),
            key="k",
            ts_col="ts",
            order_cols=["ts", "i"],
            specs=[RollingTime("v", 60_000_000, aggs=("sum",), prefix="p")],
        )
        .to_pandas()
        .sort_values("i")
    )
    assert got["s60"].tolist() == want["p_sum"].tolist() == [1.0, 3.0, 3.0, 4.0, 9.0]


def test_rolling_discrete_quantile(ray_session, turns_with_value):
    """median/p25/p75 over a 5-row trailing window vs a pandas rolling
    oracle applying the quantile_disc rule (element at ceil(q*n)-1) on the
    non-null window values; nulls + group edges exercised by the fixture."""
    import pandas as pd

    k = 5
    got = _run(
        ray_session,
        turns_with_value,
        [RollingRows("value", k, aggs=("median", "p25", "p75"), prefix="q")],
    ).sort_values(KEYCOLS).reset_index(drop=True)

    df = turns_with_value.to_pandas().sort_values(KEYCOLS).reset_index(drop=True)

    def disc(win: pd.Series, q: float):
        vals = np.sort(win.dropna().to_numpy())
        if len(vals) == 0:
            return np.nan
        return vals[max(int(np.ceil(q * len(vals))) - 1, 0)]

    for q, col in [(0.5, "q_median"), (0.25, "q_p25"), (0.75, "q_p75")]:
        want = (
            df.groupby("conv_id", sort=False)["value"]
            .rolling(k, min_periods=1)
            .apply(lambda w, q=q: disc(w, q), raw=False)
            .reset_index(level=0, drop=True)
        )
        g = got[col].to_numpy()
        w = want.to_numpy()
        both_nan = np.isnan(g) & np.isnan(w)
        assert (both_nan | (g == w)).all(), col


def test_discrete_quantile_rejects_range_windows(ray_session, turns_with_value):
    from feast_ray.stages.windows import RollingTime, add_window_features
    import ray.data as rd

    ds = rd.from_arrow(turns_with_value)
    with pytest.raises(Exception, match="ROWS window"):
        add_window_features(
            ds,
            key="conv_id",
            ts_col="ts",
            order_cols=["ts", "turn_idx"],
            specs=[RollingTime("value", 60_000_000, aggs=("median",))],
        ).to_pandas()
