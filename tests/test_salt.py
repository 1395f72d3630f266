"""Salted-key splitting (hot conversations): salted path must equal the
unsalted path exactly — including cross-chunk session ids — per the overlap
contract in feast_ray/stages/salt.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from feast_ray.fixtures import gen_transcripts
from feast_ray.stages.salt import required_overlap, salted_window_features
from feast_ray.stages.windows import (
    Lag,
    Lead,
    RollingRows,
    RollingTime,
    Sessionize,
    add_window_features,
)

SPECS = [
    Lag("msg_len", 1),
    Lead("msg_len", 1),
    RollingRows("msg_len", 5, aggs=("count", "sum", "mean", "last")),
    RollingTime("msg_len", 5 * 1_000_000, aggs=("count", "mean")),
    Sessionize(1800 * 1_000_000),
]


@pytest.fixture(scope="module")
def hot_ds(ray_session):
    import ray.data as rd

    tbl = gen_transcripts(n_convs=40, mean_turns=15, seed=9, n_hot=3, hot_turns=300)
    tbl = tbl.append_column("msg_len", pc.utf8_length(tbl["text"]).cast(pa.int32()))
    return rd.from_arrow(tbl).repartition(5)


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        if c in ("text", "tool"):
            continue
        assert c in got.columns, c
        gv, wv = got[c], want[c]
        if pd.api.types.is_float_dtype(wv):
            ga, wa = gv.to_numpy(dtype=float), wv.to_numpy(dtype=float)
            assert ((np.isnan(ga) & np.isnan(wa)) | np.isclose(ga, wa, equal_nan=True)).all(), c
        else:
            assert gv.where(gv.notna(), None).tolist() == wv.where(wv.notna(), None).tolist(), c


def test_salted_equals_unsalted(ray_session, hot_ds):
    want = add_window_features(
        hot_ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=SPECS
    ).to_pandas()
    got = salted_window_features(
        hot_ds,
        specs=SPECS,
        chunk_rows=64,
        overlap_rows=32,
    ).to_pandas()
    _cmp(got, want)


def test_salted_without_sessionize_single_phase(ray_session, hot_ds):
    specs = [Lag("msg_len", 2), RollingRows("msg_len", 3, aggs=("mean",))]
    want = add_window_features(
        hot_ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=specs
    ).to_pandas()
    got = salted_window_features(hot_ds, specs=specs, chunk_rows=50, overlap_rows=4).to_pandas()
    _cmp(got, want)


def test_required_overlap():
    assert required_overlap([Lag("x", 3)]) == 3
    assert required_overlap([RollingRows("x", 5)]) == 4
    assert required_overlap([Sessionize(10)]) == 1
    assert required_overlap([RollingTime("x", 100)], time_rows_bound=7) == 7


def test_overlap_must_fit_chunk(ray_session, hot_ds):
    with pytest.raises(ValueError):
        salted_window_features(hot_ds, specs=SPECS, chunk_rows=8, overlap_rows=8)


def test_salted_rolling_corr_zscore_equal_unsalted(ray_session, hot_ds):
    """Salted twins of the round-2/3 window ops must equal the unsalted
    kernels exactly (same kernel object, overlap = k-1)."""
    from feast_ray.stages.salt import salted_rolling_corr, salted_rolling_zscore
    from feast_ray.stages.stats import add_group_rolling_corr, add_group_rolling_zscore

    k = 7
    want = add_group_rolling_corr(
        hot_ds, "conv_id", "msg_len", "turn_idx",
        k=k, order_cols=["ts", "turn_idx"], out_col="rc",
    ).to_pandas()
    got = salted_rolling_corr(
        hot_ds, "conv_id", "msg_len", "turn_idx",
        k=k, chunk_rows=40, order_cols=["ts", "turn_idx"], out_col="rc",
    ).to_pandas()
    _cmp(got, want)

    want = add_group_rolling_zscore(
        hot_ds, "conv_id", "msg_len",
        k=k, order_cols=["ts", "turn_idx"], out_col="rz",
    ).to_pandas()
    got = salted_rolling_zscore(
        hot_ds, "conv_id", "msg_len",
        k=k, chunk_rows=40, order_cols=["ts", "turn_idx"], out_col="rz",
    ).to_pandas()
    _cmp(got, want)


def test_salted_expanding_extrema_equal_unsalted(ray_session, hot_ds):
    """Running extrema + cumulative count/sum under salting: chunk-local
    expanding + the two-phase prefix repair must equal the unsalted path,
    including when mixed with bounded specs and Sessionize."""
    from feast_ray.stages.windows import Expanding

    specs = [
        Lag("msg_len", 1),
        Expanding("msg_len", aggs=("count", "sum", "min", "max"), prefix="run"),
        Sessionize(1800 * 1_000_000),
    ]
    want = add_window_features(
        hot_ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=specs
    ).to_pandas()
    got = salted_window_features(
        hot_ds, specs=specs, chunk_rows=40, overlap_rows=4
    ).to_pandas()
    _cmp(got, want)


def test_salted_expanding_min_only_no_sessions(ray_session, hot_ds):
    """min/max-only expanding (no count requested, no Sessionize) exercises
    the internal-count drop and the expanding-only phase-2 path."""
    from feast_ray.stages.windows import Expanding

    specs = [Expanding("msg_len", aggs=("min", "max"), prefix="run")]
    want = add_window_features(
        hot_ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=specs
    ).to_pandas()
    got = salted_window_features(
        hot_ds, specs=specs, chunk_rows=32, overlap_rows=2
    ).to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    _cmp(got, want)


def test_salted_expanding_extrema_through_all_null_chunk(ray_session):
    """ADVICE r03 (high): an entity whose middle salt chunk is ALL null must
    still carry the running min/max from earlier chunks into later ones —
    NaN chunk aggregates must not poison the prefix cummin/cummax."""
    import ray.data as rd

    from feast_ray.stages.windows import Expanding

    n = 120  # 3 chunks at chunk_rows=40; chunk 1 entirely null
    vals: list = list(range(61, 101)) + [None] * 40 + list(range(580, 620))
    tbl = pa.table(
        {
            "conv_id": pa.array(["hot"] * n + ["cold"] * 3),
            "turn_idx": pa.array(list(range(n)) + [0, 1, 2], type=pa.int32()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)]
                + [1_700_000_000_000_000, 1_700_000_001_000_000, 1_700_000_002_000_000],
                type=pa.timestamp("us"),
            ),
            "val": pa.array(vals + [7, None, 3], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    specs = [Expanding("val", aggs=("count", "sum", "min", "max"), prefix="run")]
    want = add_window_features(
        ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=specs
    ).to_pandas()
    got = salted_window_features(
        ds, specs=specs, chunk_rows=40, overlap_rows=4
    ).to_pandas()
    # pin the regression shape explicitly: every chunk-2 row's running min is 61
    hot2 = got[(got.conv_id == "hot") & (got.turn_idx >= 80)]
    assert (hot2["run_min"] == 61).all()
    assert (hot2["run_max"].to_numpy() == np.arange(580, 620)).all()
    # and chunk-1 (null) rows keep chunk-0's extrema
    hot1 = got[(got.conv_id == "hot") & (got.turn_idx >= 40) & (got.turn_idx < 80)]
    assert (hot1["run_min"] == 61).all() and (hot1["run_max"] == 100).all()
    _cmp(got, want)


def test_salted_rolling_time_bound_violation_raises(ray_session):
    """VERDICT r03 #3: a violated RollingTime rate bound must fail LOUDLY —
    120 rows 1 s apart with delta=50 s puts ~51 rows in one window; with
    overlap_rows=5 the boundary windows would silently truncate, so the
    in-kernel guard raises."""
    import ray.data as rd

    n = 120
    tbl = pa.table(
        {
            "conv_id": pa.array(["hot"] * n),
            "turn_idx": pa.array(range(n), type=pa.int32()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)],
                type=pa.timestamp("us"),
            ),
            "val": pa.array(range(n), type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)
    specs = [RollingTime("val", 50 * 1_000_000, aggs=("count", "mean"))]
    # the raw-task exchange launches reduce tasks eagerly, so the guard can
    # surface at build OR at materialize — accept either
    with pytest.raises(Exception, match="rate bound violated"):
        salted_window_features(
            ds, specs=specs, chunk_rows=20, overlap_rows=5
        ).materialize()
    # the same data under a SUFFICIENT overlap passes and matches unsalted
    from feast_ray.stages.windows import add_window_features as awf

    want = awf(
        ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=specs
    ).to_pandas()
    got = salted_window_features(
        ds, specs=specs, chunk_rows=60, overlap_rows=51
    ).to_pandas()
    _cmp(got, want)


def test_salted_full_spec_family_equals_unsalted(ray_session, hot_ds):
    """Round 4: EVERY window spec now runs under hot-entity salting —
    Expanding mean/std/last (derived from repaired prims), RowNumber
    (row-count offsets) and Ewma (per-chunk linear-map scan) must match
    the unsalted path (floats via isclose — chunk combination reassociates
    float sums)."""
    from feast_ray.stages.windows import Ewma, Expanding, RowNumber

    specs = [
        Lag("msg_len", 1),
        Expanding(
            "msg_len",
            aggs=("count", "sum", "mean", "std", "min", "max", "last"),
            prefix="run",
        ),
        RowNumber(name="rn"),
        Ewma("msg_len", alpha=0.25, name="ew"),
        Sessionize(1800 * 1_000_000),
    ]
    want = add_window_features(
        hot_ds, key="conv_id", ts_col="ts", order_cols=["ts", "turn_idx"], specs=specs
    ).to_pandas()
    got = salted_window_features(
        hot_ds, specs=specs, chunk_rows=40, overlap_rows=4
    ).to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    _cmp(got, want)


def test_salted_expanding_unknown_agg_rejected(ray_session, hot_ds):
    from feast_ray.stages.windows import Expanding

    with pytest.raises(ValueError, match="unknown Expanding aggs"):
        salted_window_features(
            hot_ds,
            specs=[Expanding("msg_len", aggs=("median",))],
            chunk_rows=32,
            overlap_rows=2,
        )
