"""Latest-per-entity (A6) vs oracle, incl. window filter and tie-breaks."""

from __future__ import annotations

import pandas as pd

from feast_ray.stages.latest import latest_per_entity
from tests.oracle import oracle_latest_per_entity
from tests.util import assert_frames_match


def test_latest_per_entity(ray_session, features_tbl):
    import ray.data as rd

    got = latest_per_entity(
        rd.from_arrow(features_tbl),
        keys="conv_id",
        ts_col="ts",
        created_ts_col="created_ts",
        tie_break_cols=["value"],
        num_buckets=5,
    )
    want = oracle_latest_per_entity(
        features_tbl.to_pandas(),
        key="conv_id",
        ts="ts",
        created_ts="created_ts",
        tie_break=["value"],
    )
    assert_frames_match(
        got, want, row_key=["conv_id"], cols=["ts", "created_ts", "msg_len", "value"]
    )


def test_latest_with_window(ray_session, features_tbl):
    import ray.data as rd

    pdf = features_tbl.to_pandas()
    lo = pdf["ts"].quantile(0.25)
    hi = pdf["ts"].quantile(0.75)
    lo = pd.Timestamp(lo).to_pydatetime()
    hi = pd.Timestamp(hi).to_pydatetime()
    got = latest_per_entity(
        rd.from_arrow(features_tbl),
        keys="conv_id",
        ts_col="ts",
        created_ts_col="created_ts",
        tie_break_cols=["value"],
        start=lo,
        end=hi,
        num_buckets=5,
    )
    want = oracle_latest_per_entity(
        pdf, key="conv_id", ts="ts", created_ts="created_ts", tie_break=["value"],
        start=lo, end=hi,
    )
    assert_frames_match(
        got, want, row_key=["conv_id"], cols=["ts", "created_ts", "msg_len", "value"]
    )


def test_topk_per_entity_matches_pandas(ray_session, transcripts_tbl):
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.latest import topk_per_entity

    got = (
        topk_per_entity(
            rd.from_arrow(transcripts_tbl).repartition(4),
            keys="conv_id",
            ts_col="ts",
            k=2,
            tie_break_cols=["turn_idx"],
        )
        .to_pandas()
        .sort_values(["conv_id", "recency_rank"])
        .reset_index(drop=True)
    )
    pdf = transcripts_tbl.to_pandas().sort_values(
        ["conv_id", "ts", "turn_idx"], ascending=[True, False, False]
    )
    pdf["recency_rank"] = pdf.groupby("conv_id").cumcount() + 1
    want = (
        pdf[pdf["recency_rank"] <= 2]
        .sort_values(["conv_id", "recency_rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["recency_rank"].tolist() == want["recency_rank"].tolist()
