"""Fixture generator: shape, determinism, edge-case presence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from feast_ray.fixtures import gen_features_numeric, gen_spine, gen_transcripts
from feast_ray.specs import TRANSCRIPT_SCHEMA


def test_schema_matches_input_hint(transcripts_tbl):
    assert transcripts_tbl.schema.equals(TRANSCRIPT_SCHEMA)


def test_deterministic():
    a = gen_transcripts(n_convs=30, seed=42)
    b = gen_transcripts(n_convs=30, seed=42)
    assert a.equals(b)
    fa, fb = gen_features_numeric(a), gen_features_numeric(b)
    assert fa.equals(fb)
    sa, sb = gen_spine(a), gen_spine(b)
    assert sa.equals(sb)


def test_edge_cases_present(transcripts_tbl):
    pdf = transcripts_tbl.to_pandas()
    sizes = pdf.groupby("conv_id").size()
    assert sizes["conv-00000000"] == 1  # single-turn conv
    assert sizes.max() >= 100  # hot conv
    # duplicate ts within some conv
    dup = pdf.groupby(["conv_id", "ts"]).size()
    assert (dup > 1).any()
    # per-conv ts monotone under turn order
    s = pdf.sort_values(["conv_id", "turn_idx"])
    diffs = s.groupby("conv_id")["ts"].diff().dropna()
    assert (diffs >= np.timedelta64(0, "us")).all()


def test_spine_has_miss_rows(spine_tbl, transcripts_tbl):
    min_ts = transcripts_tbl["ts"].cast(pa.int64()).to_pandas().min()
    sp = spine_tbl.to_pandas()
    assert (sp["ts"].astype("int64") < min_ts).any()  # before-any-turn rows
    assert sp.duplicated(["conv_id", "ts", "turn_idx"]).any()  # duplicated rows
