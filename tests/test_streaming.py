"""Streaming-ingest turn buffers (T3): per-prefix output must equal the
batch path; state bounded; misuse rejected."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from feast_ray.fixtures import gen_transcripts
from feast_ray.grouped import sort_table
from feast_ray.stages.windows import Lag, Lead, RollingRows, Sessionize, add_window_features

SPECS = [
    Lag("msg_len", 1),
    RollingRows("msg_len", 5, aggs=("count", "sum", "mean", "last")),
    Sessionize(1800 * 1_000_000),
]


@pytest.fixture(scope="module")
def transcripts():
    tbl = gen_transcripts(n_convs=40, mean_turns=12, seed=5, n_hot=2, hot_turns=150)
    return tbl.append_column("msg_len", pc.utf8_length(tbl["text"]).cast(pa.int32()))


def test_stream_equals_batch(ray_session, transcripts):
    import ray.data as rd

    from feast_ray.state.turn_buffer import StreamingTurnPipeline

    want = (
        add_window_features(
            rd.from_arrow(transcripts).repartition(4),
            key="conv_id",
            ts_col="ts",
            order_cols=["ts", "turn_idx"],
            specs=SPECS,
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    st = sort_table(transcripts, ["ts", "conv_id", "turn_idx"])
    pipe = StreamingTurnPipeline(SPECS, num_shards=3)
    outs = [pipe.ingest(st.slice(i, 101)) for i in range(0, st.num_rows, 101)]
    pipe.shutdown()
    got = (
        pa.concat_tables([o for o in outs if o.num_rows])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in [
        "lag1_msg_len",
        "msg_len_r5_count",
        "msg_len_r5_sum",
        "msg_len_r5_mean",
        "msg_len_r5_last",
        "session_id",
    ]:
        gv, wv = got[c], want[c]
        if pd.api.types.is_float_dtype(wv):
            ga, wa = gv.to_numpy(dtype=float), wv.to_numpy(dtype=float)
            assert ((np.isnan(ga) & np.isnan(wa)) | np.isclose(ga, wa, equal_nan=True)).all(), c
        else:
            assert gv.where(gv.notna(), None).tolist() == wv.where(wv.notna(), None).tolist(), c


def test_stream_state_is_bounded(ray_session, transcripts):
    from feast_ray.state.turn_buffer import StreamingTurnPipeline

    st = sort_table(transcripts, ["ts", "conv_id", "turn_idx"])
    pipe = StreamingTurnPipeline(SPECS, num_shards=2, overlap_rows=4)
    for i in range(0, st.num_rows, 200):
        pipe.ingest(st.slice(i, 200))
    stats = pipe.stats()
    pipe.shutdown()
    n_convs = len(set(transcripts["conv_id"].to_pylist()))
    assert sum(s["buffered_rows"] for s in stats) <= 4 * n_convs


def test_stream_rejects_lead(ray_session):
    import ray

    from feast_ray.state.turn_buffer import TurnShardActor

    a = TurnShardActor.remote([Lead("msg_len", 1)])
    with pytest.raises(Exception):
        ray.get(a.ingest.remote(pa.table({"conv_id": ["a"]})))
    ray.kill(a)


def test_eviction_requires_gap_cover(ray_session):
    import ray

    from feast_ray.state.turn_buffer import TurnShardActor

    a = TurnShardActor.remote(SPECS, evict_idle_us=1)  # < session gap
    with pytest.raises(Exception):
        ray.get(a.stats.remote())  # constructor error surfaces on first call
    ray.kill(a)


def test_replay_distributed_equals_driver_feed(ray_session, transcripts_tbl):
    """The distributed per-shard feeders must produce exactly the driver-fed
    router's output (same actors, same stream contract)."""
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.windows import Lag, RollingRows, Sessionize
    from feast_ray.state.turn_buffer import StreamingTurnPipeline, replay_distributed

    specs = [Lag("msg_len", 1), RollingRows("msg_len", 3, aggs=("count", "last")),
             Sessionize(1800 * 1_000_000)]
    tbl = transcripts_tbl.append_column(
        "msg_len",
        pa.array([len(s) for s in transcripts_tbl["text"].to_pylist()], pa.int64()),
    )
    dist = (
        replay_distributed(
            specs, rd.from_arrow(tbl), key="conv_id", ts_col="ts",
            num_shards=3, batch_size=512, order_cols=("ts", "turn_idx"),
        )
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    pipe = StreamingTurnPipeline(specs, num_shards=3, key="conv_id",
                                 order_cols=("ts", "turn_idx"))
    srt = tbl.take(
        pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")])
    )
    outs = []
    for lo in range(0, srt.num_rows, 512):
        out = pipe.ingest(srt.slice(lo, 512).combine_chunks())
        if out.num_rows:
            outs.append(out)
    pipe.shutdown()
    drv = (
        pa.concat_tables(outs)
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(dist) == len(drv)
    for c in drv.columns:
        dv, gv = drv[c], dist[c]
        if pd.api.types.is_float_dtype(dv):
            import numpy as np
            assert np.allclose(gv.astype(float), dv.astype(float), equal_nan=True), c
        else:
            assert gv.where(gv.notna(), None).tolist() == dv.where(dv.notna(), None).tolist(), c
