"""Unit tests for the bucketed grouped-execution core."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from feast_ray.grouped import (
    group_starts,
    grouped_map,
    hash_columns,
    sort_table,
    starts_to_group_index,
    starts_to_row_gstart,
)


def test_hash_deterministic(transcripts_tbl):
    h1 = hash_columns(transcripts_tbl, ["conv_id"])
    h2 = hash_columns(transcripts_tbl, ["conv_id"])
    assert (h1 == h2).all()
    # same key -> same hash
    conv = transcripts_tbl["conv_id"].to_pandas()
    df = conv.to_frame("c")
    df["h"] = h1
    assert (df.groupby("c")["h"].nunique() == 1).all()


def test_group_starts_matches_pandas(transcripts_tbl):
    t = sort_table(transcripts_tbl, ["conv_id", "ts", "turn_idx"])
    starts = group_starts(t, ["conv_id"])
    sizes = np.diff(starts)
    pdf = t.to_pandas()
    want = pdf.groupby("conv_id", sort=False).size().to_numpy()
    assert (sizes == want).all()
    gi = starts_to_group_index(starts)
    assert gi[0] == 0 and gi[-1] == len(sizes) - 1
    gs = starts_to_row_gstart(starts)
    assert (gs[starts[:-1]] == starts[:-1]).all()


def test_grouped_map_covers_all_groups(ray_session, transcripts_tbl):
    import ray.data as rd

    ds = rd.from_arrow(transcripts_tbl)

    def kernel(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        sizes = np.diff(starts)
        convs = tbl["conv_id"].combine_chunks().take(pa.array(starts[:-1]))
        return pa.table({"conv_id": convs, "n_turns": pa.array(sizes)})

    out = grouped_map(ds, ["conv_id"], kernel, sort_keys=["ts", "turn_idx"], num_buckets=7)
    pdf = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = (
        transcripts_tbl.to_pandas()
        .groupby("conv_id")
        .size()
        .rename("n_turns")
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert (pdf["conv_id"] == want["conv_id"]).all()
    assert (pdf["n_turns"] == want["n_turns"]).all()


def test_grouped_map_engines_agree(ray_session):
    """exchange (raw-task) and dataset (groupby.map_groups) engines produce
    identical rows for the same kernel."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import numpy as np
    from feast_ray.grouped import grouped_map

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": [f"g{i}" for i in rng.integers(0, 25, 500)],
            "ts": rng.integers(0, 1000, 500).astype("int64"),
            "v": rng.normal(size=500),
        }
    )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        v = t["v"].to_numpy()
        # per-group running count (order-sensitive => exercises the sort)
        sizes = np.diff(starts)
        rc = np.arange(len(v)) - np.repeat(starts[:-1], sizes) + 1
        return t.append_column("rc", pa.array(rc.astype(np.int64)))

    outs = {}
    for eng in ("exchange", "dataset"):
        outs[eng] = (
            grouped_map(rd.from_pandas(df), ["k"], kernel, sort_keys=["ts"],
                        num_buckets=4, engine=eng)
            .to_pandas()
            .sort_values(["k", "ts", "v"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["exchange"], outs["dataset"])


def test_grouped_map_single_bucket(ray_session):
    """num_buckets=1 is clamped to the minimum exchange shape and still
    groups correctly (Ray does not unpack single-return lists)."""
    import pandas as pd
    import pyarrow as pa
    import numpy as np
    import ray.data as rd

    from feast_ray.grouped import grouped_map

    df = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})

    def kern(t, starts):
        sizes = np.diff(starts)
        return t.append_column("n", pa.array(np.repeat(sizes, sizes).astype(np.int64)))

    out = grouped_map(rd.from_pandas(df), ["k"], kern, num_buckets=1).to_pandas()
    assert sorted(out["n"].tolist()) == [1, 2, 2, 2, 2]


def test_grouped_map_zero_total_rows_keeps_schema(ray_session):
    """Upstream blocks that exist but hold ZERO rows must still yield the
    kernel's typed output schema (ray 2.49's from_arrow_refs drops
    empty-block schemas; the exchange detects the 0-row case from bundle
    metadata and runs the kernel on a typed empty instead)."""
    import pyarrow.compute as pc
    import ray.data as rd

    tbl = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([1.0, 2.0])})
    ds = rd.from_arrow(tbl).map_batches(
        lambda t: t.filter(pc.greater(t["v"], 100.0)),  # filters ALL rows out
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def kern(t, starts):
        import numpy as np

        sizes = np.diff(starts) if len(starts) > 1 else np.array([], dtype=np.int64)
        return pa.table(
            {"k": t["k"], "n": pa.array(np.repeat(sizes, sizes), pa.int64())}
        )

    out = grouped_map(ds, ["k"], kern, num_buckets=2)
    sch = out.schema(fetch_if_missing=True)
    assert sch is not None and sch.names == ["k", "n"]
    assert out.count() == 0


def test_infer_schema_local_matches_probe(ray_session):
    """Plan-time local schema simulation must agree with Ray's own answer
    for read→map_batches→select chains (the shapes every engine stage
    feeds the exchange)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from feast_ray.grouped import _infer_schema_local

    ds = rd.from_arrow(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])})
    )
    mapped = ds.map_batches(
        lambda t: t.append_column("c", pc.add(t["a"], 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["a", "c"])
    sch = _infer_schema_local(mapped)
    assert sch is not None
    assert sch.names == ["a", "c"]
    assert sch.field("c").type == pa.int64()
    # simulation must bail (not guess) on shapes it can't run locally
    pandas_stage = ds.map_batches(lambda df: df, batch_format="pandas")
    assert _infer_schema_local(pandas_stage) is None
