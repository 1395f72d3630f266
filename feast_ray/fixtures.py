"""Deterministic synthetic fixtures (FIXTURES.md): the authoritative
transcripts table (BASELINE.json:15 shape), a derived numeric feature table,
and entity x timestamp spines.  Seeded, fully vectorized, no wall clock —
identical bytes on every run (required for resume tests and golden
comparisons; FIXTURES.md §1-3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = np.int64(1_700_000_000_000_000)  # 2023-11-14T22:13:20Z, arbitrary fixed base
US = 1_000_000


def _grouped_cumsum(vals: np.ndarray, starts: np.ndarray) -> np.ndarray:
    sizes = np.diff(starts)
    cs = np.cumsum(vals)
    return cs - np.repeat(cs[starts[:-1]] - vals[starts[:-1]], sizes)


def gen_transcripts(
    n_convs: int = 200,
    mean_turns: int = 16,
    seed: int = 42,
    session_gap_s: int = 1800,
    n_hot: int = 2,
    hot_turns: int = 400,
    shuffle: bool = True,
) -> pa.Table:
    """Transcripts with skewed conv sizes, session-gap mixture, duplicate-ts
    ties, a single-turn conv, a conv whose every gap == the session threshold,
    and shuffled row order (the engine must not rely on file order)."""
    rng = np.random.default_rng(seed)

    sizes = np.clip(rng.lognormal(np.log(mean_turns), 0.8, n_convs).astype(np.int64), 1, None)
    sizes[0] = 1  # single-turn conv
    if n_convs > 1:
        sizes[1] = 6  # the exact-gap conv
    if n_hot and n_convs > 2 + n_hot:
        sizes[-n_hot:] = hot_turns  # hot conversations (skew)
    n = int(sizes.sum())
    starts = np.concatenate(([0], np.cumsum(sizes)))
    conv_ord = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    turn_idx = (np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], sizes)).astype(np.int32)

    # timestamps: per-conv start + grouped cumsum of mixture gaps (seconds)
    t0 = EPOCH_US + rng.integers(0, 30 * 86400, n_convs) * US
    gaps = rng.uniform(1.0, 600.0, n)
    long_mask = rng.random(n) < 0.08
    gaps[long_mask] = rng.uniform(session_gap_s + 1, 4 * session_gap_s, int(long_mask.sum()))
    zero_mask = rng.random(n) < 0.02
    gaps[zero_mask] = 0.0  # duplicate ts within a conv (tie cases)
    gaps_us = (gaps * US).astype(np.int64)
    gaps_us[starts[:-1]] = 0
    if n_convs > 1:  # conv 1: every gap exactly equals the session threshold
        lo, hi = starts[1], starts[2]
        gaps_us[lo:hi] = session_gap_s * US
        gaps_us[lo] = 0
    ts = np.repeat(t0, sizes) + _grouped_cumsum(gaps_us, starts)

    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = (rng.random(n) < 0.12) & (turn_idx > 0)
    roles[tool_mask] = "tool"

    tool = np.full(n, None, dtype=object)
    tool_kind = rng.random(n)
    tool[tool_mask & (tool_kind < 0.5)] = "search"
    tool[tool_mask & (tool_kind >= 0.5)] = "python"
    asst = (roles == "assistant") & (rng.random(n) < 0.2)
    tool[asst] = "none"

    conv_str = np.char.add("conv-", np.char.zfill(conv_ord.astype("U8"), 8))
    filler_code = (conv_ord * 2654435761 + turn_idx * 97 + 13) % 9973
    text = np.char.add(
        np.char.add(np.char.add("c", conv_ord.astype("U8")), np.char.add(" t", turn_idx.astype("U8"))),
        np.char.add(" tok", filler_code.astype("U8")),
    )

    order = rng.permutation(n) if shuffle else np.arange(n)
    tbl = pa.table(
        {
            "conv_id": pa.array(conv_str[order]),
            "turn_idx": pa.array(turn_idx[order], type=pa.int32()),
            "role": pa.array(roles[order].astype("U16")),
            "text": pa.array(text[order]),
            "tool": pa.array(tool[order], type=pa.string()),
            "ts": pa.array(ts[order], type=pa.int64()).cast(pa.timestamp("us", tz="UTC")),
        }
    )
    return tbl


def gen_features_numeric(transcripts: pa.Table, seed: int = 43) -> pa.Table:
    """Per-turn numeric feature rows derived from transcripts, with a
    created_ts tie-break column and injected duplicate-event_ts rows
    (FIXTURES.md §3)."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    n = transcripts.num_rows
    conv = transcripts["conv_id"]
    ts = transcripts["ts"]
    msg_len = pc.utf8_length(transcripts["text"]).cast(pa.int32())
    value = rng.normal(100.0, 25.0, n)
    delay_us = rng.integers(0, 5 * US, n)
    ts_us = ts.cast(pa.int64()).to_numpy()
    created = ts_us + delay_us

    # inject duplicates: same (conv_id, ts), later created_ts, different value
    dup = rng.random(n) < 0.05
    dup_idx = np.flatnonzero(dup)
    cols = {
        "conv_id": pa.concat_arrays(
            [conv.combine_chunks(), conv.combine_chunks().take(pa.array(dup_idx))]
        ),
        "ts": pa.array(np.concatenate([ts_us, ts_us[dup_idx]])).cast(
            pa.timestamp("us", tz="UTC")
        ),
        "created_ts": pa.array(
            np.concatenate([created, created[dup_idx] + 10 * US])
        ).cast(pa.timestamp("us", tz="UTC")),
        "msg_len": pa.concat_arrays(
            [msg_len.combine_chunks(), msg_len.combine_chunks().take(pa.array(dup_idx))]
        ),
        "value": pa.array(np.concatenate([value, value[dup_idx] + 1000.0])),
    }
    return pa.table(cols)


def gen_spine(transcripts: pa.Table, seed: int = 44) -> pa.Table:
    """Spine variants in one table (FIXTURES.md §2): every-turn rows, rows
    strictly between turn timestamps, rows before any turn (all-null case),
    and duplicated rows (multiplicity preservation)."""
    rng = np.random.default_rng(seed)
    conv = transcripts["conv_id"].combine_chunks()
    ts_us = transcripts["ts"].cast(pa.int64()).to_numpy()
    turn = transcripts["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(ts_us)

    between = rng.random(n) < 0.3
    bi = np.flatnonzero(between)
    early = rng.random(n) < 0.02
    ei = np.flatnonzero(early)
    dupd = rng.random(n) < 0.05
    di = np.flatnonzero(dupd)

    parts_conv = [conv, conv.take(pa.array(bi)), conv.take(pa.array(ei)), conv.take(pa.array(di))]
    parts_ts = [
        ts_us,
        ts_us[bi] + rng.integers(1, 900 * US, len(bi)),
        ts_us[ei] - np.int64(90) * 86400 * US,
        ts_us[di],
    ]
    parts_turn = [turn, turn[bi], turn[ei], turn[di]]
    return pa.table(
        {
            "conv_id": pa.concat_arrays(parts_conv),
            "ts": pa.array(np.concatenate(parts_ts)).cast(pa.timestamp("us", tz="UTC")),
            "turn_idx": pa.array(np.concatenate(parts_turn).astype(np.int32)),
        }
    )


def write_fixture_dir(out_dir: str, n_convs: int = 200, seed: int = 42, **kw) -> dict:
    """Write transcripts / features_numeric / spine parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tr = gen_transcripts(n_convs=n_convs, seed=seed, **kw)
    fx = gen_features_numeric(tr, seed=seed + 1)
    sp = gen_spine(tr, seed=seed + 2)
    paths = {}
    for name, tbl in [("transcripts", tr), ("features_numeric", fx), ("spine", sp)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
