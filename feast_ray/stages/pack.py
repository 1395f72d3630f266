"""Greedy sequence packing: assign ordered items to consecutive bins of a
fixed size budget — the training-batch construction step of an LLM data
pipeline (pack documents into fixed-token-budget training sequences).

Semantics (per group, items visited in ``order_cols`` order): an item joins
the current bin unless that would push the bin's size sum over ``budget``,
in which case it starts a new bin.  The first item of a group always opens
bin 0; an item alone larger than the budget occupies a bin by itself.  This
is the standard greedy next-fit packing — deterministic, streaming, and the
one whose bin assignment a SQL twin can replay exactly (recursive CTE
advancing one rank per step).  Beyond the reference: Feast has no packing
concept.

Distribution: groups are the packing domains (e.g. ``doc_id % P`` shards,
or conversations).  One grouped exchange co-locates and orders each domain;
the kernel then walks BINS, not rows — each iteration closes one bin in
EVERY still-active group at once via a single searchsorted over
group-rebased prefix sums.  Python-level iteration count = max bins in any
group of the bucket, each O(active_groups · log n) — pick the shard count
so per-shard bin counts stay modest (P ≈ total_size / (budget · target
bins-per-shard)); rows inside bins are assigned by one cumsum, never
touched in the loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from feast_ray.grouped import grouped_map, starts_to_row_gstart


def pack_kernel(size_col: str, budget: int, bin_col: str):
    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(bin_col, pa.array([], type=pa.int64()))
        sizes = (
            t[size_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if (sizes < 0).any():
            raise ValueError(f"{size_col} must be non-negative")
        gstart = starts_to_row_gstart(starts)
        cum = np.cumsum(sizes)
        base = np.where(gstart > 0, cum[np.maximum(gstart - 1, 0)], 0)
        S = cum - base  # inclusive prefix sum, rebased per group
        sizes_total = S[starts[1:] - 1] if len(starts) > 1 else np.zeros(0, np.int64)
        offset = int(sizes_total.max() if len(sizes_total) else 0) + budget + 1
        n_groups = len(starts) - 1
        if n_groups * offset >= 2**62:
            raise ValueError(
                "group sizes too large for the packed searchsorted key space; "
                "shard the packing domain finer"
            )
        gidx = np.repeat(np.arange(n_groups, dtype=np.int64), np.diff(starts))
        skey = gidx * offset + S

        marker = np.zeros(n, dtype=np.int64)
        cur = starts[:-1].copy()  # current bin's first row, per group
        end = starts[1:]
        active = cur < end
        while active.any():
            c = cur[active]
            marker[c] = 1
            # prefix sum before the bin's first row, within the group
            prev = np.where(c > gstart[c], S[np.maximum(c - 1, 0)], 0)
            g = gidx[c]
            nxt = np.searchsorted(skey, g * offset + prev + budget, side="right")
            nxt = np.minimum(nxt, end[active])
            nxt = np.maximum(nxt, c + 1)  # oversized single item: own bin
            cur[active] = nxt
            active = cur < end

        inc = np.cumsum(marker)
        bins = inc - inc[gstart]  # group start is always a boundary -> 0-based
        return t.append_column(bin_col, pa.array(bins))

    return kernel


def greedy_pack(
    ds,
    *,
    group_keys: str | Sequence[str],
    size_col: str,
    order_cols: Sequence[str],
    budget: int,
    bin_col: str = "bin",
    num_buckets: Optional[int] = None,
):
    """Append a 0-based ``bin_col``: the greedy next-fit bin of each row
    within its group under ``budget`` (see module docstring)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    return grouped_map(
        ds,
        keys,
        pack_kernel(size_col, budget, bin_col),
        sort_keys=list(order_cols),
        num_buckets=num_buckets,
    )
