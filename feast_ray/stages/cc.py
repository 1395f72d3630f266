"""Distributed connected components over an edge list — duplicate-cluster
assignment for near-dedup pipelines.

The dedup operators (``stages.dedup``: exact, Jaccard, MinHash+LSH, SimHash,
embedding-cosine) emit *pairs*; turning pairs into clusters (every doc
labelled with its duplicate group) is transitive closure — upstream Feast has
no such operator, and Ray Data has no graph primitive, so this composes the
engine's grouped exchange into iterative min-label propagation:

    lab(v) <- v                                   (node ids = labels)
    repeat:
      lab(v) <- min(lab(v), min_{(u,v) in E} lab(u))   # neighbor-min:
                                                       #   2 grouped shuffles
      lab(v) <- min(lab(v), lab(lab(v)))               # pointer jump (path
                                                       #   halving): 1 shuffle
    until the label vector stops changing

Neighbor-min alone converges in O(diameter) rounds; the pointer-jump step
(label-of-label, an equi-join of the label table with itself) adds the
path-halving of the classic PRAM/MapReduce hooking+jumping schemes (cf. the
public "Connected Components in MapReduce and Beyond" large-star/small-star
algorithm — same per-round shuffle shape), so long chains converge in
O(log d) rounds.

Scale notes:
- Every round shuffles ONLY the edge list and the label table (O(E + V)
  rows of int64 columns) — document payloads never enter the iteration.
- The label table is materialized once per round: it is the loop-carried
  state, and leaving it lazy would re-execute every prior round.  It is
  O(V) rows / two int64 columns, stored as distributed blocks.
- Convergence is detected with a distributed aggregate (count of labels
  changed this round) — one scalar reaches the driver per round, never the
  label vector.
- Near-dup graphs have tiny components (cliques/short chains), so 2-3
  rounds suffice in practice; ``max_rounds`` is a safety bound.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from feast_ray.grouped import grouped_map, starts_to_group_index

_SIDE = "__cc_side"


def connected_components(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    comp_col: str = "comp",
    num_buckets: Optional[int] = None,
    max_rounds: int = 30,
    small_graph_threshold: int = 2_000_000,
):
    """Label every node of an undirected edge list with its component's
    minimum node id.  Returns a Dataset ``(node_col: int64, comp_col:
    int64)`` with one row per distinct endpoint (isolated nodes — those in
    no edge — are absent; callers left-join and coalesce to self).

    ``edges``: Dataset with int64-castable columns ``src``/``dst``;
    direction and duplicate edges are irrelevant.

    Near-dup pair lists are orders of magnitude smaller than the corpus
    that produced them, and every distributed round costs 3+ cluster-wide
    executions just to move an O(V) int64 label table — so when the
    materialized edge list holds at most ``small_graph_threshold`` edge
    rows (metadata count, free) the closure is solved in one vectorized
    local pass (scatter-min + pointer jumping over index labels, the same
    algorithm) and only the tiny (node, comp) result re-enters the engine.
    The distributed loop is the correctness path for graphs above the
    threshold; set ``small_graph_threshold=0`` to force it.
    """

    def _both(t: pa.Table) -> pa.Table:
        a = t[src].cast(pa.int64())
        b = t[dst].cast(pa.int64())
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        return pa.table({"u": pa.concat_arrays([a, b]), "v": pa.concat_arrays([b, a])})

    e = edges.map_batches(_both, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # each input edge became two rows in e
    if e.count() <= 2 * small_graph_threshold:
        return _local_components(e, node_col, comp_col, max_rounds)

    # initial labels: one row per distinct endpoint, lab = own id
    def _self_lab(t: pa.Table, starts: np.ndarray) -> pa.Table:
        nodes = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        firsts = nodes[starts[:-1]] if t.num_rows else np.array([], dtype=np.int64)
        arr = pa.array(firsts.astype(np.int64))
        return pa.table({node_col: arr, "lab": arr})

    lab = grouped_map(
        e.select_columns(["u"]), ["u"], _self_lab, num_buckets=num_buckets
    ).materialize()

    for _ in range(max_rounds):
        new_lab = _propagate_round(e, lab, node_col, num_buckets).materialize()
        changed = _count_changed(new_lab)
        lab = new_lab.select_columns([node_col, "lab"]).materialize()
        if changed == 0:
            break
    else:  # pragma: no cover - safety bound
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    return lab.map_batches(
        lambda t: pa.table({node_col: t[node_col], comp_col: t["lab"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _propagate_round(e, lab, node_col: str, num_buckets):
    """One round: neighbor-min then pointer jump.  Output ``(node, lab,
    old)`` carries the PRE-round label for the convergence count."""
    from feast_ray.stages.join import equi_join

    # ship each node's label across its out-edges: co-group edges with the
    # label table by source node, emit the node's own (u, lab_u, old=lab_u)
    # plus (v, lab_u, old=null) per edge
    tagged_lab = lab.map_batches(
        lambda t: pa.table(
            {
                "k": t[node_col],
                "v": pa.nulls(t.num_rows, pa.int64()),
                "lab": t["lab"],
                _SIDE: pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tagged_e = e.map_batches(
        lambda t: pa.table(
            {
                "k": t["u"],
                "v": t["v"],
                "lab": pa.nulls(t.num_rows, pa.int64()),
                _SIDE: pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def emit(t: pa.Table, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                node_col: pa.array([], pa.int64()),
                "lab": pa.array([], pa.int64()),
                "old": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        side = t[_SIDE].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks()
        labs = t["lab"].combine_chunks()
        gidx = starts_to_group_index(starts)
        firsts = starts[:-1]
        # sorted by (k, side): the single label row leads each group
        glab = labs.fill_null(-1).to_numpy(zero_copy_only=False)[firsts]
        is_edge = side == 1
        v_np = v.fill_null(-1).to_numpy(zero_copy_only=False)
        out_nodes = np.concatenate([k[firsts], v_np[is_edge]]).astype(np.int64)
        out_labs = np.concatenate([glab, glab[gidx[is_edge]]])
        # old = own pre-round label on the self row, sentinel -1 on shipped rows
        out_old = np.concatenate([glab, np.full(int(is_edge.sum()), -1, np.int64)])
        return pa.table(
            {
                node_col: pa.array(out_nodes),
                "lab": pa.array(out_labs),
                "old": pa.array(out_old),
            }
        )

    cand = grouped_map(
        tagged_lab.union(tagged_e), ["k"], emit, sort_keys=[_SIDE], num_buckets=num_buckets
    )

    def nmin_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    node_col: pa.array([], pa.int64()),
                    "lab": pa.array([], pa.int64()),
                    "old": pa.array([], pa.int64()),
                }
            )
        nodes = t[node_col].combine_chunks().to_numpy(zero_copy_only=False)
        labs = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        olds = t["old"].combine_chunks().to_numpy(zero_copy_only=False)
        firsts = starts[:-1]
        return pa.table(
            {
                node_col: pa.array(nodes[firsts]),
                "lab": pa.array(np.minimum.reduceat(labs, firsts)),
                # exactly one non-sentinel old per node (its self row)
                "old": pa.array(np.maximum.reduceat(olds, firsts)),
            }
        )

    nmin = grouped_map(cand, [node_col], nmin_kernel, num_buckets=num_buckets)

    # pointer jump: lab <- min(lab, pre-round-lab(lab)).  Every label value
    # is a node id that has a label row, so the left join is total in
    # steady state; misses just keep lab.
    parent = lab.map_batches(
        lambda t: pa.table({"lab": t[node_col], "plab": t["lab"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = equi_join(nmin, parent, keys=["lab"], how="left", num_buckets=num_buckets)

    def _jump(t: pa.Table) -> pa.Table:
        labs = t["lab"].combine_chunks()
        l_np = labs.to_numpy(zero_copy_only=False)
        p_np = t["plab"].combine_chunks().fill_null(np.iinfo(np.int64).max).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                node_col: t[node_col],
                "lab": pa.array(np.minimum(l_np, p_np)),
                "old": t["old"],
            }
        )

    return joined.map_batches(_jump, batch_format="pyarrow", zero_copy_batch=True)


def _count_changed(new_lab) -> int:
    """Distributed count of rows whose label changed this round."""

    def flag(t: pa.Table) -> pa.Table:
        a = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["old"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"chg": pa.array((a != b).astype(np.int64))})

    flagged = new_lab.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    s = flagged.sum("chg")
    return int(s or 0)


def _local_components(e, node_col: str, comp_col: str, max_rounds: int):
    """Small-graph fast path: the doubled edge list fits the driver, so run
    the SAME min-label + pointer-jump iteration vectorized over index
    labels (labels are indices into the sorted node array, so index order
    == id order and scatter-min is one ``np.minimum.at``)."""
    import ray as _ray
    import ray.data as rd

    from feast_ray.grouped import block_refs_of

    tbls = _ray.get(block_refs_of(e))
    empty = pa.table(
        {node_col: pa.array([], pa.int64()), comp_col: pa.array([], pa.int64())}
    )
    tbls = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
        for t in tbls
    ]
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        return rd.from_arrow(empty)
    t = pa.concat_tables(
        [pa.table({"u": x["u"], "v": x["v"]}) for x in tbls]
    ).combine_chunks()
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(u)  # e is doubled, so u alone covers every endpoint
    iu = np.searchsorted(nodes, u)
    iv = np.searchsorted(nodes, v)
    lab = np.arange(len(nodes), dtype=np.int64)
    for _ in range(max_rounds):
        new = lab.copy()
        np.minimum.at(new, iv, lab[iu])  # neighbor-min over all edges
        new = np.minimum(new, new[new])  # pointer jump (path halving)
        if np.array_equal(new, lab):
            break
        lab = new
    else:  # pragma: no cover - safety bound
        raise RuntimeError(f"local components did not converge in {max_rounds} rounds")
    return rd.from_arrow(
        pa.table({node_col: pa.array(nodes), comp_col: pa.array(nodes[lab])})
    )
