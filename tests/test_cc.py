"""Connected components: distributed min-label propagation vs a pure-Python
union-find oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from feast_ray.stages.cc import connected_components


def _uf_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(edges_df: pd.DataFrame, **kw) -> dict[int, int]:
    out = connected_components(rd.from_pandas(edges_df), **kw).to_pandas()
    assert out["node"].is_unique
    return dict(zip(out["node"], out["comp"]))


@pytest.mark.parametrize("thresh", [0, 2_000_000], ids=["distributed", "local"])
def test_random_graph_matches_union_find(ray_session, thresh):
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, size=(300, 2))]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    assert _run(df, small_graph_threshold=thresh) == _uf_oracle(edges)


@pytest.mark.parametrize("thresh", [0, 2_000_000], ids=["distributed", "local"])
def test_long_chain_converges_fast(ray_session, thresh):
    # a 400-node path: diameter 399; pointer jumping must beat max_rounds=30
    n = 400
    df = pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
    got = _run(df, max_rounds=30, small_graph_threshold=thresh)
    assert set(got.values()) == {0}
    assert len(got) == n


def test_local_and_distributed_paths_agree(ray_session):
    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 500, size=(800, 2))]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    assert _run(df, small_graph_threshold=0) == _run(df, small_graph_threshold=10**6)


def test_disjoint_cliques_and_self_loops(ray_session):
    edges = [(10, 11), (11, 12), (10, 12), (5, 5), (99, 98)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = _run(df, num_buckets=3, small_graph_threshold=0)
    assert got == {10: 10, 11: 10, 12: 10, 5: 5, 98: 98, 99: 98}


def test_custom_column_names(ray_session):
    df = pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})
    out = connected_components(
        rd.from_pandas(df), src="doc_a", dst="doc_b", node_col="doc_id", comp_col="cluster_id"
    ).to_pandas()
    assert sorted(out.columns) == ["cluster_id", "doc_id"]
    assert set(out["cluster_id"]) == {1}
