"""connected_components vs an independent pure-Python union-find.

Random graphs across densities (including empty-edge and fully-merged
regimes) — the iterative Spark fixpoint must agree with union-find on
every node's component label (both canonicalize to the component min).
"""

from __future__ import annotations

import random

from db_loader_spark.functions.dedup import connected_components


def _py_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for e in edges for v in e}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id reachable
    return {v: find(v) for v in parent}


def test_components_match_union_find(spark):
    for seed, n, p in [(1, 30, 0.02), (2, 40, 0.08), (3, 25, 0.3), (4, 50, 0.01)]:
        rng = random.Random(seed)
        edges = [
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if rng.random() < p
        ]
        if not edges:
            continue
        expected = _py_components(n, edges)
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.component_id
            for r in connected_components(pairs).collect()
        }
        assert got == expected, f"seed={seed}: components diverge"


def test_components_chain_diameter(spark):
    # a long path graph needs diameter-many propagation steps — the
    # worst case for label propagation; must still converge exactly
    edges = [(i, i + 1) for i in range(20)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = connected_components(pairs).collect()
    assert len(got) == 21
    assert {r.component_id for r in got} == {0}
