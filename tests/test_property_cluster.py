"""Property test: ``dedup.cluster_pairs`` equals union-find on random
graphs.

The Spark implementation is iterative hash-min label propagation; the
reference is a 20-line driver-side disjoint-set union.  Any divergence
(missed transitive closure, premature convergence, singleton handling)
shows up as a label mismatch on some random graph.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_framework_for_mergesort_spark.operators import dedup as D


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = smallest node id in the component
    roots: dict[int, int] = {}
    for x in range(n_nodes):
        r = find(x)
        roots[r] = min(roots.get(r, r), x)
    return {x: roots[find(x)] for x in range(n_nodes)}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n_nodes=st.integers(min_value=1, max_value=24),
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=23),
            st.integers(min_value=0, max_value=23),
        ),
        max_size=30,
    ),
)
def test_cluster_pairs_matches_union_find(spark, n_nodes, edges):
    edges = [(u % n_nodes, v % n_nodes) for u, v in edges]
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    if edges:
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    else:
        pairs = spark.createDataFrame([], "doc_a: long, doc_b: long")
    got = {
        r["node"]: r["cluster"]
        for r in D.cluster_pairs(pairs, nodes=nodes).collect()
    }
    assert got == _union_find(n_nodes, edges)
