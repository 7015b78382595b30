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


@settings(
    max_examples=8,
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
def test_star_contraction_matches_union_find(spark, n_nodes, edges):
    """The Kiveris-style alternating star contraction must reach the
    identical fixpoint as hash-min / union-find on random graphs
    (self-pairs, duplicate pairs, and reversed pairs included)."""
    edges = [(u % n_nodes, v % n_nodes) for u, v in edges]
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    if edges:
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    else:
        pairs = spark.createDataFrame([], "doc_a: long, doc_b: long")
    got = {
        r["node"]: r["cluster"]
        for r in D.cluster_pairs(
            pairs, nodes=nodes, algorithm="star"
        ).collect()
    }
    assert got == _union_find(n_nodes, edges)


def _path_pairs(spark, n: int, shuffled_ids: list[int]):
    """Path graph over arbitrary node ids: id[i] — id[i+1]."""
    rows = [(shuffled_ids[i], shuffled_ids[i + 1]) for i in range(n - 1)]
    return spark.createDataFrame(rows, ["doc_a", "doc_b"])


def test_star_contraction_logarithmic_on_long_path(spark):
    """The round-3 failure mode: a diameter-400 path exhausts hash-min's
    budget (it needs ~400 rounds) but star contraction must converge in
    O(log d) — the VERDICT acceptance bound is ≤ ~7 rounds for
    diameter ≥ 100; we pin ≤ 10 for diameter 400 with adversarial
    (reversed) id order, where the min label sits at the far end."""
    n = 401
    ids = list(range(n))[::-1]  # node 0 at the END of the path
    pairs = _path_pairs(spark, n, ids)
    stats: dict = {}
    labels = {
        r["node"]: r["cluster"]
        for r in D.cluster_pairs(
            pairs, algorithm="star", stats=stats
        ).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    assert stats["algorithm"] == "star"
    assert stats["rounds"] <= 10, stats


def test_hash_min_raises_loudly_but_auto_falls_back(spark):
    """Explicit hash_min on a long path must still fail LOUDLY (a
    non-fixpoint result would silently under-dedup); the default auto
    policy must instead fall back to star and return the exact answer."""
    import pytest

    n = 101
    pairs = _path_pairs(spark, n, list(range(n))[::-1])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.cluster_pairs(pairs, algorithm="hash_min", max_iters=10).collect()
    stats: dict = {}
    labels = {
        r["node"]: r["cluster"]
        for r in D.cluster_pairs(pairs, max_iters=10, stats=stats).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    # round 13: a graph this small takes the driver union-find fast path
    assert stats["algorithm"] == "driver_uf"
    # the distributed star fallback must still engage when the graph
    # exceeds the driver ceiling — force the routing past the fast path
    prev = D.DRIVER_UF_MAX_EDGES
    D.DRIVER_UF_MAX_EDGES = 0
    try:
        stats2: dict = {}
        labels2 = {
            r["node"]: r["cluster"]
            for r in D.cluster_pairs(
                pairs, max_iters=10, stats=stats2
            ).collect()
        }
    finally:
        D.DRIVER_UF_MAX_EDGES = prev
    assert labels2 == labels
    assert stats2["algorithm"] == "star"  # the fallback produced the answer


def test_driver_uf_matches_distributed_on_mixed_graph(spark):
    """Round-13 fast path: the bounded driver union-find returns the
    identical min-label fixpoint as hash-min and star on a graph mixing
    cliques, a bridge, self-loops, and isolated nodes."""
    edges = (
        [(a, b) for c in range(5) for a in range(c * 7, c * 7 + 7)
         for b in range(a + 1, c * 7 + 7)]
        + [(6, 7), (20, 21), (50, 50)]
    )
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    nodes = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    outs = {}
    for alg in ("auto", "hash_min", "star"):
        st: dict = {}
        outs[alg] = (
            sorted(
                map(
                    tuple,
                    D.cluster_pairs(
                        pairs, nodes=nodes, algorithm=alg, stats=st
                    ).collect(),
                )
            ),
            st["algorithm"],
        )
    assert outs["auto"][1] == "driver_uf"
    assert outs["auto"][0] == outs["hash_min"][0] == outs["star"][0]
    assert len(outs["auto"][0]) == 60  # every node labeled, singletons too
