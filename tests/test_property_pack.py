"""Property-based tests for sequence packing: the distributed exclusive
prefix sum (``sampling.pack_documents``) against a literal Python
cumsum oracle over adversarial corpora — empty corpora, zero-token
docs, docs larger than the whole budget, sparse/duplicate-free id
spaces.  Hypothesis drives a real SparkSession, so examples stay small
and deadlines are off (JVM latency dominates)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from mapreduce_framework_for_mergesort_spark.operators.sampling import (
    pack_documents,
)

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),  # sparse doc ids
        st.integers(min_value=0, max_value=3000),   # n_tokens (0, > budget)
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[0],
)


@PROP
@given(corpora, st.integers(min_value=1, max_value=700))
def test_pack_matches_python_cumsum(spark, rows, budget):
    df = spark.createDataFrame(
        [(i, n) for i, n in rows], "doc_id: bigint, toklen: bigint"
    ).repartition(5)
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents(df, budget, count_col="toklen").collect()
    }
    excl = 0
    want = {}
    for i, n in sorted(rows):
        want[i] = (excl // budget, excl % budget)
        excl += n
    assert got == want
