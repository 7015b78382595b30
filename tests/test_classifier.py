"""Hashed-feature logistic regression (round 10,
``operators/classifier.py``) — trained weights pinned against an
independent numpy replica of the same full-batch updates, scoring
pinned map-only/zero-Python, and the composed corpus filter proven to
separate a labeled world it never saw the labels of.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.operators import classifier as C
from mapreduce_framework_for_mergesort_spark.operators.similarity import (
    feature_hash_embed,
)

_GOOD = [
    "the committee published a detailed report on the findings today",
    "researchers described the method and shared the data openly",
    "the council voted to approve the plan after a long debate",
    "she explained the history of the town in clear simple words",
]
_BAD = [
    "buy cheap pills now click here win win win casino bonus",
    "free money casino click click subscribe now buy now cheap",
    "win a prize now cheap pills casino click here free bonus",
    "click subscribe win cheap free casino pills bonus now now",
]


def _labeled(spark, dim=16):
    rows = [(i, t, 1.0) for i, t in enumerate(_GOOD)] + [
        (100 + i, t, 0.0) for i, t in enumerate(_BAD)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    return feature_hash_embed(df, dim=dim)


def test_train_matches_numpy_replica(spark):
    df = _labeled(spark)
    model = C.train_logreg(df, n_iters=15, lr=0.5, l2=0.01)

    rows = df.select("embedding", "label").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    y = np.array([r["label"] for r in rows])
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(15):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w = w - 0.5 * ((X.T @ (p - y)) / len(y) + 0.01 * w)
        b = b - 0.5 * float(np.sum(p - y)) / len(y)
    assert model["bias"] == pytest.approx(b, rel=1e-9)
    assert np.allclose(model["weights"], w, rtol=1e-9)
    assert model["dim"] == 16 and model["n"] == 8


def test_scoring_separates_and_stays_jvm(spark):
    df = _labeled(spark)
    model = C.train_logreg(df, n_iters=30, lr=1.0)
    scored = C.score_logreg(df, model)
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    for i in range(len(_GOOD)):
        assert got[i] > 0.7, (i, got[i])
    for i in range(len(_BAD)):
        assert got[100 + i] < 0.3, (i, got[100 + i])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # scoring is pure JVM projection


def test_quality_filter_generalizes(spark):
    # train on the labeled sample, filter a DISJOINT corpus: fresh
    # good/spam pages built from the same vocabularies
    model = C.train_logreg(_labeled(spark), n_iters=30, lr=1.0)
    corpus = spark.createDataFrame(
        [
            (1, "the report described the plan and the method in detail"),
            (2, "click now win free casino pills cheap bonus subscribe"),
            (3, "the town council shared the published findings openly"),
        ],
        "doc_id long, text string",
    )
    kept = C.quality_filter_by_model(corpus, model, keep_score=True)
    got = {r["doc_id"]: r["model_score"] for r in kept.collect()}
    assert set(got) == {1, 3}
    assert all(v >= 0.5 for v in got.values())


def test_train_validates_input(spark):
    empty = spark.createDataFrame([], "embedding array<double>, label double")
    with pytest.raises(ValueError, match="empty"):
        C.train_logreg(empty)
    ragged = spark.createDataFrame(
        [([1.0, 2.0], 1.0), ([1.0], 0.0)], "embedding array<double>, label double"
    )
    with pytest.raises(ValueError, match="inconsistent"):
        C.train_logreg(ragged)
    badlab = spark.createDataFrame(
        [([1.0, 2.0], 3.0)], "embedding array<double>, label double"
    )
    with pytest.raises(ValueError, match="labels"):
        C.train_logreg(badlab)


def test_curate_documents_with_quality_model(spark):
    """The trained filter composes into the pipeline next to the
    heuristic one: spam drops by model score, the survivors flow
    through splits unchanged."""
    from mapreduce_framework_for_mergesort_spark import pipelines

    model = C.train_logreg(_labeled(spark), n_iters=30, lr=1.0)
    corpus = spark.createDataFrame(
        [
            (1, "the report described the plan and the method in detail"),
            (2, "click now win free casino pills cheap bonus subscribe"),
            (3, "the town council shared the published findings openly"),
        ],
        "doc_id long, text string",
    )
    out = pipelines.curate_documents(
        corpus, min_quality=0.0, langs=("en", "und"),
        quality_model=model,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    assert "split" in out.columns


def test_fractional_labels_raise(spark):
    # the docstring contract is 0/1 — a mis-typed probability column
    # (0.5) must raise, not train silently (ADVICE round 11)
    df = _labeled(spark).withColumn(
        "label", F.when(F.col("label") == 1.0, 0.5).otherwise(0.0)
    )
    with pytest.raises(ValueError, match="labels must be in"):
        C.train_logreg(df, n_iters=1)
