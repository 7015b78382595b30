"""UDF / UDAF / UDTF extension points: oracle parity + Arrow plan shape."""

from __future__ import annotations

import pytest

from mapreduce_framework_for_mergesort_spark.plans import audit
from mapreduce_framework_for_mergesort_spark.queries import ORACLE, QUERIES

from tests.oracle import compare_query

UDF_KEYS = ["q_udf_suite"]  # all three seams, consolidated


@pytest.mark.parametrize("name", UDF_KEYS)
def test_oracle_parity(spark, sf_oracle, name):
    compare_query(spark, name, sf_oracle, QUERIES, ORACLE)


def test_scalar_udf_is_arrow_batched(spark, sf_oracle):
    """The pandas UDF must plan as ArrowEvalPython (columnar batches),
    never BatchEvalPython (row-at-a-time pickling)."""
    a = audit(QUERIES["q_udf_suite"](spark, sf_oracle))
    assert "ArrowEvalPython" in a.text
    # The UDTF fan-out must be Arrow too (ArrowEvalPythonUDTF), and no
    # scalar row-pickling stage may appear anywhere in the suite plan.
    assert "ArrowEvalPythonUDTF" in a.text
    assert "BatchEvalPython " not in a.text
    assert "BatchEvalPythonUDTF" not in a.text


def test_udtf_fans_out_per_token(spark, sf_oracle):
    from mapreduce_framework_for_mergesort_spark.io import load_table
    from pyspark.sql import functions as F

    from mapreduce_framework_for_mergesort_spark.queries.udf_family import (
        udtf_split_words,
    )

    n_rows = udtf_split_words(spark, sf_oracle).count()
    docs = load_table(spark, sf_oracle, "documents")
    n_tokens = docs.select(
        F.sum(F.size(F.expr(r"regexp_extract_all(text, '(\\S+)', 1)")))
    ).collect()[0][0]
    assert n_rows == n_tokens
