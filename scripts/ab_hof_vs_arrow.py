"""Round-12 A/B (VERDICT item 7): the RFC 3986 §6.2.2 pct/dot-segment
folds of ``q_scalar_funcs`` as (A) the incumbent codegen HOF fold
(``pct_normalize`` + ``remove_dot_segments``) vs (B) the memoized
Arrow kernel (``pct_dot_normalize_arrow``), interleaved warm runs over
the REAL fixture shape (orders' url_rfc_raw paths — mostly-distinct
values, escape/dot rows a 3/7 minority) at ×1 (sf0.1) and ×10 (the
key-shifted scale dir, distinct keys → distinct paths).

Decision + both numbers recorded in SCALE_NOTES round 12.  Run alone
(no concurrent Spark) — the repo's sweep-hygiene rule.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.operators import urls as U


def url_rfc_raw_expr():
    k = F.col("o_orderkey")
    return F.concat(
        F.lit("http://RFC.Ex.ORG/u"),
        (F.col("o_custkey") % 10).cast("string"),
        F.when(k % 7 == 0, "/%7ea/docs/./v2/../latest%2fx")
        .when(k % 7 == 1, "/a/%2e%2e/c%4d")
        .when(k % 7 == 2, "/p%2f/100%25/.")
        .otherwise(F.concat(F.lit("/plain/"), (k % 100).cast("string"))),
        F.when(k % 5 == 0, "?x=%7e&b=%2F")
        .when(k % 5 == 1, "?b=2&a=1")
        .otherwise(""),
    )


def timed(df, col, reps=5):
    out = []
    for _ in range(reps):
        t0 = time.time()
        df.select(F.sum(F.length(col)).alias("s")).collect()
        out.append(time.time() - t0)
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from bench import ensure_scale_dir

    results = {}
    for tag, path in (
        ("x1", "/root/testdata/sf0.1"),
        ("x10", ensure_scale_dir(10)),
    ):
        orders = spark.read.parquet(f"{path}/orders.parquet")
        p = U.url_path(url_rfc_raw_expr())
        codegen = U.remove_dot_segments(U.pct_normalize(p))
        arrow = U.pct_dot_normalize_arrow(p)
        # warmup both
        timed(orders, codegen, reps=1)
        timed(orders, arrow, reps=1)
        a_runs, b_runs = [], []
        for _ in range(5):  # interleaved: host noise hits both alike
            a_runs += timed(orders, codegen, reps=1)
            b_runs += timed(orders, arrow, reps=1)
        results[tag] = {
            "rows": orders.count(),
            "codegen_min": round(min(a_runs), 3),
            "codegen_med": round(sorted(a_runs)[len(a_runs) // 2], 3),
            "arrow_min": round(min(b_runs), 3),
            "arrow_med": round(sorted(b_runs)[len(b_runs) // 2], 3),
        }
        print(tag, json.dumps(results[tag]))
    # equality of the two variants on the real fixture (hard gate: an
    # A/B between non-equal computations is meaningless)
    orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    p = U.url_path(url_rfc_raw_expr())
    diff = (
        orders.select(
            U.remove_dot_segments(U.pct_normalize(p)).alias("a"),
            U.pct_dot_normalize_arrow(p).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .count()
    )
    print("variant_mismatch_rows:", diff)
    print("RESULT " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
