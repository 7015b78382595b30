"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line.

Timing forces full materialization through the ``noop`` sink (computes
every column, no driver-side collect cost).  The flagship comparison
point vs. the reference (BASELINE.md): sorting 20 MB of integers took the
reference 2294.57 s at its best reactive config; ``q_sort_global`` here
totally orders 600 K lineitem rows (~20 MB of key data) with rank
materialization in the low seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_for_mergesort_spark.queries import QUERIES  # noqa: E402
from mapreduce_framework_for_mergesort_spark.session import get_spark  # noqa: E402

# Mirrors the consolidated registry (round-2: ≤50 keys, see README.md);
# every name here has a green CORRECTNESS row — the bench stays honest
# about what is verified.
HEADLINE = [
    "q_sort_global",
    "q_sort_within_partitions",
    "q_merge_sorted_runs",
    "q_topk",
    "q_join_enrich",
    "q_agg_pricing_summary",
    "q_events_sessionize",
    "q_group_topn",
    "q_asof_join",
    "q_join_variants",
    "q_cube_grouping",
    "q_window_funcs",
    "q_salted_agg",
    "q_profile_stats",
    "q_range_band_join",
    "q_scalar_funcs",
    "q_source_roundtrips",
    "q_dedup_exact",
    "q_dedup_minhash_pairs",
    "q_dedup_simhash",
    "q_text_stats",
    "q_text_doc_profile",
    "q_lang_id",
    "q_tfidf_top_terms",
    "q_embed_topk_sim",
    "q_embed_ivf_topk",
    "q_bucketed_join",
    "q_multimodal_binary",
    "q_multimodal_features",
    "q_udf_suite",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark(app_name="msfs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path AND the Arrow Python worker pool once so
    # per-query times measure the queries, not first-touch
    # initialization (a cold pandas_udf pays ~2-4 s of worker spawn that
    # has nothing to do with the operator being measured).
    force(QUERIES["q_topk"](spark, sf_dir))
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(v):
        return v

    force(spark.range(10_000).repartition(64).select(_warm(col("id"))))

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(QUERIES[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
