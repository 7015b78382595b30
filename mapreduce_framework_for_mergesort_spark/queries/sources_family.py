"""Source/sink round-trip queries: CSV, JSON-lines, partitioned parquet
— one consolidated driver key (``q_source_roundtrips``); the per-format
callables remain for tests.

Each query serializes a driver table into the target format under a
deterministic /tmp workdir, reads it back through ``sources/formats.py``
(explicit schema, PERMISSIVE corrupt policy), and reduces to an aggregate
the DuckDB oracle computes from the *original* parquet — so the check
proves lossless round-tripping, not just that a read succeeded.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import layout
from mapreduce_framework_for_mergesort_spark.operators.relational import dec_sum
from mapreduce_framework_for_mergesort_spark.queries import query
from mapreduce_framework_for_mergesort_spark.sources import formats


def _workdir(sf_dir: str, tag: str) -> str:
    digest = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return os.path.join("/tmp", "msfs_sources", f"{tag}_{digest}")


CUSTOMER_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

EVENTS_JSON_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV → read (explicit schema) → aggregate.  Doubles
    survive because Spark's CSV writer emits shortest-round-trip decimal
    strings; the oracle aggregates the original parquet, so any loss in
    the text hop would hash-mismatch."""
    path = _workdir(sf_dir, "csv_customer")
    formats.write_csv(load_table(spark, sf_dir, "customer"), path)
    back = formats.read_csv(spark, path, CUSTOMER_SCHEMA)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("c_acctbal", alias="sum_bal"),
    )


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → read (explicit schema) → aggregate,
    including re-extracting the nested ``props`` JSON string after the
    round-trip (string-in-JSON escaping must be lossless)."""
    path = _workdir(sf_dir, "jsonl_events")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    formats.write_jsonl(ev, path)
    back = formats.read_jsonl(spark, path, EVENTS_JSON_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", alias="sum_value"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


def q_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderstatus → read back filtered
    to one status.  The filter prunes at the *directory* level
    (``PartitionFilters`` in the plan — asserted in tests): at 100 TB the
    'O' and 'P' partitions are never opened, not even their footers."""
    path = _workdir(sf_dir, "part_orders")
    orders = load_table(spark, sf_dir, "orders")
    formats.write_partitioned_parquet(orders, path, ["o_orderstatus"])
    back = formats.read_partitioned_parquet(spark, path)
    return (
        back.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice", alias="revenue"),
        )
    )


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC → read back → aggregate.  Spark's second vectorized
    columnar format; pushdown/pruning semantics mirror parquet."""
    path = _workdir(sf_dir, "orc_part")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    formats.write_orc(part, path)
    back = formats.read_orc(spark, path)
    return (
        back.where(F.col("p_size") >= 25)
        .groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("p_retailprice", alias="sum_price"),
        )
    )


# Z-order clustering columns for the layout round-trip branch: floor()
# before the int cast (DuckDB CAST(double AS BIGINT) rounds, Spark
# truncates; floor agrees everywhere)
_ZCOLS = ["o_custkey", "CAST(floor(o_totalprice) AS BIGINT)"]


def q_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → Z-order clustered parquet (``operators/layout.py``) →
    read back filtered to a custkey range → aggregate per coarse Morton
    bucket, carrying an exact int64 SUM of the recomputed Z-keys.  The
    oracle recomputes the identical interleave from the original
    parquet, so the check proves (a) the clustered write is lossless
    and (b) the Morton bit arithmetic agrees across engines
    value-for-value.  The custkey filter is the predicate the layout
    exists to serve — on the clustered files it prunes at file/row-group
    level via footer min/max (measured in tests/test_layout.py)."""
    path = _workdir(sf_dir, "zorder_orders")
    orders = load_table(spark, sf_dir, "orders")
    layout.write_zordered(orders, path, _ZCOLS, num_files=8)
    back = spark.read.parquet(path)
    zk = F.expr(layout.spark_zorder_key(_ZCOLS))
    return (
        back.where(F.col("o_custkey").between(100, 600))
        .withColumn("zb", F.shiftright(zk, 26))
        .groupBy("zb")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice", alias="sum_price"),
            F.sum(zk).alias("sum_zkey"),
        )
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multi-member ``.warc.gz`` shard files
    (``sources/warc.py`` — the Common Crawl layout: one gzip member
    per record, stored deflate) → read back through the
    ``binaryFile`` + member-walk ingestion path → aggregate per shard.
    The oracle recomputes shard membership (``doc_id % n_shards``,
    with ``n_shards`` derived by the same sizing rule), record
    counts, total payload bytes, and the doc_id sum from the original
    parquet, so the check proves the full sink→source hop is lossless
    down to payload byte counts.  Files are written by the EXECUTORS
    (foreachPartition — bytes never gather on the driver; local-FS
    path is the test seam, object stores take the same bytes through
    their own committer)."""
    import shutil

    from mapreduce_framework_for_mergesort_spark.sources import warc as W

    path = _workdir(sf_dir, "warc_documents")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    # round 11: shard count follows the crawl sizing rule
    # (n_shards ≈ pages/5k, SCALE_NOTES round 10) so the ×10/×100
    # scale rows measure the ENGINE, not a fixed 4-file parallelism
    # ceiling.  The oracle computes the SAME rule from the same table
    # (round 12), so membership agrees at any corpus size.
    n_shards = max(4, docs.count() // 5000)
    shards = W.warc_shard_bytes(docs, n_shards=n_shards)

    def write_partition(rows) -> None:
        for r in rows:
            with open(
                os.path.join(path, f"shard-{r['shard_id']:04d}.warc.gz"),
                "wb",
            ) as f:
                f.write(bytes(r["data"]))

    shards.foreachPartition(write_partition)
    back = W.read_warc(spark, os.path.join(path, "*.warc.gz"))
    doc_id = F.split(F.col("target_uri"), ":").getItem(2).cast("long")
    # sum(doc_id · (member_idx + 1)) pins the PAIRING of record to
    # gzip member per record (round-9 verdict item 5: the "records are
    # independently seekable" promise, hash-checked) — the oracle
    # recomputes member_idx as the doc's rank within its shard, which
    # is exactly the layout warc_shard_bytes writes (one member per
    # record, records ordered by doc_id); any permutation or
    # mislabeling breaks the weighted sum
    return (
        back.withColumn("__doc", doc_id)
        .groupBy(
            (F.col("__doc") % n_shards).cast("string").alias("shard")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("content_length").alias("sum_payload_bytes"),
            F.sum(
                F.col("__doc") * (F.col("member_idx") + F.lit(1))
            ).alias("sum_doc_member"),
        )
    )


def q_warc_http_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WET chain end-to-end (round 10): documents → deterministic
    HTML pages (charset varying utf-8/latin-1/utf-16 by doc_id) — or,
    for doc_id % 5 == 2, PDF documents (``sources/pdf.py``, filters /
    xref layout / fonts varying by doc_id) — behind
    HTTP responses (transport varying identity/gzip/chunked/both and —
    round 11 — br/zstd, round 12 — LZW ``compress``, decoded via
    ``sources/encodings.py``) →
    ``response``-record ``.warc.gz`` shards → ``read_warc`` →
    ``audit_http_extractions``/``warc_responses_to_documents``
    (``sources/html.py``) → md5-of-extracted-text per document.  The
    oracle recomputes the EXPECTED extracted text as a closed form of
    (doc_id, text) from the original parquet and md5s it, so the check
    is exact at document grain: one wrong charset decision, one leaked
    <script> byte, one broken chunk boundary — hash mismatch."""
    import shutil

    from mapreduce_framework_for_mergesort_spark.sources import html as H
    from mapreduce_framework_for_mergesort_spark.sources import warc as W

    path = _workdir(sf_dir, "warc_http")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")

    def write_partition(rows) -> None:
        for r in rows:
            with open(
                os.path.join(path, f"crawl-{r['shard_id']:04d}.warc.gz"),
                "wb",
            ) as f:
                f.write(bytes(r["data"]))

    # round 11: rule-sized shards (n_shards ≈ pages/5k, floor 4) so
    # the ×100 scale row measures extraction, not a 4-file ceiling;
    # the oracle groups by md5(expected text) and is shard-agnostic
    n_shards = max(4, docs.count() // 5000)
    H.html_crawl_shard_bytes(docs, n_shards=n_shards).foreachPartition(
        write_partition
    )
    back = W.read_warc(spark, os.path.join(path, "*.warc.gz"))
    # Round 12 (optimization): extraction parallelism after read_warc
    # is FILE-count parallelism (n_shards tasks — 4 at fixture scale on
    # 32 cores), and the HTML/PDF parse per record is the expensive
    # part of the chain.  When the shard count is below the session's
    # core count, spread the decoded records once before the parse;
    # at crawl scale (shards ≥ cores) this is a no-op and the chain
    # keeps its map-only shape.
    par = spark.sparkContext.defaultParallelism
    if n_shards < par:
        back = back.repartition(par)
    ext = H.warc_responses_to_documents(back)
    doc_id = F.element_at(F.split(F.col("url"), "/"), -1).cast("long")
    # round 12: the fmt split pins that doc_id % 5 == 2 rows really
    # were served AND classified as application/pdf (sources/pdf.py) —
    # the oracle recomputes fmt from doc_id arithmetic, so a PDF that
    # fell back to the HTML path (or vice versa) lands in the wrong
    # group and hash-mismatches even though the text agrees
    fmt = F.when(
        F.col("mime") == "application/pdf", F.lit("warc_pdf")
    ).otherwise(F.lit("warc_http"))
    return (
        ext.select(fmt.alias("fmt"), doc_id.alias("__doc"), "text")
        .groupBy(
            "fmt", F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("text")).alias("n_text_bytes"),
            F.sum("__doc").alias("sum_doc_id"),
        )
    )


@query(
    "q_source_roundtrips",
    oracle="""
    SELECT 'csv' AS fmt, c_mktsegment AS grp, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric,
           CAST(NULL AS BIGINT) AS sum_k
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'jsonl' AS fmt, event_type AS grp, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'parquet_part' AS fmt, o_orderpriority AS grp, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric,
           CAST(NULL AS BIGINT) AS sum_k
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    UNION ALL
    SELECT 'orc' AS fmt, CAST(p_size AS VARCHAR) AS grp, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric,
           CAST(NULL AS BIGINT) AS sum_k
    FROM part WHERE p_size >= 25 GROUP BY p_size
    UNION ALL
    SELECT 'zorder' AS fmt, CAST((__ZKEY__ >> 26) AS VARCHAR) AS grp,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric,
           CAST(SUM(__ZKEY__) AS BIGINT) AS sum_k
    FROM orders WHERE o_custkey BETWEEN 100 AND 600 GROUP BY 2
    UNION ALL
    SELECT 'warc' AS fmt, CAST(doc_id % n_shards AS VARCHAR) AS grp,
           COUNT(*) AS n,
           CAST(SUM(octet_length(encode(text))) AS DOUBLE) AS sum_metric,
           -- member_idx recomputed as the doc's 0-based rank within
           -- its shard (the layout warc_shard_bytes writes: one gzip
           -- member per record, ordered by doc_id); the weighted sum
           -- pins the record->member pairing per record
           CAST(SUM(doc_id * rn) AS BIGINT) AS sum_k
    FROM (
        -- n_shards mirrors the engine's crawl sizing rule
        -- max(4, docs/5000) DYNAMICALLY (round 12, ADVICE): the two
        -- sides agree at ANY corpus size, not just below 25k docs
        SELECT doc_id, text, n_shards,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id % n_shards ORDER BY doc_id
               ) AS rn
        FROM documents,
             (SELECT GREATEST(4, COUNT(*) // 5000) AS n_shards
              FROM documents)
    ) GROUP BY 2
    UNION ALL
    SELECT CASE WHEN doc_id % 5 = 2 THEN 'warc_pdf' ELSE 'warc_http' END
               AS fmt,
           md5(expected) AS grp, COUNT(*) AS n,
           CAST(SUM(octet_length(encode(expected))) AS DOUBLE)
               AS sum_metric,
           CAST(SUM(doc_id) AS BIGINT) AS sum_k
    FROM (
        -- doc_id % 5 = 2 rows are served as application/pdf
        -- (sources/pdf.py); the expected text is the SAME closed form
        -- either way, so only the fmt tag differs
        SELECT doc_id,
               'doc ' || CAST(doc_id AS VARCHAR) || ' ± crawl'
               || chr(10) || 'heading ' || CAST(doc_id AS VARCHAR)
               || CASE WHEN text IS NULL OR text = '' THEN ''
                       ELSE chr(10) || text END AS expected
        FROM documents
    ) GROUP BY 1, 2
    """.replace("__ZKEY__", layout.duckdb_zorder_key(_ZCOLS)),
)
def q_source_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three serialization round-trips in one tagged union (registry
    consolidated to the driver's 50-key budget — round-1
    ``q_csv_roundtrip`` + ``q_json_roundtrip`` + ``q_partitioned_parquet``,
    plus a new ORC branch).
    Each branch writes the table out in the target format, reads it back
    through ``sources/formats.py``, and aggregates; the oracle aggregates
    the ORIGINAL parquet, so any loss in any text/partition hop would
    hash-mismatch.  The partitioned-parquet branch additionally proves
    directory-level partition pruning (PartitionFilters pinned in
    tests/test_sources.py); the zorder branch proves the Z-order
    clustered write (operators/layout.py) is lossless and its Morton
    arithmetic cross-engine exact; the warc branch (round 9) proves
    the Common Crawl-layout ``.warc.gz`` sink→source hop
    (sources/warc.py — executor-written multi-member gzip shards read
    back through the binaryFile member walk) lossless down to payload
    byte counts AND (round 10) per-record gzip-member labeling (the
    seek contract); the warc_http branch (round 10) proves the full
    WET chain — HTML pages of varying charset behind HTTP responses of
    varying transfer/content encodings, extracted back to visible text
    (sources/html.py) — exact per document via md5-of-extracted-text
    group keys."""
    # The seven branches are INDEPENDENT jobs (distinct /tmp workdirs,
    # distinct source tables), and each branch's sink write runs
    # eagerly at construction time — sequentially they cost the SUM of
    # seven write jobs while most cores idle through every job's tail.
    # Submit the constructions from a small thread pool (guide §2.6:
    # Spark's scheduler runs concurrent jobs fine; FIFO back-fills the
    # tail of one job with tasks of the next) so construction latency
    # is the max, not the sum — measured 6.3 → ~2.7 s at sf0.1 with
    # identical results (the profile_family pattern, applied here in
    # round 12).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=7) as ex:
        f_zorder = ex.submit(q_zorder_roundtrip, spark, sf_dir)
        f_csv = ex.submit(q_csv_roundtrip, spark, sf_dir)
        f_jsonl = ex.submit(q_json_roundtrip, spark, sf_dir)
        f_pq = ex.submit(q_partitioned_parquet, spark, sf_dir)
        f_orc = ex.submit(q_orc_roundtrip, spark, sf_dir)
        f_warc = ex.submit(q_warc_roundtrip, spark, sf_dir)
        f_http = ex.submit(q_warc_http_extract, spark, sf_dir)
    zorder = f_zorder.result().select(
        F.lit("zorder").alias("fmt"),
        F.col("zb").cast("string").alias("grp"),
        "n",
        F.col("sum_price").alias("sum_metric"),
        F.col("sum_zkey").alias("sum_k"),
    )
    csv = f_csv.result().select(
        F.lit("csv").alias("fmt"),
        F.col("c_mktsegment").alias("grp"),
        "n",
        F.col("sum_bal").alias("sum_metric"),
        F.lit(None).cast("long").alias("sum_k"),
    )
    jsonl = f_jsonl.result().select(
        F.lit("jsonl").alias("fmt"),
        F.col("event_type").alias("grp"),
        "n",
        F.col("sum_value").alias("sum_metric"),
        "sum_k",
    )
    pq = f_pq.result().select(
        F.lit("parquet_part").alias("fmt"),
        F.col("o_orderpriority").alias("grp"),
        "n",
        F.col("revenue").alias("sum_metric"),
        F.lit(None).cast("long").alias("sum_k"),
    )
    orc = f_orc.result().select(
        F.lit("orc").alias("fmt"),
        F.col("p_size").cast("string").alias("grp"),
        "n",
        F.col("sum_price").alias("sum_metric"),
        F.lit(None).cast("long").alias("sum_k"),
    )
    warc = f_warc.result().select(
        F.lit("warc").alias("fmt"),
        F.col("shard").alias("grp"),
        "n",
        F.col("sum_payload_bytes").cast("double").alias("sum_metric"),
        F.col("sum_doc_member").alias("sum_k"),
    )
    warc_http = f_http.result().select(
        "fmt",
        F.col("text_md5").alias("grp"),
        "n",
        F.col("n_text_bytes").cast("double").alias("sum_metric"),
        F.col("sum_doc_id").alias("sum_k"),
    )
    return (
        csv.unionByName(jsonl)
        .unionByName(pq)
        .unionByName(orc)
        .unionByName(zorder)
        .unionByName(warc)
        .unionByName(warc_http)
    )
