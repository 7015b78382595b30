"""Data-profiling query: one long-format (metric, grp, value) audit pass
combining exact-decimal Pearson correlation, exact percentiles,
key-uniqueness counts, a fixed-width histogram, and a deterministic
systematic sample — round-1 keys ``q_corr_stats`` / ``q_percentiles`` /
``q_key_uniqueness`` / ``q_histogram`` / ``q_sample_systematic``,
consolidated to the driver's 50-key check budget.  Every constituent
aggregate is unchanged (DECIMAL moment sums, quantile_cont-equivalent
interpolation, floor-divide buckets); only the output surface is the
shared long format.  All values are exact in double (counts < 2^53,
decimal sums cast once at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import hashing as H
from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import sampling
from mapreduce_framework_for_mergesort_spark.operators import sketches
from mapreduce_framework_for_mergesort_spark.operators.relational import dec_sum
from mapreduce_framework_for_mergesort_spark.queries import query

_SPLIT_CASE = sampling.duckdb_split_case("o_orderkey")
_SAMPLE_RATE = 0.25  # deterministic hash-sample audit rate
PACK_BUDGET = 512  # tokens per training sequence in the packing audit
# Source-mixing audit: non-uniform integer ratios over a uniform
# 20×25-doc fixture so the plan exercises all three regimes — full
# epochs (src0: rate 2.0), a fractional epoch (src1: 1.2), and
# downsampling (src2/src3: 0.4); unweighted sources must vanish.
MIX_WEIGHTS = {"src0": 5, "src1": 3, "src2": 1, "src3": 1}
MIX_EPOCHS = 2
BAL_CAP = 500  # per-stratum cap in the balanced-sample audit: binds at
#                sf0.01 (≈3000 orders per priority), passes-through at
#                sf0.001 (≈300) — both regimes exercised across SFs


def _long(df: DataFrame, grp_col, pairs) -> DataFrame:
    """Project an aggregate into (metric, grp, value) rows via ONE
    explode — not a union of per-metric selects, which would re-evaluate
    the source aggregate (and re-scan its input) once per metric."""
    kvs = F.array(
        *[
            F.struct(
                F.lit(metric).alias("metric"),
                col.cast("double").alias("value"),
            )
            for metric, col in pairs
        ]
    )
    return df.select(
        grp_col.cast("string").alias("grp"), F.explode(kvs).alias("kv")
    ).select(F.col("kv.metric").alias("metric"), "grp", F.col("kv.value").alias("value"))


@query(
    "q_profile_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag),
    corr_rows AS (
      -- decimal -> double goes THROUGH VARCHAR: DuckDB's direct
      -- DECIMAL(38,4) cast double-rounds (scaled HUGEINT -> double,
      -- then /10^scale), which is 1 ulp off Spark/Java's correctly-
      -- rounded BigDecimal cast once the scaled integer exceeds 2^53
      -- (syy at sf0.001 already does); the string route is correctly
      -- rounded in one step
      SELECT 'corr_qty_price' AS metric, l_returnflag AS grp,
             (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE)
                       * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE)
                         * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS value
      FROM m
      UNION ALL
      SELECT 'group_n', l_returnflag, CAST(n AS DOUBLE) FROM m),
    pct_rows AS (
      SELECT 'p25_qty' AS metric, l_returnflag AS grp,
             quantile_cont(l_quantity, 0.25) AS value
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT 'p50_qty', l_returnflag, quantile_cont(l_quantity, 0.50)
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT 'p75_qty', l_returnflag, quantile_cont(l_quantity, 0.75)
      FROM lineitem GROUP BY l_returnflag),
    uniq_rows AS (
      SELECT 'n_rows' AS metric, 'orders.o_orderkey' AS grp,
             CAST(COUNT(*) AS DOUBLE) AS value FROM orders
      UNION ALL
      SELECT 'n_keys', 'orders.o_orderkey',
             CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) FROM orders
      UNION ALL
      SELECT 'n_dup_rows', 'orders.o_orderkey',
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE) FROM orders
      UNION ALL
      SELECT 'n_rows', 'lineitem.(l_orderkey,l_linenumber)',
             CAST(COUNT(*) AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'n_keys', 'lineitem.(l_orderkey,l_linenumber)',
             CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'n_dup_rows', 'lineitem.(l_orderkey,l_linenumber)',
             CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                  AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'n_keys', 'orders.o_custkey',
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) FROM orders),
    kmv AS ({kmv_cte}),
    kmv_rows AS (
      SELECT 'kmv_k' AS metric, 'orders.o_custkey' AS grp,
             CAST(kk AS DOUBLE) AS value FROM kmv
      UNION ALL
      SELECT 'kmv_est_distinct', 'orders.o_custkey',
             CAST(est_distinct AS DOUBLE) FROM kmv),
    {cms_cte},
    cms_rows AS (
      SELECT 'cms_row_total' AS metric, CAST(i AS VARCHAR) AS grp,
             CAST(SUM(cnt) AS DOUBLE) AS value FROM cmsk GROUP BY i
      UNION ALL
      SELECT 'cms_cells', 'orders.o_custkey', CAST(COUNT(*) AS DOUBLE)
      FROM cmsk
      UNION ALL
      SELECT 'cms_max_over', 'orders.o_custkey',
             CAST(MAX(est - c) AS DOUBLE) FROM cms_est
      UNION ALL
      SELECT 'cms_min_over', 'orders.o_custkey',
             CAST(MIN(est - c) AS DOUBLE) FROM cms_est
      UNION ALL
      SELECT 'cms_sum_over', 'orders.o_custkey',
             CAST(SUM(est - c) AS DOUBLE) FROM cms_est),
    {bal_cte},
    bal_rows AS (
      SELECT 'bal_n' AS metric, o_orderpriority AS grp,
             CAST(COUNT(*) AS DOUBLE) AS value FROM bal GROUP BY 2
      UNION ALL
      SELECT 'bal_sum_key', o_orderpriority,
             CAST(SUM(o_orderkey) AS DOUBLE) FROM bal GROUP BY 2),
    hist_rows AS (
      SELECT 'hist_n' AS metric,
             CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR)
               AS grp,
             CAST(COUNT(*) AS DOUBLE) AS value
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'hist_sum_price',
             CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders GROUP BY 2),
    sample_rows AS (
      SELECT 'sample_n' AS metric, l_returnflag AS grp,
             CAST(COUNT(*) AS DOUBLE) AS value
      FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_returnflag
      UNION ALL
      SELECT 'sample_sum_qty', l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_returnflag
      UNION ALL
      SELECT 'p50_qty_sampled', l_returnflag,
             quantile_cont(l_quantity, 0.50)
      FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_returnflag),
    split_rows AS (
      SELECT 'split_n' AS metric, {split_case} AS grp,
             CAST(COUNT(*) AS DOUBLE) AS value
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'split_sum_price', {split_case},
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'hsample_n', {split_case},
             CAST(COUNT(*) FILTER (WHERE {sample_pred}) AS DOUBLE)
      FROM orders GROUP BY 2),
    pk0 AS (
      SELECT doc_id, len({doc_tokens}) AS n FROM documents),
    pk1 AS (
      SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS excl
      FROM pk0),
    pack_rows AS (
      SELECT 'pack_n' AS metric,
             CAST(excl // {pack_budget} AS VARCHAR) AS grp,
             CAST(COUNT(*) AS DOUBLE) AS value
      FROM pk1 GROUP BY 2
      UNION ALL
      SELECT 'pack_tokens', CAST(excl // {pack_budget} AS VARCHAR),
             CAST(SUM(n) AS DOUBLE)
      FROM pk1 GROUP BY 2),
    {mix_cte},
    mix_agg AS (
      SELECT source || ':' || CAST(epoch AS VARCHAR) AS grp,
             COUNT(*) AS mn, SUM(doc_id) AS msum,
             SUM(n_chars) AS mchars
      FROM mix GROUP BY 1),
    mix_rows AS (
      SELECT 'mix_n' AS metric, grp, CAST(mn AS DOUBLE) AS value
      FROM mix_agg
      UNION ALL SELECT 'mix_sum_id', grp, CAST(msum AS DOUBLE)
      FROM mix_agg
      UNION ALL SELECT 'mix_chars', grp, CAST(mchars AS DOUBLE)
      FROM mix_agg)
    SELECT * FROM corr_rows
    UNION ALL SELECT * FROM pct_rows
    UNION ALL SELECT * FROM uniq_rows
    UNION ALL SELECT * FROM hist_rows
    UNION ALL SELECT * FROM sample_rows
    UNION ALL SELECT * FROM split_rows
    UNION ALL SELECT * FROM pack_rows
    UNION ALL SELECT * FROM kmv_rows
    UNION ALL SELECT * FROM cms_rows
    UNION ALL SELECT * FROM bal_rows
    UNION ALL SELECT * FROM mix_rows
    """.format(
        split_case=_SPLIT_CASE,
        sample_pred=sampling.duckdb_sample_predicate(
            _SAMPLE_RATE, "o_orderkey"
        ),
        doc_tokens=H.duckdb_tokens("text"),
        pack_budget=PACK_BUDGET,
        kmv_cte=sketches.duckdb_kmv_cte("o_custkey", "orders"),
        cms_cte=sketches.duckdb_cms_cte("o_custkey", "orders"),
        bal_cte=sampling.duckdb_balanced_cte(
            "orders", "o_orderpriority", BAL_CAP, "o_orderkey"
        ),
        mix_cte=sampling.duckdb_mix_cte(
            MIX_WEIGHTS, max_epochs=MIX_EPOCHS
        ),
    ),
)
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiling audit pass.  Correlation avoids the built-in
    ``corr`` (order-dependent double streaming): DECIMAL moment sums are
    exact and order-free, and the final coefficient is one fixed double
    expression tree, so it verifies bitwise.  Exact percentiles need a
    per-group sort; ``approx_percentile`` (KLL/GK sketch, one pass,
    mergeable) is the 100 TB path — tested with a tolerance bound in
    tests/test_relational.py since sketches aren't cross-engine
    reproducible.  The distinct-counts are two-stage partial aggregates,
    never a global collect; the systematic key-modulo sample is
    reproducible across engines, unlike ``TABLESAMPLE``."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = "decimal(18,2)"
    x = F.col("l_quantity").cast(d)
    y = F.col("l_extendedprice").cast(d)
    sampled = F.col("l_orderkey") % 50 == 0

    # ONE lineitem pass serves correlation moments, exact percentiles,
    # AND the systematic-sample aggregates: all are per-returnflag
    # aggregates, the sample via conditional (filtered) aggregation.
    # A second lineitem pass covers the whole-table key-uniqueness
    # distinct-count; orders takes one pass per grain (global, bucket,
    # split — the hash-sample audit rides the split pass as a
    # conditional aggregate; the KMV sketch audit adds one orders pass
    # of its own, distinct-hash top-k being a different grain, while
    # its exact-truth count rides o_uniq's Expand-rewritten multi-
    # distinct aggregate for free; the Count-Min audit adds a per-key
    # truth pass, and the balanced-sample audit a counts pass + the
    # prefilter+rank pass).  11 column-pruned parquet scans in this
    # plan (pinned by test_profile_stats_bounded_scans), plus ONE
    # documents scan inside the packing audit's (lazy) checkpoint job
    # and one orders scan inside the CMS sketch materialization — at
    # 100 TB the scan count IS the audit's cost.
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.count(F.when(sampled, 1)).alias("sn"),
        F.sum(F.when(sampled, x)).cast("double").alias("ssum"),
        # sampled-quantile: the exact percentile of the DETERMINISTIC
        # systematic sample — unlike approx_percentile's KLL sketch
        # this scale substitute is cross-engine verifiable, because
        # sample membership is a pure function of the key (same
        # argument as the KMV grain); rides the same scan/agg
        F.expr(
            "percentile(CASE WHEN l_orderkey % 50 = 0"
            " THEN l_quantity END, 0.5)"
        ).alias("p50s"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    corr = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    li_rows = _long(
        m, F.col("l_returnflag"),
        [("corr_qty_price", corr), ("group_n", F.col("n")),
         ("p25_qty", F.col("p25")), ("p50_qty", F.col("p50")),
         ("p75_qty", F.col("p75"))],
    ).unionByName(
        # conditional agg emits sn=0 groups the oracle's WHERE…GROUP BY
        # never sees — drop them to keep the surfaces identical
        _long(
            m.where(F.col("sn") > 0), F.col("l_returnflag"),
            [("sample_n", F.col("sn")), ("sample_sum_qty", F.col("ssum")),
             ("p50_qty_sampled", F.col("p50s"))],
        )
    )

    o_uniq = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        F.count_distinct("o_custkey").alias("n_cust"),
    )
    l_uniq = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey", "l_linenumber").alias("n_keys"),
    )
    # The orders uniqueness rows carry TWO grp labels (o_orderkey and
    # the KMV audit target o_custkey), so the long projection inlines
    # per-entry grp literals in ONE explode — projecting o_uniq through
    # a second union branch would duplicate the whole aggregate subtree
    # and re-scan orders (exactly the anti-pattern _long exists to
    # avoid; caught by the round-4+ review after a first cut did it).
    o_kvs = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"),
                F.lit(g).alias("grp"),
                v.cast("double").alias("value"),
            )
            for m, g, v in [
                ("n_rows", "orders.o_orderkey", F.col("n_rows")),
                ("n_keys", "orders.o_orderkey", F.col("n_keys")),
                (
                    "n_dup_rows",
                    "orders.o_orderkey",
                    F.col("n_rows") - F.col("n_keys"),
                ),
                ("n_keys", "orders.o_custkey", F.col("n_cust")),
            ]
        ]
    )
    uniq_rows = (
        o_uniq.select(F.explode(o_kvs).alias("kv"))
        .select(
            F.col("kv.metric").alias("metric"),
            F.col("kv.grp").alias("grp"),
            F.col("kv.value").alias("value"),
        )
        .unionByName(
            _long(
                l_uniq, F.lit("lineitem.(l_orderkey,l_linenumber)"),
                [("n_rows", F.col("n_rows")), ("n_keys", F.col("n_keys")),
                 ("n_dup_rows", F.col("n_rows") - F.col("n_keys"))],
            )
        )
    )

    # KMV distinct-cardinality sketch audit (round 4+): the
    # cross-engine-verifiable stand-in for approx_count_distinct —
    # the driver hash-checks the sketch's integer estimator
    # value-for-value next to the exact count above, so the audit
    # carries both the truth and the sketch that would replace it at
    # 100 TB.  Costs one extra orders scan (distinct-hash top-k is its
    # own grain; see operators/sketches.py for the prefilter that
    # bounds its shuffle at scale).
    kmv_rows = _long(
        sketches.kmv_estimate(orders, "o_custkey"),
        F.lit("orders.o_custkey"),
        [("kmv_k", F.col("kk")),
         ("kmv_est_distinct", F.col("est_distinct"))],
    )

    # Count-Min frequency-sketch audit (round 4+): the verifiable
    # stand-in for heavy-hitter estimation.  The driver hash-checks
    # the d×w counter matrix's row totals + cell count AND the whole
    # estimate-vs-truth error profile (max/min/sum of est − true over
    # every distinct key): min_over = 0 proves the ≥-true guarantee on
    # real data, value-for-value against DuckDB.  The sketch is
    # materialized once (bounded: ≤ d·w rows) and broadcast into the
    # estimate join; costs one sketch pass + one truth pass of orders.
    from mapreduce_framework_for_mergesort_spark.operators.materialize import (
        materialize,
    )

    cms = materialize(sketches.cms_sketch(orders, "o_custkey"))
    cms_row_rows = _long(
        cms.groupBy("i").agg(F.sum("cnt").alias("rt")),
        F.col("i"),
        [("cms_row_total", F.col("rt"))],
    )
    truth = (
        orders.where(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    est_err = (
        # truth rides the estimate aggregation as a carry column — a
        # second join on k would re-scan orders (caught by the scan-
        # budget test when this was first written as a join)
        sketches.cms_point_estimates(cms, truth, "k", carry=("c",))
        .agg(
            F.max(F.col("est") - F.col("c")).alias("mx"),
            F.min(F.col("est") - F.col("c")).alias("mn"),
            F.sum(F.col("est") - F.col("c")).alias("sm"),
        )
    )
    cms_kvs = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"),
                F.lit("orders.o_custkey").alias("grp"),
                v.cast("double").alias("value"),
            )
            for m, v in [
                ("cms_max_over", F.col("mx")),
                ("cms_min_over", F.col("mn")),
                ("cms_sum_over", F.col("sm")),
            ]
        ]
    )
    cms_rows = cms_row_rows.unionByName(
        _long(
            cms.agg(F.count(F.lit(1)).alias("cells")),
            F.lit("orders.o_custkey"),
            [("cms_cells", F.col("cells"))],
        )
    ).unionByName(
        est_err.select(F.explode(cms_kvs).alias("kv")).select(
            F.col("kv.metric").alias("metric"),
            F.col("kv.grp").alias("grp"),
            F.col("kv.value").alias("value"),
        )
    )

    hist = (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("hn"),
            dec_sum("o_totalprice", alias="hsum"),
        )
    )
    hist_rows = _long(
        hist, F.col("bucket"),
        [("hist_n", F.col("hn")), ("hist_sum_price", F.col("hsum"))],
    )

    # Deterministic content-hash train/val/test split audit (round 3):
    # assignment is a pure function of the key (operators/sampling.py),
    # so these counts are reproducible across engines/partitionings —
    # the property the oracle check proves.
    # hsample_n rides the same orders pass as the split grain via
    # conditional aggregation — and, because the sample hash is SALTED
    # (round-4 review), the driver check itself proves sample×split
    # independence: every split shows a ~rate-sized sampled count.
    in_sample = sampling.sample_predicate("o_orderkey", _SAMPLE_RATE)
    spl = (
        sampling.hash_split(orders, "o_orderkey")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("sn"),
            dec_sum("o_totalprice", alias="ssum"),
            F.count(F.when(in_sample, 1)).alias("hsn"),
        )
    )
    split_rows = _long(
        spl, F.col("split"),
        [("split_n", F.col("sn")), ("split_sum_price", F.col("ssum")),
         ("hsample_n", F.col("hsn"))],
    )

    # Sequence-packing audit: the distributed exclusive prefix sum
    # (range partition + mapInPandas running sums + broadcast offsets,
    # operators/sampling.pack_documents) must reproduce the oracle's
    # single-window formulation value-for-value — the driver
    # hash-checks a partitioning-dependent-looking algorithm is in fact
    # partitioning-independent.
    docs = load_table(spark, sf_dir, "documents")
    packed = sampling.pack_documents(docs, PACK_BUDGET)
    pk = packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("n_tokens").alias("ptok"),
    )
    pack_rows = _long(
        pk, F.col("pack_id"),
        [("pack_n", F.col("pn")), ("pack_tokens", F.col("ptok"))],
    )

    # Cluster-balanced sampling audit (round 4+): per-stratum capped
    # selection by salted-hash rank (the SemDeDup-style cluster cap),
    # two-phase so the rank window never sees more than ~slack·cap
    # rows per stratum.  The driver hash-checks per-stratum counts AND
    # a membership fingerprint (sum of kept keys) against the oracle's
    # replica of both phases.  Costs a counts pass + a prefilter+rank
    # pass of orders.
    bal = sampling.balanced_sample(
        orders, "o_orderpriority", BAL_CAP, key="o_orderkey"
    )
    bal_rows = _long(
        bal.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("o_orderkey").alias("bsum"),
        ),
        F.col("o_orderpriority"),
        [("bal_n", F.col("bn")), ("bal_sum_key", F.col("bsum"))],
    )

    # Source-mixing audit (round 4+): the budget-driven mixture plan is
    # exact-integer arithmetic (operators/sampling.mix_plan), so the
    # oracle recomputes the SAME plan from the same counts in HUGEINT
    # and the driver hash-checks per-(source, epoch) membership
    # fingerprints — counts, id-sums, and char-sums of the mixed set.
    mixed = sampling.mix_sources(docs, MIX_WEIGHTS, max_epochs=MIX_EPOCHS)
    mx = mixed.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("mn"),
        F.sum("doc_id").alias("msum"),
        F.sum("n_chars").alias("mchars"),
    )
    mix_rows = _long(
        mx,
        F.concat_ws(":", F.col("source"), F.col("epoch")),
        [
            ("mix_n", F.col("mn")),
            ("mix_sum_id", F.col("msum")),
            ("mix_chars", F.col("mchars")),
        ],
    )

    return (
        li_rows.unionByName(uniq_rows)
        .unionByName(hist_rows)
        .unionByName(split_rows)
        .unionByName(pack_rows)
        .unionByName(kmv_rows)
        .unionByName(cms_rows)
        .unionByName(bal_rows)
        .unionByName(mix_rows)
    )
