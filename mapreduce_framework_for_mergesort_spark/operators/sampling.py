"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is the obvious Spark answer but the wrong one for
training data at scale: its assignment depends on partitioning and seed
plumbing, so re-running after a repartition (or in another engine)
reshuffles examples across train/val/test — a leakage bug.  The durable
contract is *content addressing*: split membership is a pure function of
a stable key, so any engine, any partitioning, any rerun agrees row for
row.

Mechanism: the first two hex chars of ``md5(key)`` give 256 equal-mass
buckets; cumulative weight boundaries are rounded onto bucket edges and
compared LEXICALLY (lowercase hex compares bytewise identically in every
engine — no hex→int conversion, which engines disagree on).  Map-only,
no shuffle, codegen-friendly; resolution is 1/256 of the corpus, plenty
for split ratios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.operators.materialize import (
    materialize as _materialize,
)

Weights = list[tuple[str, float]]

DEFAULT_SPLITS: Weights = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def split_boundaries(splits: Weights = DEFAULT_SPLITS) -> list[tuple[str, str]]:
    """(name, exclusive upper hex-bucket bound) per split, last bound
    open-ended.  Shared by the Spark expression and the DuckDB oracle so
    both derive thresholds from the same arithmetic.

    Non-final bounds cap at 0xff (not 0x100: ``format(256, '02x')``
    yields the 3-char string ``'100'``, which every 2-char hash compares
    AGAINST lexically as greater-or-equal — a near-total misroute).  The
    cap means bucket 0xff always belongs to the last split; at the
    module's documented 1/256 resolution that bias is within the
    quantization error already accepted."""
    total = sum(w for _, w in splits)
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name, w in splits:
        cum += w / total
        out.append((name, format(min(255, int(round(cum * 256))), "02x")))
    return out


def split_column(key: Column, splits: Weights = DEFAULT_SPLITS) -> Column:
    """Split-name column for ``key`` (any type; cast to string first).

    NULL keys go EXPLICITLY to the first (largest, by convention) split:
    md5(NULL) is NULL, so without the guard every WHEN would evaluate
    NULL and the otherwise() branch would silently dump null-keyed rows
    into the LAST split — inflating the eval side, the worst place for
    an accident.  Mirrored in ``duckdb_split_case``."""
    h = F.substring(F.md5(key.cast("string").cast("binary")), 1, 2)
    bounds = split_boundaries(splits)
    expr = F.when(key.isNull(), bounds[0][0])
    for name, ub in bounds[:-1]:
        expr = expr.when(h < ub, name)
    return expr.otherwise(bounds[-1][0])


def hash_split(
    df: DataFrame, key: str, splits: Weights = DEFAULT_SPLITS
) -> DataFrame:
    """Add a ``split`` column assigning each row by content-hash of
    ``df[key]``.  Deterministic across runs, partitionings, and engines;
    rows with equal keys land in the same split (exactly what you want:
    duplicates must not straddle a train/test boundary)."""
    return df.withColumn("split", split_column(F.col(key), splits))


def leakage_safe_split(
    documents: DataFrame,
    splits: Weights = DEFAULT_SPLITS,
    key: str = "doc_id",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """``hash_split`` with the leakage guarantee a train/eval split
    actually needs: NEAR-DUPLICATE clusters never straddle a boundary.
    Keying the split on md5(text) already keeps exact copies together
    (``pipelines.prepare_training_shards``); a near-dup of a training
    document landing in val/test still leaks.  Here every document
    routes by its near-dup CLUSTER's content key — the MINIMUM
    md5(text) over the cluster — so members travel together, and the
    key is a pure function of the cluster's content set: doc-id
    renumbering, reruns, and engines all agree.

    Clustering reuses the dedup stack at its scale-safe shape: band
    exact-dup representatives only, reconnect replicas through linear
    (representative, replica) edges, close with the O(log d)
    star-contraction-backed propagation (``cluster_pairs``).  Pass
    ``clusters`` (node, cluster) to reuse a clustering the pipeline
    already computed — the split then costs two grain-sized joins and
    one cluster-count-sized aggregate on top.

    Singleton documents reduce to ``split_column(md5(text))`` exactly
    (their cluster key is their own hash) — pinned in tests.

    This is a ONE-SHOT batch routing: re-running it after the corpus
    grows can re-route documents whose clusters a new arrival merged.
    For incremental pipelines use ``assign_splits_stable``, which
    persists assignments and pins first-assignment-wins."""
    from mapreduce_framework_for_mergesort_spark.operators import dedup as D

    if clusters is None:
        reps = D.exact_rep_ids(documents, key)
        pool = documents.join(reps, key, "semi")
        pairs = D.lsh_candidate_pairs(D.minhash_bands(pool)).unionByName(
            D.exact_dup_edges(documents, key)
        )
        clusters = D.cluster_pairs(pairs, nodes=documents.select(key))
    hashed = documents.withColumn(
        "__h", F.md5(F.col("text").cast("binary"))
    ).join(clusters, F.col(key) == F.col("node"))
    ckey = hashed.groupBy("cluster").agg(F.min("__h").alias("__ck"))
    return (
        hashed.join(ckey, "cluster")
        .withColumn("split", split_column(F.col("__ck"), splits))
        .drop("__h", "__ck", "node", "cluster")
    )


def assign_splits_stable(
    documents: DataFrame,
    state_path: str,
    splits: Weights = DEFAULT_SPLITS,
    key: str = "doc_id",
    clusters: DataFrame | None = None,
    epoch: int | None = None,
) -> DataFrame:
    """``leakage_safe_split`` with FIRST-ASSIGNMENT-WINS stability
    across incremental runs (round 7, round-6 verdict item 2).

    ``leakage_safe_split`` routes by the near-dup cluster's min-md5
    content key, recomputed per run — correct for one batch curation,
    but under continuous ingestion a later batch can MERGE two
    clusters (a new document bridges them) and flip the routing key of
    documents already shipped to a split: silent cross-increment eval
    leakage.  Here split assignments are PERSISTED at ``state_path``
    and never revised:

    * a document already in the state keeps its recorded split,
      verbatim — an assignment, once shipped, is immutable (the same
      first-arrival-wins discipline ``streaming.ingest.accept_batch``
      uses for the accept decision);
    * a NEW document whose cluster contains previously-assigned
      members INHERITS a prior split — the one recorded for the
      cluster member with the minimum content hash, so the choice is
      deterministic and content-addressed even when a bridge has
      merged clusters whose prior members straddle splits (that
      straddle is pre-existing, structural leakage this function can
      no longer fix — surface it with ``split_leakage_report`` and
      quarantine, rather than silently re-routing shipped docs);
    * a new document in an all-new cluster routes exactly like
      ``leakage_safe_split`` (cluster min-md5 through
      ``split_column``).

    ``documents`` must be the CURRENT CORPUS SNAPSHOT (or at least
    every member of every cluster touching the rows being assigned) —
    clusters computed over a lone increment cannot see the near-dup
    edges that bridge into history.  Pass ``clusters`` (node, cluster)
    to reuse a clustering the pipeline already computed.

    Persistence mirrors ``accept_batch``: with ``epoch`` the new
    assignments write to an ``epoch=N`` partition via overwrite
    (idempotent replay, latest-epoch-only replay guard); ``epoch=None``
    appends flat (at-least-once, backfills).  Returns ``documents``
    plus a ``split`` column covering every input row."""
    from mapreduce_framework_for_mergesort_spark.operators import dedup as D
    from mapreduce_framework_for_mergesort_spark.streaming.ingest import (
        _exclude_epoch,
        _max_persisted_epoch,
        _read_optional,
    )

    spark = documents.sparkSession
    if epoch is not None:
        persisted = _max_persisted_epoch(spark, state_path)
        if persisted is not None and epoch < persisted:
            raise ValueError(
                f"epoch {epoch} is older than the latest persisted "
                f"epoch {persisted}: split-assignment replay is only "
                "idempotent for the latest epoch"
            )
    if clusters is None:
        reps = D.exact_rep_ids(documents, key)
        pool = documents.join(reps, key, "semi")
        pairs = D.lsh_candidate_pairs(D.minhash_bands(pool)).unionByName(
            D.exact_dup_edges(documents, key)
        )
        clusters = D.cluster_pairs(pairs, nodes=documents.select(key))
    hashed = documents.withColumn(
        "__h", F.md5(F.col("text").cast("binary"))
    ).join(clusters, F.col(key) == F.col("node"))

    prior = _exclude_epoch(_read_optional(spark, state_path), epoch)
    if prior is not None:
        prior = prior.select(key, F.col("split").alias("__prior"))
        prior = _materialize(prior)
        hashed = hashed.join(prior, key, "left")
    else:
        hashed = hashed.withColumn("__prior", F.lit(None).cast("string"))
    hashed = _materialize(hashed)

    # deterministic inheritance key: the prior split recorded for the
    # cluster member with the minimum content hash
    inherit = (
        hashed.where(F.col("__prior").isNotNull())
        .groupBy("cluster")
        .agg(F.min(F.struct("__h", "__prior")).alias("__m"))
        .select("cluster", F.col("__m.__prior").alias("__inherit"))
    )
    ckey = hashed.groupBy("cluster").agg(F.min("__h").alias("__ck"))
    assigned = (
        hashed.join(inherit, "cluster", "left")
        .join(ckey, "cluster")
        .withColumn(
            "split",
            F.coalesce(
                F.col("__prior"),
                F.col("__inherit"),
                split_column(F.col("__ck"), splits),
            ),
        )
    )
    new_rows = _materialize(
        assigned.where(F.col("__prior").isNull()).select(key, "split")
    )
    if epoch is None:
        new_rows.write.mode("append").parquet(state_path)
    else:
        new_rows.write.mode("overwrite").parquet(
            f"{state_path}/epoch={epoch}"
        )
    return assigned.drop("__h", "__prior", "__inherit", "__ck",
                         "node", "cluster")


def split_leakage_report(
    assigned: DataFrame,
    key: str = "doc_id",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Near-dup clusters whose STABLE assignments straddle more than
    one split — the structural leakage ``assign_splits_stable`` can
    detect but must not silently fix (re-routing shipped documents is
    the worse bug).  Input is the output of ``assign_splits_stable``
    (documents + ``split``); returns one row per straddling cluster:
    (cluster, n_docs, n_splits, splits — sorted distinct names).  The
    pipeline owner's move is to quarantine these clusters from eval
    sets, and the report is tiny (bounded by straddling clusters, not
    corpus size)."""
    from mapreduce_framework_for_mergesort_spark.operators import dedup as D

    if clusters is None:
        reps = D.exact_rep_ids(assigned, key)
        pool = assigned.join(reps, key, "semi")
        pairs = D.lsh_candidate_pairs(D.minhash_bands(pool)).unionByName(
            D.exact_dup_edges(assigned, key)
        )
        clusters = D.cluster_pairs(pairs, nodes=assigned.select(key))
    return (
        assigned.join(clusters, F.col(key) == F.col("node"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
            F.sort_array(F.collect_set("split")).alias("splits"),
        )
        .where(F.col("n_splits") > 1)
    )


def duckdb_split_case(key_sql: str, splits: Weights = DEFAULT_SPLITS) -> str:
    """The oracle-side CASE expression, from the same boundaries (NULL
    guard included so both engines route null keys identically)."""
    h = f"substring(md5(CAST({key_sql} AS VARCHAR)), 1, 2)"
    bounds = split_boundaries(splits)
    whens = " ".join(
        f"WHEN {h} < '{ub}' THEN '{name}'" for name, ub in bounds[:-1]
    )
    null_guard = f"WHEN {key_sql} IS NULL THEN '{bounds[0][0]}'"
    return f"CASE {null_guard} {whens} ELSE '{bounds[-1][0]}' END"


def pack_documents(
    documents: DataFrame,
    budget: int,
    key: str = "doc_id",
    count_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign every document the
    (``pack_id``, ``pack_offset``) where its first token lands when the
    corpus is concatenated in ``key`` order and cut into fixed
    ``budget``-token training sequences — the standard LM pre-training
    batch layout (documents straddle pack boundaries; nothing is padded
    or dropped).  Output adds ``n_tokens``, ``pack_id``, ``pack_offset``.

    The core is a GLOBAL EXCLUSIVE PREFIX SUM of per-doc token counts —
    the same 'never one task sees all rows' discipline as
    ``sort.with_global_rank``, extended from counting to summing:

    1. range-partition + sort by ``key`` (globally ordered partitions,
       sampled boundaries);
    2. per-partition token totals reduce map-side to ONE row per
       partition; a window over those #partitions rows (never data
       rows) cumulates them into partition start offsets,
       broadcast-joined back;
    3. the within-partition running sum runs in ``mapInPandas`` — the
       partition's Arrow batches arrive in partition order, so a
       NumPy ``cumsum`` carried across batches is exact and
       shuffle-free (a ``Window.partitionBy(pid)`` here would force a
       full extra hash exchange of every data row — the same trap the
       rank operator documents).

    All arithmetic is int64 (token counts), so the result is
    partitioning-independent and exactly replicable in SQL — the parity
    test pins it against a DuckDB window formulation.

    ``count_col``: use an existing per-doc length column instead of the
    canonical tokenizer (e.g. real tokenizer counts computed upstream).

    ``key`` must be UNIQUE: it is the concatenation order, and duplicate
    keys leave tie order engine-/run-defined — the same total-order
    contract ``sort.with_global_rank`` documents for its rank column.
    """
    import pandas as pd

    from pyspark.sql import Window

    from mapreduce_framework_for_mergesort_spark.functions import (
        hashing as H,
    )

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if count_col is None:
        sized = documents.withColumn(
            "n_tokens",
            F.expr(f"size({H.spark_tokens('text')})").cast("long"),
        )
        count_col = "n_tokens"
    else:
        sized = documents.withColumn(
            "n_tokens", F.col(count_col).cast("long")
        )

    pid, mid = "__pack_pid", "__pack_mid"
    # Materialized: the totals branch and the mapInPandas branch below
    # would otherwise EACH re-execute the range shuffle + sort (2× the
    # dominant cost), and with duplicate keys the two executions could
    # order ties differently — offsets computed against one order,
    # local cumsums against another (round-4 review).  The lineage cut
    # makes both branches read the same physical rows.
    # eager=False: the checkpoint materializes on the FIRST action over
    # the returned plan instead of at DataFrame-construction time (a
    # registered query must stay lazy until the driver forces it); both
    # branches still read the same physical rows once it exists.
    ranged = _materialize(
        sized.repartitionByRange(F.col(key))
        .sortWithinPartitions(key)
        .withColumn(mid, F.monotonically_increasing_id())
        .withColumn(pid, F.shiftrightunsigned(F.col(mid), 33).cast("int"))
        .drop(mid),
        eager=False,
    )

    totals = ranged.groupBy(pid).agg(F.sum("n_tokens").alias("__t"))
    offset_w = Window.orderBy(pid).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "__start", F.coalesce(F.sum("__t").over(offset_w), F.lit(0))
    ).select(pid, "__start")

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in ranged.schema
    ) + ", __local_excl bigint"

    def local_cumsum(pdfs):
        import numpy as np

        running = 0
        for pdf in pdfs:
            n = pdf["n_tokens"].to_numpy(dtype="int64")
            excl = running + np.concatenate(([0], np.cumsum(n)[:-1]))
            running += int(n.sum())
            out = pdf.copy()
            out["__local_excl"] = pd.Series(excl, index=pdf.index)
            yield out

    local = ranged.mapInPandas(local_cumsum, out_schema)
    return (
        local.join(F.broadcast(offsets), pid)
        .withColumn("__excl", F.col("__start") + F.col("__local_excl"))
        .withColumn("pack_id", F.expr(f"__excl div {budget}"))
        .withColumn("pack_offset", F.expr(f"__excl % {budget}"))
        .drop(pid, "__local_excl", "__start", "__excl")
    )


# --- deterministic hash sampling ------------------------------------------

SAMPLE_HEX = 8  # 16^8 ≈ 4.3e9 buckets — rate resolution ~2.3e-10

# Sampling hashes a SALTED key (key || SAMPLE_SALT): hash_split keys on
# the leading bits of the same md5(key), so an unsalted sample would be
# maximally CORRELATED with split assignment — hash_sample(rate ≤ 0.8)
# on a corpus split with DEFAULT_SPLITS would return only train rows
# (review finding, round 4).  The salt makes the two decisions
# independent functions of the key.
SAMPLE_SALT = "#sample"


def sample_threshold(rate: float) -> str:
    """Fixed-width lowercase hex threshold for ``rate`` — shared by the
    Spark predicate and the DuckDB mirror so both engines derive the cut
    from the same arithmetic (lexical compare on fixed-width lowercase
    hex is bytewise identical everywhere).

    rate 1.0 returns the sentinel ``'g'`` — ``format(16^8, '08x')`` is
    the NINE-char ``'100000000'``, and an 8-char hash compares against
    it char-by-char, keeping only hashes starting '0' (the same
    fixed-width overflow ``split_boundaries`` documents); ``'g'`` sorts
    after every hex char, so every hash passes."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(round(rate * 16**SAMPLE_HEX))
    if n >= 16**SAMPLE_HEX:
        return "g"
    return format(n, f"0{SAMPLE_HEX}x")


def hash_sample(df: DataFrame, rate: float, key: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 8 hex
    chars of ``md5(key)`` fall below the rate threshold.

    The same contract as ``hash_split``, for the same reason
    ``df.sample`` is wrong at scale: ``sample``'s membership depends on
    partitioning and seed plumbing, so a rerun after a repartition
    selects DIFFERENT rows — poison for reproducible corpus curation.
    Here membership is a pure function of the key: any engine, any
    layout, any rerun agrees row for row, equal keys travel together,
    and the filter is map-only codegen (no shuffle, no RNG state).

    The predicate (exactly, for third-engine mirrors): keep iff
    ``substring(md5(CAST(key AS VARCHAR) || '#sample'), 1, 8) <
    threshold`` — note the SALT; an unsalted md5(key) would share its
    leading bits with ``hash_split``'s decision (see ``SAMPLE_SALT``).
    NULL keys are never sampled (md5(NULL) is NULL → predicate NULL →
    row dropped), mirrored exactly by the DuckDB predicate.
    """
    return df.where(sample_predicate(key, rate))


def sample_predicate(key: str, rate: float) -> Column:
    """The boolean sample-membership column for ``key`` at ``rate`` —
    the ONE definition ``hash_sample``, ``stratified_hash_sample``'s
    default, and the profiling audit all share (and
    ``duckdb_sample_predicate`` mirrors)."""
    return _sample_hash(key) < sample_threshold(rate)


def _sample_hash(key: str, salt: str = SAMPLE_SALT) -> Column:
    """The ONE Spark spelling of the salted membership hash — shared by
    hash_sample/stratified_hash_sample (SAMPLE_SALT) and mix_sources
    (MIX_SALT); ``_duckdb_hash_int`` is its oracle mirror."""
    return F.substring(
        F.md5(
            F.concat(F.col(key).cast("string"), F.lit(salt)).cast(
                "binary"
            )
        ),
        1,
        SAMPLE_HEX,
    )


def _duckdb_hash_int(key_sql: str, salt: str) -> str:
    """Oracle mirror of ``_sample_hash`` as an integer (hex-string <
    fixed-width literal ⟺ int < threshold)."""
    return (
        f"CAST('0x' || substring(md5(CAST({key_sql} AS VARCHAR) || "
        f"'{salt}'), 1, {SAMPLE_HEX}) AS BIGINT)"
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of high-quality strata, 10% of a boilerplate-heavy
    domain): each row's keep-threshold comes from its ``stratum_col``
    value via ``rates``; strata not listed get ``default_rate``.

    One map-only codegen filter: the per-stratum thresholds compile to
    a CASE over literal hex cuts against the same md5(key) prefix as
    ``hash_sample`` — membership stays a pure function of (key,
    stratum), so re-mixing with different rates REUSES prior decisions
    (a row kept at 10% is a subset of the rows kept at 20%; raising a
    stratum's rate only ADDS rows — nested samples by construction).
    """
    h = _sample_hash(key)
    cut = F.lit(sample_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        cut = F.when(
            F.col(stratum_col) == value, F.lit(sample_threshold(rate))
        ).otherwise(cut)
    return df.where(h < cut)


def duckdb_sample_predicate(rate: float, key_sql: str) -> str:
    """Oracle-side WHERE predicate replicating ``hash_sample`` (same
    salt, same threshold arithmetic)."""
    return (
        f"substring(md5(CAST({key_sql} AS VARCHAR) || '{SAMPLE_SALT}'),"
        f" 1, {SAMPLE_HEX}) < '{sample_threshold(rate)}'"
    )


# --- cluster-balanced (capped per-stratum) sampling ------------------------

BALANCE_SALT = "#balance"  # decorrelated from split/sample/mix decisions
BALANCE_SLACK = 4  # prefilter keeps ~slack·cap rows per stratum for ranking
_BAL_SPACE = 16**SAMPLE_HEX  # integer hash domain (shared 8-hex-char space)


def balanced_sample(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    key: str = "doc_id",
    slack: int = BALANCE_SLACK,
    counts: DataFrame | None = None,
) -> DataFrame:
    """At most ``cap`` rows per stratum, chosen by salted-hash rank —
    the cluster-balancing curation step (SemDeDup/DoReMi-style): assign
    docs to semantic clusters (e.g. ``similarity.ivf_cells``'s k-means
    cell column over embeddings), then cap each cluster so a few giant
    clusters can't dominate the training mix.

    Membership is a pure function of (key, stratum population):
    rerun-, partitioning-, and engine-proof, like every sampler here.

    100 TB shape — the naive form (rank every row within its stratum)
    windows the WHOLE corpus through one task per hot stratum.  This
    is two-phase instead: (1) per-stratum counts (one map-side-combined
    agg, ≤ #strata rows) joined back; (2) a map-only hash PREFILTER
    keeps each row iff ``h < SPACE·slack·cap // n`` (everything when
    n ≤ slack·cap), so the rank window sees ~slack·cap rows per
    stratum, not n.  The window then takes the cap smallest (h, key).
    Both phases are exact integer arithmetic the oracle replicates
    (``duckdb_balanced_cte``), so the output is still value-verifiable.

    Honest caveat, by design: the prefilter is a Bernoulli cut, so
    with probability ~e^-O(slack·cap) a stratum with n > cap keeps
    fewer than cap rows (never more).  That is acceptable for corpus
    balancing — and because the oracle replicates the same two-phase
    computation, determinism and verifiability hold regardless.
    NULL keys and NULL strata drop (hash/join semantics, mirrored
    exactly by the oracle's JOIN USING).

    Contract: ``key`` must uniquely identify rows (the doc_id
    contract every sampler here shares) — the rank's tiebreak is
    (hash, key), so duplicate keys within a stratum sort arbitrarily
    and WHICH physical copy survives a cap cut is partition-dependent
    (the kept key-multiset is still deterministic).

    The counts join is deliberately NOT force-broadcast: #strata is
    data-dependent (a user-id stratum is unbounded — the tf↔df
    argument in ``text.tfidf_top_terms``), so small stratum tables
    auto-broadcast under AQE and large ones degrade safely to a
    shuffle join on a column both sides are already aggregated/keyed
    by.

    ``counts``: precomputed per-stratum populations as
    ``(stratum_col, __n)`` — inject when another pass over ``df``
    already grouped by the stratum (the ``q_profile_stats``
    shared-scan consolidation), saving phase 1's scan.  Must equal
    ``df.groupBy(stratum_col).count()`` exactly or the prefilter
    thresholds (and thus membership) silently shift.
    """
    from pyspark.sql import Window

    from mapreduce_framework_for_mergesort_spark.functions import hashing as H

    if counts is None:
        counts = df.groupBy(stratum_col).agg(
            F.count(F.lit(1)).alias("__n")
        )
    h = F.expr(
        H.spark_base_hash(f"CAST({key} AS STRING) || '{BALANCE_SALT}'")
    )
    t = F.expr(
        f"least(CAST({_BAL_SPACE} AS BIGINT), "
        f"CAST({_BAL_SPACE} AS BIGINT) * {slack * cap} div __n)"
    )
    pre = (
        df.join(counts, stratum_col)
        .withColumn("__h", h)
        .where(F.col("__h") < t)
    )
    w = Window.partitionBy(stratum_col).orderBy("__h", key)
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__n", "__h", "__rn")
    )


def duckdb_balanced_cte(
    table: str,
    stratum_sql: str,
    cap: int,
    key_sql: str = "doc_id",
    slack: int = BALANCE_SLACK,
) -> str:
    """Oracle replica of ``balanced_sample`` exposing ``bal`` (the kept
    rows): same salted integer hash, same integer prefilter threshold,
    same (h, key) rank."""
    h = _duckdb_hash_int(key_sql, BALANCE_SALT)
    return f"""
    bal_pre AS (
      SELECT d.*, {h} AS __h
      FROM {table} d
      JOIN (SELECT {stratum_sql} AS __s, COUNT(*) AS __n
            FROM {table} GROUP BY 1) c
        ON d.{stratum_sql} = c.__s
      WHERE {h} < least(CAST({_BAL_SPACE} AS BIGINT),
                        CAST({_BAL_SPACE} AS BIGINT) * {slack * cap} // __n)),
    bal AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY {stratum_sql} ORDER BY __h, {key_sql}) AS __rn
        FROM bal_pre)
      WHERE __rn <= {cap})
    """


# --- budget-driven source mixing -------------------------------------------
# The Pile/LLaMA-style mixture mechanic: target mixture WEIGHTS over a
# stratum column (data domain/source), with small domains allowed to
# repeat up to max_epochs times — the knob real pretraining mixes turn
# (web 1 epoch, books/wiki several).  All plan arithmetic is EXACT
# INTEGER (weights are integer ratios; rates live in 2^-32 units), so
# the DuckDB oracle reproduces the plan bit-for-bit with HUGEINT math —
# no cross-engine float rounding anywhere.

MIX_SALT = "#mix"  # decorrelates the fractional-epoch sample from
#                    hash_sample ('#sample') and hash_split decisions
_MIX_ONE = 16**SAMPLE_HEX  # rate denominator: 1.0 epoch == 2^32


def mix_plan(
    avails: dict[str, int],
    weights: dict[str, int],
    max_epochs: int = 1,
    total: int | None = None,
) -> dict[str, tuple[int, int]]:
    """Exact-integer mixing plan: per-stratum ``(full_epochs, frac)``
    where the sampling rate is ``full_epochs + frac/2^32`` epochs.

    ``weights`` are integer mixture ratios (5:3:1:1, not floats);
    ``avails`` the per-stratum available unit counts.  The plan scales
    the whole mixture to the largest total ``T`` such that no stratum
    needs more than ``max_epochs`` passes over its data —
    ``T = min_s floor(avail_s · E · den / w_s)`` — optionally capped by
    ``total``; each stratum then contributes ``w_s · T // den`` units.

    Every step is floor division on non-negative integers (Python
    arbitrary-precision here, HUGEINT in the oracle mirror), so two
    engines computing the plan from the same counts CANNOT disagree.

    Resolution floor: rates are quantized to 2^-32 epochs, so a
    stratum's planned units can fall short of its exact target by up to
    ``avail/2^32`` (~0.02 ppm) — property-pinned in tests; raise
    ``SAMPLE_HEX`` before worrying at < 10^12-unit strata.
    """
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive integers: {weights}")
    den = sum(weights.values())
    if den <= 0:
        raise ValueError("weights must be non-empty")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    if total is not None and total < 0:
        # a negative total would floor T negative -> negative full
        # epochs -> Spark's sequence(0, -1) DESCENDS while the oracle's
        # range(0, 0) is empty: silent garbage AND divergence
        raise ValueError(f"total must be >= 0, got {total}")
    missing = [s for s in weights if avails.get(s, 0) <= 0]
    if missing:
        raise ValueError(
            f"weighted strata with no available data: {missing} — the "
            "mixture is unsatisfiable (T would be 0); drop them from "
            "weights or fix the corpus"
        )
    t = min(avails[s] * max_epochs * den // w for s, w in weights.items())
    if total is not None:
        t = min(t, total)
    plan = {}
    for s, w in weights.items():
        n = (w * t // den) * _MIX_ONE // avails[s]
        plan[s] = (n // _MIX_ONE, n % _MIX_ONE)
    return plan


def mix_sources(
    df: DataFrame,
    weights: dict[str, int],
    stratum_col: str = "source",
    key: str = "doc_id",
    max_epochs: int = 1,
    total: int | None = None,
    unit_col: str | None = None,
) -> DataFrame:
    """Deterministic budget-driven mixing: sample/repeat each stratum so
    the output approaches the ``weights`` mixture (see ``mix_plan``),
    appending an ``epoch`` column (0-based; a doc kept twice appears as
    epoch 0 and 1).  Rows whose stratum has no weight are dropped.

    ``unit_col`` switches the budget unit from documents to a per-row
    integer column (e.g. a token count) — membership stays per-row, so
    token-unit targets are met in expectation, exactly like any
    Bernoulli sampler.

    Scale shape: ONE small aggregate (per-stratum counts — K rows of
    metadata to the driver, never data), then one map-only
    explode+filter pass: full epochs replicate unconditionally, the one
    fractional epoch keeps rows whose salted ``md5(key)`` falls under
    the stratum's 2^-32-unit threshold.  Membership is a pure function
    of (key, stratum, counts): rerun-, partitioning-, and engine-proof.
    """
    unit = (
        F.count(F.lit(1)) if unit_col is None else F.sum(unit_col)
    ).alias("__avail")
    avails = {
        r[stratum_col]: int(r["__avail"])
        for r in df.groupBy(stratum_col).agg(unit).collect()
    }
    plan = mix_plan(
        {s: avails.get(s, 0) for s in weights}, weights, max_epochs, total
    )
    strata = sorted(plan)
    full_col = F.lit(None).cast("int")
    frac_col = F.lit(None).cast("string")
    for s in strata:
        efull, frac = plan[s]
        full_col = F.when(F.col(stratum_col) == s, F.lit(efull)).otherwise(
            full_col
        )
        frac_col = F.when(
            F.col(stratum_col) == s,
            F.lit(format(frac, f"0{SAMPLE_HEX}x")),
        ).otherwise(frac_col)
    h = _sample_hash(key, salt=MIX_SALT)
    return (
        df.where(F.col(stratum_col).isin(strata))
        .withColumn("__efull", full_col)
        .withColumn("__frac", frac_col)
        .withColumn("epoch", F.explode(F.expr("sequence(0, __efull)")))
        .where((F.col("epoch") < F.col("__efull")) | (h < F.col("__frac")))
        .drop("__efull", "__frac")
    )


def duckdb_mix_cte(
    weights: dict[str, int],
    stratum_col: str = "source",
    key_sql: str = "doc_id",
    max_epochs: int = 1,
    total: int | None = None,
    table: str = "documents",
) -> str:
    """Oracle half of ``mix_sources`` (document-unit form): CTE chain
    ending in ``mix`` = the mixed rows (all columns + ``epoch``).  The
    plan arithmetic is the same floor-division chain in HUGEINT; the
    fractional-epoch predicate compares the hash prefix numerically
    (hex-string < fixed-width literal ⟺ int < threshold)."""
    strata = sorted(weights)
    in_list = ", ".join(f"'{s}'" for s in strata)
    w_case = "CASE src " + " ".join(
        f"WHEN '{s}' THEN {weights[s]}" for s in strata
    ) + " END"
    den = sum(weights.values())
    t_expr = f"MIN(avail * {max_epochs} * {den} // w)"
    if total is not None:
        t_expr = f"LEAST({t_expr}, {total})"
    return f"""
    mx_avail AS (
      SELECT {stratum_col} AS src, CAST(COUNT(*) AS HUGEINT) AS avail
      FROM {table} WHERE {stratum_col} IN ({in_list})
      GROUP BY 1),
    mx_w AS (SELECT src, avail, CAST({w_case} AS HUGEINT) AS w
             FROM mx_avail),
    mx_t AS (SELECT {t_expr} AS t FROM mx_w),
    mx_epochs AS (
      SELECT src,
             CAST(((w * t // {den}) * {_MIX_ONE} // avail)
                  // {_MIX_ONE} AS BIGINT) AS efull,
             CAST(((w * t // {den}) * {_MIX_ONE} // avail)
                  % {_MIX_ONE} AS BIGINT) AS frac
      FROM mx_w, mx_t),
    mx_epochrows AS (
      SELECT src, efull, frac,
             unnest(range(0, efull + 1)) AS epoch
      FROM mx_epochs),
    mix AS (
      SELECT d.*, e.epoch
      FROM {table} d JOIN mx_epochrows e ON d.{stratum_col} = e.src
      WHERE e.epoch < e.efull
         OR {_duckdb_hash_int(key_sql, MIX_SALT)} < e.frac)
    """
