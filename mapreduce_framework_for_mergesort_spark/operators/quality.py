"""Declarative data-quality constraint gate (Deequ-style, one scan).

A 100 TB ingest needs a cheap *gate* between "parquet landed" and
"pipeline consumed": null fractions, key uniqueness, value ranges,
accepted categories, referential integrity.  The reference has a faint
shadow of this (arg validation + the empty-chunk "dummy" filter,
``ServerHandler.java:26-27``, ``NodeHandler.java:113-116``); here it
is a first-class operator.

Scale shape: every non-referential check compiles into ONE aggregate
row over ONE column-pruned scan (conditional aggregates — the same
consolidation discipline as ``queries/profile_family.py``), exploded
to long format afterwards; each referential check adds one
left-anti-join count (broadcast when the dimension is small).  Nothing
collects data; the result is a tiny DataFrame of verdicts a caller can
``.where("NOT ok")`` and fail the run on.

Checks are plain tuples, so suites serialize/log trivially:

    ("not_null", col, max_null_frac)
    ("unique", col)                      # no key occurs twice
    ("range", col, lo, hi)               # min/max bounds, NULLs ignored
    ("accepted", col, values, min_frac)  # fraction in the allowlist
    ("ref", col, dim_df, dim_col)        # every value exists in dim
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = tuple

_KINDS = ("not_null", "unique", "range", "accepted", "ref")


def _agg_exprs(checks: list[Check]) -> list:
    """One conditional-aggregate column per scan-local check metric."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(checks):
        kind, col = c[0], c[1]
        if kind == "not_null":
            aggs.append(
                F.count(F.when(F.col(col).isNull(), 1)).alias(f"__m{i}")
            )
        elif kind == "unique":
            aggs.append(F.countDistinct(F.col(col)).alias(f"__m{i}"))
            # count(col), not count(*): NULL keys are not duplicates
            # (SQL UNIQUE semantics — countDistinct ignores NULLs, so
            # count(*) would report every NULL-key row as a dup;
            # police NULLs with a paired not_null check)
            aggs.append(F.count(F.col(col)).alias(f"__nn{i}"))
        elif kind == "range":
            aggs.append(F.min(col).cast("double").alias(f"__lo{i}"))
            aggs.append(F.max(col).cast("double").alias(f"__hi{i}"))
        elif kind == "accepted":
            values = c[2]
            aggs.append(
                F.count(F.when(F.col(col).isin(list(values)), 1)).alias(
                    f"__m{i}"
                )
            )
    return aggs


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate ``checks`` against ``df`` → verdict rows
    ``(kind, column, ok, observed, threshold)`` — one per check, except
    ``range`` which emits ``range_min`` + ``range_max`` (each bound
    against its own observed extreme).

    ``observed``/``threshold`` are doubles in the check's natural unit:
    fractions for not_null/accepted, duplicate-key count for unique,
    orphan count for ref, the observed extreme for range.  An empty
    table (or all-NULL column for range) passes vacuously.
    """
    for c in checks:
        if c[0] not in _KINDS:
            raise ValueError(f"unknown check kind {c[0]!r}; one of {_KINDS}")
    scan_checks = [c for c in checks if c[0] != "ref"]
    verdicts: list[DataFrame] = []

    if scan_checks:
        row = df.agg(*_agg_exprs(scan_checks))
        cols = []
        for i, c in enumerate(scan_checks):
            kind, col = c[0], c[1]
            if kind == "not_null":
                thr = float(c[2])
                obs = F.col(f"__m{i}") / F.greatest(F.col("__n"), F.lit(1))
                ok = obs <= F.lit(thr)
            elif kind == "unique":
                thr = 0.0
                obs = (F.col(f"__nn{i}") - F.col(f"__m{i}")).cast("double")
                ok = obs <= F.lit(0.0)
            elif kind == "range":
                lo, hi = float(c[2]), float(c[3])
                # two verdict rows — each bound reported against its
                # own observed extreme; empty table / all-NULL column
                # → NULL extremes → vacuous pass
                cols.append(
                    F.struct(
                        F.lit("range_min").alias("kind"),
                        F.lit(col).alias("column"),
                        (~F.coalesce(
                            F.col(f"__lo{i}") < F.lit(lo), F.lit(False)
                        )).alias("ok"),
                        F.col(f"__lo{i}").alias("observed"),
                        F.lit(lo).cast("double").alias("threshold"),
                    )
                )
                cols.append(
                    F.struct(
                        F.lit("range_max").alias("kind"),
                        F.lit(col).alias("column"),
                        (~F.coalesce(
                            F.col(f"__hi{i}") > F.lit(hi), F.lit(False)
                        )).alias("ok"),
                        F.col(f"__hi{i}").alias("observed"),
                        F.lit(hi).cast("double").alias("threshold"),
                    )
                )
                continue
            elif kind == "accepted":
                thr = float(c[3])
                obs = F.col(f"__m{i}") / F.greatest(F.col("__n"), F.lit(1))
                # empty table passes vacuously (documented contract;
                # 0/1 >= thr would fail it for any thr > 0)
                ok = (F.col("__n") == 0) | (obs >= F.lit(thr))
            cols.append(
                F.struct(
                    F.lit(kind).alias("kind"),
                    F.lit(c[1]).alias("column"),
                    ok.alias("ok"),
                    obs.cast("double").alias("observed"),
                    F.lit(thr).cast("double").alias("threshold"),
                )
            )
        verdicts.append(
            row.select(F.explode(F.array(*cols)).alias("v")).select("v.*")
        )

    for c in checks:
        if c[0] != "ref":
            continue
        _, col, dim, dim_col = c
        # orphans = fact keys absent from the dimension; NULL fact keys
        # are not orphans (three-valued equality would drop them from
        # an inner join too — match that semantic explicitly)
        orphans = (
            df.where(F.col(col).isNotNull())
            .select(F.col(col).alias("__k"))
            .join(
                dim.select(F.col(dim_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("__orphans"))
        )
        verdicts.append(
            orphans.select(
                F.lit("ref").alias("kind"),
                F.lit(f"{col}->{dim_col}").alias("column"),
                (F.col("__orphans") == 0).alias("ok"),
                F.col("__orphans").cast("double").alias("observed"),
                F.lit(0.0).alias("threshold"),
            )
        )

    if not verdicts:
        # zero checks (e.g. a config-driven suite that filtered to
        # nothing): an empty verdict frame, not an IndexError —
        # assert_valid then passes trivially
        return df.sparkSession.createDataFrame(
            [],
            "kind string, column string, ok boolean, "
            "observed double, threshold double",
        )
    out = verdicts[0]
    for v in verdicts[1:]:
        out = out.unionByName(v)
    return out


def assert_valid(df: DataFrame, checks: list[Check]) -> None:
    """Gate form: raise ``ValueError`` listing every failed check.
    The collect is bounded by len(checks) rows — verdicts, not data."""
    failed = [
        r
        for r in validate(df, checks).collect()
        if not r["ok"]
    ]
    if failed:
        lines = ", ".join(
            f"{r['kind']}({r['column']}): observed={r['observed']}"
            f" threshold={r['threshold']}"
            for r in failed
        )
        raise ValueError(f"data-quality gate failed: {lines}")
