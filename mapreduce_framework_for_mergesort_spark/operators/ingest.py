"""Reference I/O format: space-delimited integer text (SURVEY.md O1/O3/O9).

The reference's entire data model is one ASCII file of space-separated
ints (``NodeHandler.java:66-70`` parse, ``NodeHandler.java:88-104`` sink;
delimiter documented at ``README.md:76``).  Here that format is a thin
source/sink around the DataFrame world:

* scan/split planning (reference O1/O2, ``ServerHandler.java:44-52``,
  ``NodeHandler.java:119-200``) is Spark's FileScan: split size is
  ``spark.sql.files.maxPartitionBytes``, record-boundary ownership is the
  text line reader's — nothing to build;
* tokenize/parse (O3) is ``split`` + ``explode`` + ``try_cast`` — all
  JVM-side, whole-stage-codegen'd, no Python in the loop;
* malformed tokens become NULLs via ``try_cast`` and are dropped
  *explicitly* (reference O4's "dummy" filtering,
  ``NodeHandler.java:113-116``) — unlike the reference, which swallows
  ``NumberFormatException`` and silently drops the rest of the chunk
  (``NodeHandler.java:68-75``; SURVEY.md §1.3 non-goal).

The engine is correct over the full int domain — the reference is only
correct below its 999999 merge sentinel (``NodeHandler.java:223,238``;
regression-tested in ``tests/test_property_sort.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ints_text(
    spark: SparkSession, path: str, value_col: str = "value"
) -> DataFrame:
    """Space-delimited text → one-int-per-row DataFrame (reference O1+O3).

    Keeps NULLs for unparseable tokens; callers choose the corrupt-record
    policy (``drop_invalid`` mirrors reference O4).
    """
    lines = spark.read.text(path)
    tokens = lines.select(
        F.explode(F.split(F.col("value"), r"\s+")).alias("token")
    )
    return tokens.where(F.col("token") != "").select(
        F.col("token").try_cast("int").alias(value_col)
    )


def drop_invalid(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Reference O4: eliminate empty/invalid records
    (``NodeHandler.java:113-116``, ``Server.java:261-263``)."""
    return df.where(F.col(value_col).isNotNull())


def write_ints_text(
    df: DataFrame,
    path: str,
    value_col: str = "value",
    values_per_line: int = 1000,
    num_files: int | None = None,
) -> None:
    """DataFrame → space-delimited text (reference O9 sink,
    ``NodeHandler.java:88-104``).

    Order-preserving and shuffle-free: values are packed
    ``values_per_line`` per line *within each partition* via
    ``mapInPandas`` (Arrow batches arrive in partition order), so writing
    a globally-sorted DataFrame yields part files that are sorted within
    and across files (part file numbering follows range-partition order)
    — the reference's sorted final file, in its idiomatic N-ordered-files
    form.

    ``num_files`` is for tiny demo outputs ONLY, and be clear about what
    it costs: ``coalesce(n)`` PROPAGATES upstream (it is a non-shuffle
    repartition), so ``num_files=1`` over a fresh sort collapses the
    sort's own reduce stage to one task — the whole dataset sorted by a
    single task.  (``repartition`` would preserve upstream parallelism
    but round-robins rows, destroying the sorted output this sink
    exists to write.)  At scale leave it ``None``: one file per range
    partition, globally ordered by filename, is the correct shape.

    NULL values are dropped (the reference's sink never sees them
    either — its parser discards invalid records upstream,
    ``NodeHandler.java:113-116``); without the filter a single NULL
    reaching the packer would kill the job with an executor-side
    TypeError from ``str.join``.
    """
    packed = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("v")
    )
    if num_files:
        packed = packed.coalesce(num_files)

    def pack(batches):
        import pandas as pd

        buf: list[str] = []
        for pdf in batches:
            buf.extend(pdf["v"].tolist())
            while len(buf) >= values_per_line:
                yield pd.DataFrame({"line": [" ".join(buf[:values_per_line])]})
                del buf[:values_per_line]
        if buf:
            yield pd.DataFrame({"line": [" ".join(buf)]})

    packed.mapInPandas(pack, "line string").write.mode("overwrite").text(path)
