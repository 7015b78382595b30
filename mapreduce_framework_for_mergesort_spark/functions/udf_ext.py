"""User-defined extension points: scalar pandas UDF, grouped-aggregate
pandas UDF (UDAF), and a Python UDTF.

The reference has no extension surface at all (its one job is hard-coded
Java, ``NodeHandler.java``); these are the three seams a Spark engine
exposes to user code, each with its scale contract:

* **scalar pandas UDF** — Arrow-batched, columnar in/out.  The right
  seam for vectorizable numeric/string work that built-ins can't
  express.  ~10-100× faster than a row-at-a-time Python UDF, which this
  module deliberately does *not* ship in any hot path.
* **grouped-agg pandas UDF (UDAF)** — one pandas Series per group per
  column; runs after the groupBy shuffle.  Groups must fit in executor
  memory — fine for bounded keys, wrong for a power-law key with a
  billion-row head (use salting or built-in aggregates there).
* **UDTF** — one→many row expansion with its own output schema; the
  lateral-join shape (``explode`` generalized to arbitrary logic).

Everything here sticks to integer/string math so the demo queries stay
*exactly* oracle-checkable — the UDF seam itself is what's being proven,
not float luck.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import LongType


@pandas_udf(LongType())
def digit_sum(v: pd.Series) -> pd.Series:
    """Scalar pandas UDF: sum of decimal digits of a non-negative int —
    vectorized string decomposition, exact in both engines."""
    return (
        v.astype("int64")
        .astype(str)
        .map(lambda s: sum(int(c) for c in s))
        .astype("int64")
    )


@pandas_udf(LongType())
def median_long(v: pd.Series) -> int:  # Series -> scalar ⇒ grouped-agg UDF
    """Grouped-aggregate pandas UDF (UDAF): low-median (lower of the two
    middle elements) — integer-exact, order-independent, reproducible."""
    s = v.sort_values().reset_index(drop=True)
    return int(s.iloc[(len(s) - 1) // 2])


@udtf(returnType="word: string, pos: int", useArrow=True)
class SplitWords:
    """Python UDTF: one text row → one row per whitespace token with its
    position.  The generalized-explode seam; real uses are parsers and
    tokenizers that emit structured rows.  ``useArrow=True`` pins Arrow
    transfer at the decorator (conf-independent, so the driver's vanilla
    session gets columnar batches too) — plan node ArrowEvalPythonUDTF."""

    def eval(self, text: str):
        from mapreduce_framework_for_mergesort_spark.functions.hashing import (
            tokenize,
        )

        # the shared tokenizer, not str.split(): Python's unicode
        # whitespace rules diverge from the SQL oracle's explicit
        # class on \x1c-\x1f / NEL / NBSP, and round 12 adds the
        # script-aware segmentation step (see hashing.py).
        if text:
            for pos, word in enumerate(tokenize(text)):
                yield word, pos
