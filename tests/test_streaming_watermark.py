"""Watermark-gated sessionization under genuinely late data.

Crafted multi-batch input (one file per microbatch, mtime-ordered):
a late event arrives in batch 2 that the 2-hour watermark still admits
and that falls inside a session batch 1 already completed per the key's
own timeline.  The per-key-max variant (drain-deterministic, used for
the oracle hash check) emits a split session by documented contract;
the watermarked variant must merge it correctly and emit no overlaps.

Timeline (user 1, gap=30min, watermark=2h):
  file1: 00:00, 00:10, 01:00   file2: 00:20 (late, admissible)
  file3: 05:00                 file4: user 2 @ 06:00 (idle-key timeout)
Correct sessions: [00:00-00:20] n=3, [01:00] n=1 (closed once wm=3h),
[05:00] open (never emitted on a finite drain).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mapreduce_framework_for_mergesort_spark.streaming import (
    run_to_memory,
    sessionize_stream,
    sessionize_stream_watermarked,
)

SCHEMA = "user_id bigint, ts timestamp, value double"


@pytest.fixture()
def late_events_dir(tmp_path):
    base = "2024-01-01 "
    files = [
        [(1, base + "00:00:00"), (1, base + "00:10:00"), (1, base + "01:00:00")],
        [(1, base + "00:20:00")],
        [(1, base + "05:00:00")],
        [(2, base + "06:00:00")],
    ]
    for i, rows in enumerate(files):
        pdf = pd.DataFrame(
            {
                "user_id": [u for u, _ in rows],
                "ts": pd.to_datetime([t for _, t in rows]).astype(
                    "datetime64[us]"  # TIMESTAMP(MICROS) parquet, not NANOS
                ),
                "value": [1.0] * len(rows),
            }
        )
        p = tmp_path / f"f{i}.parquet"
        pdf.to_parquet(p)
        # FileStreamSource picks files up in modification-time order;
        # pin mtimes so batch order matches file order deterministically.
        os.utime(p, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return str(tmp_path)


def _read_stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def test_watermarked_sessionize_merges_admissible_late_event(
    spark, late_events_dir
):
    got = run_to_memory(
        sessionize_stream_watermarked(
            _read_stream(spark, late_events_dir), gap="30 minutes"
        ),
        "t_sess_wm_late",
    )
    rows = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], r["total_value"])
        for r in got.collect()
    )
    assert rows == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:20:00", 3, 3.0),
        (1, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1, 1.0),
    ]


def test_perkey_max_variant_splits_by_contract(spark, late_events_dir):
    """The drain-deterministic variant's documented limitation: the same
    late event yields a split session — this is the behavior the
    watermarked variant exists to fix (ADVICE r1)."""
    got = run_to_memory(
        sessionize_stream(
            _read_stream(spark, late_events_dir), gap="30 minutes"
        ),
        "t_sess_perkey_late",
    )
    spans = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]))
        for r in got.collect()
    )
    assert (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00") in spans
    assert (1, "2024-01-01 00:20:00", "2024-01-01 00:20:00") in spans
