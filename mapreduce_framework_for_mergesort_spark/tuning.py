"""Partition/shuffle sizing advisor — the reference's ``chunkSize`` knob
(``README.md:57``), done the way a 100 TB deployment has to.

The reference makes the user pick one byte-size for everything; at scale
the two sizes that matter are chosen *per input*:

* **scan splits** (``spark.sql.files.maxPartitionBytes``): big enough to
  amortize task overhead, small enough that a task's columnar batch +
  decode fits comfortably in its memory share;
* **shuffle partitions** (``spark.sql.shuffle.partitions``): sized from
  the *shuffled* byte estimate, then AQE coalesces the tail at runtime —
  set the pre-AQE value as an upper bound, never exact.

Pure arithmetic (no Spark dependency) so it's unit-testable and usable
from planning scripts.
"""

from __future__ import annotations

from dataclasses import dataclass

MiB = 1 << 20
GiB = 1 << 30


@dataclass(frozen=True)
class ClusterProfile:
    """What sizing needs to know about the runtime."""

    total_cores: int
    executor_mem_per_core: int = 4 * GiB
    # fraction of a core's memory a shuffle partition may occupy and
    # still sort/aggregate without spilling (rest is execution overhead)
    shuffle_mem_fraction: float = 0.25


LOCAL32 = ClusterProfile(total_cores=32, executor_mem_per_core=3 * GiB)
CLUSTER_1000X4 = ClusterProfile(total_cores=4000)  # 1000 executors × 4 cores


def scan_split_bytes(
    input_bytes: int,
    profile: ClusterProfile,
    target_split: int = 128 * MiB,
    min_splits_per_core: int = 2,
) -> int:
    """Scan split size: default 128 MiB (parquet row-group friendly),
    shrunk if the input wouldn't give every core ``min_splits_per_core``
    waves — idle cores cost more than task overhead until splits get
    silly-small (floor 4 MiB)."""
    want_splits = profile.total_cores * min_splits_per_core
    if input_bytes < target_split * want_splits:
        return max(4 * MiB, input_bytes // want_splits or 4 * MiB)
    return target_split


def shuffle_partitions(
    shuffle_bytes: int,
    profile: ClusterProfile,
    round_to: int = 16,
    headroom: int = 2,
) -> int:
    """Pre-AQE shuffle partition count: each partition's share of the
    shuffled bytes must fit in its memory budget; at least 2× cores so
    stragglers overlap; rounded up for stable conf values.  AQE coalesces
    downward at runtime, so erring high is cheap and erring low spills.

    ``headroom`` multiplies the memory-derived count: without it the
    AVERAGE partition exactly fills the no-spill budget, so any skew at
    all pushes half the partitions over — and AQE can merge small
    partitions but cannot split oversized non-skew-join ones.  2×
    headroom means average occupancy is half the budget; the claim
    'erring high is cheap' is only true because this factor exists."""
    budget = int(profile.executor_mem_per_core * profile.shuffle_mem_fraction)
    by_memory = (
        -(-shuffle_bytes * headroom // budget) if shuffle_bytes else 1
    )
    floor = profile.total_cores * 2
    n = max(by_memory, floor)
    return -(-n // round_to) * round_to


def advise(input_bytes: int, profile: ClusterProfile) -> dict[str, str]:
    """Conf dict for a job whose dominant shuffle moves ~its input size
    (sorts and wide aggregations do; filtered pipelines shuffle less and
    can only over-provision, which AQE repairs)."""
    return {
        "spark.sql.files.maxPartitionBytes": str(
            scan_split_bytes(input_bytes, profile)
        ),
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions(input_bytes, profile)
        ),
    }
