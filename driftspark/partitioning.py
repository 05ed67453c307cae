"""Input-parallelism guard for compute-heavy scan stages.

A parquet file is parallelized at ROW-GROUP granularity: a table written
as one row group scans as ONE task no matter how many byte-range splits
the reader makes, so every downstream narrow transformation (explode,
n-gram windows, per-token hashing, bin comparisons, regex extraction)
runs single-threaded until the first exchange while the rest of the
cluster idles (guide §2.5 input skew / §6 file layout).

``spread_input`` round-robins such inputs across the cluster ONLY when
the scan yields fewer partitions than ``min_fraction`` of the default
parallelism — at real scale the input has >= parallelism splits and the
guard is a plan-only no-op, so no shuffle of the data is ever added
where the scan is already parallel.  Callers should project to the
needed columns FIRST so the one-off shuffle moves only those bytes.

Only use this in front of per-row work that is clearly heavier than one
narrow shuffle of the projected input; results must not depend on
partitioning (integer/decimal aggregation, max/min, row-wise columns —
never raw double sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin ``df`` to defaultParallelism partitions iff its current
    plan yields fewer than ``min_fraction * defaultParallelism`` of them.
    Streaming frames pass through untouched (no RDD introspection)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(int(p * min_fraction), 2):
        return df.repartition(p)
    return df
