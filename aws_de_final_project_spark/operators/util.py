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
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
