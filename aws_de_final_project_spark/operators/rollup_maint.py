"""Incremental aggregate (materialized-rollup) maintenance.

The reference recomputes its Athena views from the full table on every
query (views are virtual — ``CDK/cdk/cdk_stack.py:307-326``). At 100 TB
a daily-refreshed rollup must be maintained INCREMENTALLY: apply each
arriving delta to the stored aggregate instead of rescanning history.

This works for the self-mergeable aggregate algebra — sum, count, min,
max (and anything derived from them, e.g. avg = sum/count computed at
READ time, never stored): merge(state, partial(delta)) == full
recompute. The merge is one union + re-aggregate over |state| + |delta
groups| rows — independent of history size. Exactness is pinned in
tests/test_rollup_maint.py against a from-scratch recompute after
several deltas.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measure spec: (output_col, source_col, kind) where kind in
# {"sum", "count", "min", "max", "sumsq", "hll"}. count counts
# non-null source rows. sumsq stores sum(x^2), the extra moment that
# makes variance/stddev derivable at READ time (var = sumsq/n -
# (sum/n)^2) while staying sum-mergeable. hll stores a DataSketches
# HLL binary sketch — the mergeable form of COUNT(DISTINCT), whose
# union-merge is exactly associative (sketch(A) ∪ sketch(B) ==
# sketch(A ∪ B), pinned in tests), estimate via hll_sketch_estimate
# at read.
Measure = tuple[str, str, str]

_MERGE = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
    "sumsq": F.sum,
    "hll": F.hll_union_agg,
}
_PARTIAL = {"sum": F.sum, "min": F.min, "max": F.max}


def partial_aggs(
    delta: DataFrame, keys: Sequence[str], measures: Sequence[Measure]
) -> DataFrame:
    """Per-key partial aggregate of one delta batch. count becomes a
    sum-mergeable long; everything else keeps its own algebra."""
    aggs = []
    for out, src, kind in measures:
        if kind == "count":
            aggs.append(
                F.count(F.col(src)).cast("long").alias(out)
            )
        elif kind == "sumsq":
            aggs.append(F.sum(F.col(src) * F.col(src)).alias(out))
        elif kind == "hll":
            aggs.append(F.hll_sketch_agg(F.col(src)).alias(out))
        else:
            aggs.append(_PARTIAL[kind](F.col(src)).alias(out))
    return delta.groupBy(*keys).agg(*aggs)


def merge_aggs(
    state: DataFrame, delta_partial: DataFrame,
    keys: Sequence[str], measures: Sequence[Measure],
) -> DataFrame:
    """Merge a partial aggregate into the stored state: union the two
    per-key frames and fold with each measure's merge function (sum
    and count re-sum; min/max re-min/max). Cost is proportional to
    state + delta group counts, not history."""
    merged_aggs = [
        _MERGE[kind](F.col(out)).alias(out) for out, _src, kind in measures
    ]
    return (
        state.unionByName(delta_partial)
        .groupBy(*keys)
        .agg(*merged_aggs)
    )


def maintain_rollup(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    keys: Sequence[str],
    measures: Sequence[Measure],
) -> DataFrame:
    """Apply one delta batch to the parquet rollup at ``path``
    (create if absent); returns the new state.

    Write is staged to ``path + '.staging'`` then swapped, because the
    new state is computed FROM the current files — Spark cannot
    overwrite a path it is reading in the same job. The swap keeps a
    reader-consistent snapshot at all times (rename is atomic per
    directory on a POSIX store; object stores want a manifest commit,
    same structure)."""
    part = partial_aggs(delta, keys, measures)
    if os.path.exists(path):
        new_state = merge_aggs(spark.read.parquet(path), part, keys, measures)
    else:
        new_state = part
    staging = path + ".staging"
    new_state.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.rename(staging, path)
    return spark.read.parquet(path)
