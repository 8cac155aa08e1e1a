"""Declarative data-quality checks (Deequ-style expectations).

The reference pipeline trusts its source blindly — a truncated Socrata
response or a schema drift lands in the lake unnoticed (the only guard
is the <=250-byte empty-body check, ``Additional_Data_Function/
get_data_api.py:14-16``).  A 100 TB pipeline needs declarative
constraint checking *in the engine*: every check below compiles to one
aggregate expression, so an arbitrary suite of checks costs exactly ONE
scan of the table (single hash-aggregate with map-side partials — no
per-check job, no driver loop).  Referential-integrity checks fold into
the same pass via a broadcast left join against the (distinct) dimension
key, so they add no extra shuffle of the fact table either.

Output contract: one row per check — ``(check_name, violations,
passed)`` — trivially oracle-able in ANSI SQL (UNION ALL of scalar
aggregates).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[str, Column]  # (check_name, violation-count aggregate)


def not_null(col: str) -> Check:
    """Violations = rows where ``col`` IS NULL."""
    return (
        f"not_null:{col}",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(*cols: str) -> Check:
    """Violations = rows beyond the first per key (0 when fully unique).

    ``count(*) - count(distinct key)``: one expression, no extra
    groupBy.  NULL keys are ignored by count_distinct — pair with
    :func:`not_null` when the key must also be present.
    """
    name = "unique:" + ",".join(cols)
    first, *rest = [F.col(c) for c in cols]
    return (name, F.count(F.lit(1)) - F.count_distinct(first, *rest))


def in_range(col: str, lo: float | None, hi: float | None) -> Check:
    """Violations = non-null values outside [lo, hi] (either bound optional)."""
    c = F.col(col)
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (c < F.lit(lo))
    if hi is not None:
        cond = cond | (c > F.lit(hi))
    return (
        f"in_range:{col}",
        F.sum(F.when(c.isNotNull() & cond, 1).otherwise(0)),
    )


def accepted_values(col: str, values: Sequence[str]) -> Check:
    """Violations = non-null values outside the accepted set."""
    c = F.col(col)
    return (
        f"accepted_values:{col}",
        F.sum(F.when(c.isNotNull() & ~c.isin(list(values)), 1).otherwise(0)),
    )


def matches_regex(col: str, pattern: str) -> Check:
    """Violations = non-null values NOT fully matching ``pattern``."""
    c = F.col(col)
    return (
        f"matches_regex:{col}",
        F.sum(F.when(c.isNotNull() & ~c.rlike(pattern), 1).otherwise(0)),
    )


def satisfies(name: str, cond: Column) -> Check:
    """Generic row-level expression check; violations = rows where
    ``cond`` is not TRUE (NULL counts as a violation — an unverifiable
    row is a failed expectation)."""
    return (
        f"satisfies:{name}",
        F.sum(F.when(cond, 0).otherwise(1)),
    )


def check_suite(
    df: DataFrame,
    checks: Sequence[Check],
    refs: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Run every check in ONE aggregate pass; return one row per check.

    ``refs`` adds referential-integrity checks: ``(fact_col, dim_df,
    dim_col)`` counts fact rows whose non-null key has no match in the
    dimension.  Each dimension is distinct-projected and broadcast, so
    the fact table is still scanned exactly once and never shuffled.

    Result columns: ``check_name string, violations bigint, passed
    boolean`` — ordered by check_name for stable comparison.
    """
    all_checks = list(checks)
    joined = df
    for i, (col, dim_df, dim_col) in enumerate(refs):
        marker = f"__dq_ref_{i}"
        dim = F.broadcast(
            dim_df.select(F.col(dim_col).alias(marker)).distinct()
        )
        joined = joined.join(
            dim, joined[col] == dim[marker], "left"
        )
        all_checks.append(
            (
                f"referential:{col}->{dim_col}",
                F.sum(
                    F.when(
                        F.col(col).isNotNull() & F.col(marker).isNull(), 1
                    ).otherwise(0)
                ),
            )
        )

    aggs = [
        expr.cast("bigint").alias(f"__c{i}")
        for i, (_, expr) in enumerate(all_checks)
    ]
    one_row = joined.agg(*aggs)
    # Unpivot the single aggregate row into (check_name, violations).
    stack_args = ", ".join(
        f"'{name}', __c{i}" for i, (name, _) in enumerate(all_checks)
    )
    return (
        one_row.selectExpr(
            f"stack({len(all_checks)}, {stack_args}) AS (check_name, violations)"
        )
        .withColumn("passed", F.col("violations") == F.lit(0))
        .orderBy("check_name")
    )
