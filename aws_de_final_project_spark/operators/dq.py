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


def psi_drift(
    df: DataFrame,
    value_col: str,
    is_current: Column,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int = 16,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per group between a reference slice
    and a current slice of the same frame: the standard
    distribution-drift monitor a production pipeline runs per feature
    per refresh (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref), with
    each proportion floored at ``eps`` so empty bins contribute a
    large-but-finite term (the usual convention). Both slices are
    binned in ONE pass — conditional sums inside a single hash
    aggregate on (group, bin), nothing scans the table twice — then
    one tiny aggregate per group. Every step is deterministic given
    the counts, so the whole monitor replays in any engine.

    Output: (group_col, n_ref, n_cur, psi 4dp), one row per group
    that has rows on BOTH sides.
    """
    from aws_de_final_project_spark.functions.numeric import (
        round_half_up as rnd,
    )

    if n_bins <= 0 or not hi > lo:
        raise ValueError("need hi > lo and n_bins > 0")
    w = (hi - lo) / n_bins
    idx = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    cells = (
        df.select(
            F.col(group_col),
            idx.alias("_bin"),
            is_current.cast("int").alias("_cur"),
        )
        .groupBy(group_col, "_bin")
        .agg(
            F.sum(1 - F.col("_cur")).alias("_rc"),
            F.sum("_cur").alias("_cc"),
        )
    )
    tot = cells.groupBy(group_col).agg(
        F.sum("_rc").alias("_rn"), F.sum("_cc").alias("_cn")
    )
    p_ref = F.greatest(
        F.col("_rc").cast("double") / F.col("_rn").cast("double"),
        F.lit(float(eps)),
    )
    p_cur = F.greatest(
        F.col("_cc").cast("double") / F.col("_cn").cast("double"),
        F.lit(float(eps)),
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        cells.join(F.broadcast(tot), group_col)
        .filter((F.col("_rn") > 0) & (F.col("_cn") > 0))
        .groupBy(group_col)
        .agg(
            F.max("_rn").alias("n_ref"),
            F.max("_cn").alias("n_cur"),
            rnd(F.sum(term), 4).alias("psi"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str = "winsorized",
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into its group's
    [p_lo, p_hi] exact-percentile envelope — the standard outlier
    treatment before training statistical/ML features, as a
    scan-stage transform.

    One exact-percentile aggregate per group (tiny — |groups| rows)
    broadcast back, then a codegen clamp; no window, no second scan.
    Returns the input columns plus ``out_col`` and the group bounds.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo < p_hi <= 1")
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(float(p_lo))).alias("_lo"),
        F.percentile(value_col, F.lit(float(p_hi))).alias("_hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(
            out_col,
            F.least(
                F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")
            ),
        )
        .withColumnRenamed("_lo", "lo_bound")
        .withColumnRenamed("_hi", "hi_bound")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
    consistency: float = 1.4826,
) -> DataFrame:
    """Robust outlier flags per group: |x - median| > k * MAD, with
    MAD = median(|x - median|) scaled by the normal-consistency
    constant 1.4826 — the standard robust alternative to z-scores
    (mean/stddev move with the very outliers they're meant to catch;
    median/MAD have a 50% breakdown point).

    Two exact-percentile aggregates (group medians, then MAD over the
    residuals — the second one needs the first, so two passes is the
    honest minimum), each broadcast back; the flag itself is a
    scan-stage comparison. Output: input keys + value, group median,
    mad, is_outlier. Zero-MAD groups (>= half the values identical)
    flag only exact deviants from the median.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("_med")), F.lit(0.5)
            ).alias("_rawmad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .select(
            *df.columns,
            F.col("_med").alias("group_median"),
            (F.col("_rawmad") * F.lit(float(consistency))).alias("mad"),
            (
                F.abs(F.col(value_col) - F.col("_med"))
                > F.lit(float(k))
                * F.col("_rawmad")
                * F.lit(float(consistency))
            ).alias("is_outlier"),
        )
    )


def k_anonymity(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    equivalence class (distinct quasi-identifier tuple) smaller than
    ``k`` is a re-identification risk — its members are distinguishable
    from fewer than k-1 others (Sweeney, IJUFKS'02; the governance
    check a training-data pipeline runs before releasing joins of
    user-adjacent tables).

    Returns the VIOLATING classes only: the quasi columns plus
    ``class_size``, smallest first. One hash aggregate on the quasi
    tuple — group count equals distinct-combination cardinality, the
    same shuffle a GROUP BY report on those columns costs anyway.
    NULL quasi values form their own class (SQL GROUP BY semantics —
    NULL zip codes cluster together and are just as linkable).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    qs = list(quasi_cols)
    return (
        df.groupBy(*qs)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
    )


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Column-profile report in ONE scan: for every column its row
    count, null count, exact distinct count, and a type-normalized
    numeric min/max — the first thing a pipeline runs against an
    unfamiliar 100 TB table, so the shape matters: all metrics fold
    into a single grouping-free aggregate (the distinct counts add
    one Expand, multiplying scan rows by the column count map-side —
    still one pass, no per-column jobs, no driver loop).

    Min/max are normalized per type so the report schema is uniform
    AND engine-portable (no double->string formatting dependence):
    numeric columns report their value, strings their LENGTH, and
    date/timestamp columns their epoch microseconds — all as DOUBLE
    (exact for integers < 2^53).

    Output: (column_name, n_rows, n_null, n_distinct, vmin, vmax),
    one row per profiled column.
    """
    from aws_de_final_project_spark.functions.numeric import epoch_us

    names = list(cols) if cols is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs, structs = [], []
    for c in names:
        t = dtypes[c]
        if t in ("string",):
            basis = F.length(F.col(c)).cast("double")
        elif t.startswith("timestamp") or t == "date":
            basis = epoch_us(F.col(c)).cast("double")
        else:
            basis = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}"),
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(basis).alias(f"_mn_{c}"),
            F.max(basis).alias(f"_mx_{c}"),
        ]
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"_n_{c}").alias("n_rows"),
                F.col(f"_nn_{c}").cast("long").alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("vmin"),
                F.col(f"_mx_{c}").alias("vmax"),
            )
        )
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*structs)).alias("_p"))
        .select("_p.*")
    )
