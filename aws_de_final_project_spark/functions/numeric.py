"""Cross-engine-deterministic numeric helpers.

Spark's ``round()`` on doubles rounds the *shortest decimal string*
of the double (via java BigDecimal.valueOf), while ANSI engines round
the *binary* value — e.g. the double nearest 4201.315 rounds to
4201.32 in Spark but 4201.31 in DuckDB. Any oracle comparison of
rounded doubles will flake on such half-boundary values.

``round_half_up`` instead computes ``floor(x * 10^n + 0.5) / 10^n``:
every step (multiply by an exactly-representable power of ten, add
0.5, floor, divide) is a single IEEE-754 operation, so Spark and any
oracle engine running the same formula produce bitwise-identical
results. The SQL twin is :func:`sql_round_half_up`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 on the column's own wall
    clock, for both TIMESTAMP and TIMESTAMP_NTZ inputs.

    ``unix_micros`` rejects TIMESTAMP_NTZ outright (the test fixtures'
    parquet ``ts`` columns are NTZ), and casting NTZ->TIMESTAMP first
    would re-anchor the wall clock in the *session* timezone — a
    silent, tz-dependent shift wherever the session zone isn't UTC.
    ``timestamp_diff`` over two NTZ values never consults the session
    zone, so this matches DuckDB's ``epoch_us()`` bit-for-bit on NTZ
    data regardless of who built the SparkSession.

    LTZ caveat: a TIMESTAMP (with local tz) input is rendered to NTZ
    through the *session* zone, so a DIFFERENCE of two LTZ values
    (e.g. ``gap_us`` in streaming/joins.py) is offset-invariant only
    while the zone's offset is constant between the two instants — a
    non-UTC session straddling a DST transition shifts one side by
    the DST delta. All in-repo callers read the NTZ parquet fixtures
    (no session-zone dependence); callers feeding LTZ columns should
    difference ``F.unix_micros`` (true instant micros) instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def round_half_up(col: Column, n: int = 2) -> Column:
    scale = float(10**n)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).alias(
        f"_round{n}"
    )


def sql_round_half_up(expr: str, n: int = 2) -> str:
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def weighted_quantile_frame(
    df,
    group_col: str,
    value_col: str,
    weight_col: str,
    q: float,
    alias: str = "wq",
):
    """Exact weighted quantile per group: the smallest value whose
    cumulative weight reaches ``q`` of the group's total — e.g. the
    revenue-weighted median price, where a 1000-unit order should
    pull the median 1000x harder than a 1-unit one.

    Relational shape: one ordered window per group accumulates
    weights (state = the group's rows, streamed), one per-group total
    broadcast back, then a min-aggregate over the qualifying rows.
    Integer/decimal weights stay exact; the threshold comparison
    q * total uses one deterministic multiply, so the pick replays
    identically in any engine. Ties on value are merged by the
    cumulative sum itself (equal values reach the threshold together).

    Returns (group_col, alias) — one row per group with >= 1 row.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = df.select(
        F.col(group_col),
        F.col(value_col),
        F.col(weight_col).cast("double").alias("_w"),
    ).withColumn("_cw", F.sum("_w").over(w))
    tot = cum.groupBy(group_col).agg(F.sum("_w").alias("_tw"))
    return (
        cum.join(F.broadcast(tot), group_col)
        .filter(F.col("_cw") >= F.lit(float(q)) * F.col("_tw"))
        .groupBy(group_col)
        .agg(F.min(value_col).alias(alias))
    )


def ema_from_window_list(values, alpha: float):
    """Finite-window exponential moving average of an ORDERED value
    list (oldest first, as a window-frame ``collect_list`` yields):
    weights ``(1-alpha)^age`` normalized over the visible window, so
    the first rows of a series are proper averages instead of being
    biased toward an arbitrary seed. Pure higher-order ``aggregate``
    — one pass over the (bounded) frame list, no UDF.

    Engine-portable: the same fold is expressible as a DuckDB list
    comprehension over the identical window list; both sides sum the
    same ~20 doubles in the same order.
    """
    decay = 1.0 - alpha
    rev = F.reverse(values)
    acc = F.aggregate(
        rev,
        F.struct(
            F.lit(0.0).alias("s"),
            F.lit(0.0).alias("w"),
            F.lit(0.0).alias("j"),
        ),
        lambda a, x: F.struct(
            (a["s"] + x * F.pow(F.lit(decay), a["j"])).alias("s"),
            (a["w"] + F.pow(F.lit(decay), a["j"])).alias("w"),
            (a["j"] + F.lit(1.0)).alias("j"),
        ),
        lambda a: a["s"] / a["w"],
    )
    return acc
