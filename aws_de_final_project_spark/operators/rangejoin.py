"""Range (interval) join — point-in-interval matching without the
nested-loop trap.

Spark plans ``l JOIN r ON l.k = r.k AND l.ts BETWEEN r.lo AND r.hi``
as an equi-join on ``k`` with the range as a post-filter — fine until
a key is hot, at which point every (point, interval) pair under that
key materializes. The bin-bucketed form bounds the work:

  1. choose a bin width; every point maps to exactly ONE bin;
  2. every interval explodes to the bins it covers (span/width rows);
  3. equi-join on (key, bin) — each point meets only intervals
     overlapping its bin — then apply the exact range predicate.

A point falls in exactly one bin, so matches are never duplicated and
no distinct pass is needed. Right-side replication is
ceil(span/width), which the caller tunes: wide bins = less
replication + more post-filtering, narrow bins = the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import epoch_us


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bin_minutes: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row of the same key with
    ``interval_start <= point_ts < interval_end``.

    ``how`` may be ``inner`` or ``left`` (point-preserving). The range
    predicate lives in the JOIN CONDITION, not a post-filter — a
    post-filter would silently turn ``left`` into ``inner`` by
    dropping the NULL-padded unmatched points (ADVICE r1). ``left``
    stays duplicate-free because each point maps to exactly one bin.
    ``right``/``full`` are rejected: an unmatched interval spans many
    bins and would surface once per bin.

    Output columns: all point columns + all interval columns (minus
    the duplicated key).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} unsupported: only 'inner' and 'left' are "
            "duplicate-free under bin bucketing (intervals explode "
            "to one row per covered bin)"
        )
    bin_us = bin_minutes * 60 * 1_000_000
    p = points.withColumn(
        "_bin", (epoch_us(point_ts) / bin_us).cast("long")
    ).alias("_p")
    i_lo = (epoch_us(interval_start) / bin_us).cast("long")
    # end is exclusive: an interval ending exactly on a bin boundary
    # does not cover that bin
    i_hi = ((epoch_us(interval_end) - 1) / bin_us).cast("long")
    iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(i_lo, F.greatest(i_hi, i_lo)))
    ).alias("_i")
    cond = (
        (F.col(f"_p.{key_col}") == F.col(f"_i.{key_col}"))
        & (F.col("_p._bin") == F.col("_i._bin"))
        & (F.col(f"_p.{point_ts}") >= F.col(f"_i.{interval_start}"))
        & (F.col(f"_p.{point_ts}") < F.col(f"_i.{interval_end}"))
    )
    joined = p.join(iv, cond, how)
    return joined.select(
        *[F.col(f"_p.{c}") for c in points.columns],
        *[
            F.col(f"_i.{c}")
            for c in intervals.columns
            if c != key_col
        ],
    )


def overlap_pairs(
    intervals: DataFrame,
    keys: list[str],
    lo_col: str,
    hi_col: str,
    id_col: str,
    bin_days: int = 30,
) -> DataFrame:
    """Unordered pairs of same-key DATE intervals that overlap
    (inclusive endpoints: ``a.lo <= b.hi AND b.lo <= a.hi``), via a
    bin-bucketed equi-join — the interval×interval sibling of
    :func:`range_join`, and the same trap: Spark plans the naive
    overlap predicate as a key equi-join with the range post-filtered,
    quadratic under a hot key.

    Both sides explode to the ~span/width bins they cover and
    equi-join on (keys, bin). A pair overlapping in dates shares every
    bin in the intersection of its bin ranges, so to count it once we
    keep only the FIRST shared bin — ``bin == greatest(lo_bin_a,
    lo_bin_b)``, which lies in the intersection whenever the intervals
    overlap. No distinct pass, no window.

    Output: id_a, id_b, the key columns, overlap_days (inclusive).
    """

    def day(c: str):
        return F.datediff(F.col(c), F.lit("1970-01-01"))

    lob = F.floor(day(lo_col) / F.lit(bin_days)).cast("long")
    hib = F.floor(day(hi_col) / F.lit(bin_days)).cast("long")
    e = intervals.select(
        F.col(id_col).alias("_id"),
        *keys,
        F.col(lo_col).alias("_lo"),
        F.col(hi_col).alias("_hi"),
        lob.alias("_lob"),
        F.explode(F.sequence(lob, F.greatest(hib, lob))).alias("_bin"),
    )
    a = e.select(
        F.col("_id").alias("id_a"),
        *keys,
        F.col("_lo").alias("_loa"),
        F.col("_hi").alias("_hia"),
        F.col("_lob").alias("_loba"),
        "_bin",
    )
    b = e.select(
        F.col("_id").alias("id_b"),
        *keys,
        F.col("_lo").alias("_lob_dt"),
        F.col("_hi").alias("_hib_dt"),
        F.col("_lob").alias("_lobb"),
        "_bin",
    )
    return (
        a.join(b, [*keys, "_bin"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_loa") <= F.col("_hib_dt"))
            & (F.col("_lob_dt") <= F.col("_hia"))
            & (F.col("_bin") == F.greatest("_loba", "_lobb"))
        )
        .select(
            "id_a",
            "id_b",
            *keys,
            (
                F.datediff(
                    F.least("_hia", "_hib_dt"),
                    F.greatest("_loa", "_lob_dt"),
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )
