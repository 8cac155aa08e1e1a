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
        "_bin", (F.unix_micros(F.col(point_ts)) / bin_us).cast("long")
    ).alias("_p")
    i_lo = (F.unix_micros(F.col(interval_start)) / bin_us).cast("long")
    # end is exclusive: an interval ending exactly on a bin boundary
    # does not cover that bin
    i_hi = (
        (F.unix_micros(F.col(interval_end)) - 1) / bin_us
    ).cast("long")
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
