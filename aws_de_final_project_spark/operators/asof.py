"""As-of (backward) join — the canonical "operator Spark lacks"
(SURVEY.md §2.5 lists no temporal joins in the reference; every
time-series store has one). Composed entirely from built-in DataFrame
ops: union + ordered window carry-forward — the distributed
merge-as-of.

Why not a range-join? ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` then
max-per-left explodes quadratically inside hot keys. The union trick
is one shuffle on the key, one per-key sort, zero row blowup:

  1. union left (probe) and right (reference) rows, tagged;
  2. per key, order by (ts, side) — reference rows sort before probe
     rows at equal ts, giving at-or-before (inclusive) semantics;
  3. carry the latest reference payload forward with
     ``last(payload, ignorenulls=True)``;
  4. keep probe rows; unmatched probes carry NULL (left-join shape).

At 100 TB both inputs shuffle once on the join key and sort locally —
the same cost envelope as a sort-merge join, with bounded (1-row)
lookback state per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same key (inclusive backward
    as-of; left rows with no prior right row get NULLs).

    ``right`` must be unique per (key, ts) for deterministic results —
    pre-aggregate it if it isn't (see callers).
    """
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_ats"),
        pay.alias("_pay"),
        F.lit(0).alias("_side"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.lit(1).alias("_side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_pay", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *l_cols,
        *[
            F.col("_match")[c].alias(f"{payload_prefix}{c}")
            for c in payload_cols
        ],
    )
    return out
