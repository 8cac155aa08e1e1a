"""Stream-stream joins with event-time bounds.

The reference's closest analog is re-joining re-delivered Socrata rows
against prior state, which it never implements (SURVEY.md §2.10); the
Spark-native form is a watermarked stream-stream join: both sides
buffer rows in the state store, the interval condition bounds HOW FAR
APART matching events can be, and the watermarks bound how long a
buffered row can wait for its partner — together they make join state
finite at any input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import epoch_us


def click_purchase_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap_minutes: int = 60,
    purchase_watermark: str = "30 minutes",
    click_watermark: str = "90 minutes",
) -> DataFrame:
    """Join each purchase to every click by the same user within the
    preceding ``max_gap_minutes`` (inclusive of the purchase instant).

    State-bound math: a click can only match purchases up to
    ``max_gap_minutes`` after it, so with the click watermark >=
    purchase watermark + gap, buffered clicks are dropped exactly when
    no future purchase can claim them. The same plan runs in batch
    (watermarks are no-ops there) — tests/test_streaming.py asserts
    stream == batch.

    Output: user_id, purchase_id, purchase_ts, click_id, click_ts,
    gap_us.
    """
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    from aws_de_final_project_spark.streaming.evtime import ensure_event_time

    if purchases.isStreaming:
        p = ensure_event_time(p, "purchase_ts").withWatermark(
            "purchase_ts", purchase_watermark
        )
    if clicks.isStreaming:
        c = ensure_event_time(c, "click_ts").withWatermark(
            "click_ts", click_watermark
        )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts")
            - F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return p.join(c, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (epoch_us("purchase_ts") - epoch_us("click_ts")).alias("gap_us"),
    )
