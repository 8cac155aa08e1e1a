"""Event-time column normalization for streaming plans.

Structured Streaming's watermark machinery requires TIMESTAMP (LTZ):
``withWatermark`` on a TIMESTAMP_NTZ column raises
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. The parquet fixtures carry ``ts``
as NTZ (round-4 regeneration), so every streaming entry point
normalizes its event-time column first. The NTZ->LTZ cast re-anchors
the wall clock in the session timezone — pinned UTC by
``session.tune_session`` — and watermark semantics only compare event
times to each other, so the fixed offset cancels even if a foreign
session overrides the zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Cast ``ts_col`` to TIMESTAMP (LTZ) iff it is TIMESTAMP_NTZ —
    a no-op projection otherwise."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
