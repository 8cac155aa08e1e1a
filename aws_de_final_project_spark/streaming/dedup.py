"""Streaming deduplication with bounded state.

The reference's incremental ingest RE-DELIVERS rows: the Socrata
``updated_on > hwm`` filter re-fetches any record updated since the
last run (``Additional_Data_Function/get_data_api.py:10-13``), and
nothing downstream collapses the duplicates. In a streaming engine the
fix is key-based dedup — but naive ``dropDuplicates`` keeps every key
EVER SEEN in state, which on an unbounded 100 TB stream is a slow
OOM. ``dropDuplicatesWithinWatermark`` bounds state to the watermark
horizon: a key's fingerprint is evicted once the watermark passes its
event time + delay, so state is O(keys per horizon).

The contract that buys: duplicates arriving within ``watermark`` of
the original are suppressed; a duplicate arriving AFTER eviction is
re-emitted (pinned in tests/test_streaming.py) — the downstream sink
must be idempotent on the key (e.g. streaming/upsert.py's MERGE) for
end-to-end exactly-once. That layering (bounded-state dedup for the
common fast path + idempotent sink for the tail) is the standard
design; unbounded dedup state is not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-seen-wins dedup by ``keys`` with state bounded by the
    watermark horizon. Works on batch frames too (plain
    ``dropDuplicates`` — the batch twin for result comparison)."""
    if events.isStreaming:
        from aws_de_final_project_spark.streaming.evtime import ensure_event_time

        return (
            ensure_event_time(events, ts_col)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(keys))
        )
    return events.dropDuplicates(list(keys))
