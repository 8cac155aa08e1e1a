"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in ``session_window`` (streaming/windows.py) covers plain
sessionization; this module demonstrates the escape hatch for
semantics the built-ins can't express — here, sessions that carry
custom accumulators and report *why* they closed (gap vs watermark
timeout), the shape any bespoke per-key state machine (CDC merge,
anomaly tracker, dedup-with-TTL) takes in Spark.

Mechanics that matter at scale:

* state is per-key and lives in the executor state store (RocksDB at
  production scale) — the driver never sees it;
* events arrive as Arrow record batches per key; per-invocation work
  is vectorized pandas;
* event-time timeout + watermark bound state size: a key with no
  traffic past the gap horizon is closed and evicted, so state does
  not grow with corpus history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double, closed_by string"
)
# open-session accumulator: epoch-us bounds + running aggregates
STATE_SCHEMA = "start bigint, last bigint, n bigint, total double"

_US = 1_000_000


def _emit(
    user_id: int, start_us: int, last_us: int, n: int, total: float,
    gap_us: int, closed_by: str,
) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us + gap_us, unit="us"),
        "n_events": n,
        "sum_value": total,
        "closed_by": closed_by,
    }


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-key gap sessionization with custom state: emits one row per
    CLOSED session (``closed_by`` = 'gap' when a later event opened a
    new session, 'timeout' when the event-time watermark passed the
    open session's horizon). The per-user open session stays in state.

    Requires an event-time watermark (set here) — that is what drives
    both timeouts and state eviction.
    """
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[dict[str, Any]] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            out.append(_emit(user_id, start, last, n, total, gap_us, "timeout"))
            state.remove()
        else:
            ts_list: list[int] = []
            val_list: list[float] = []
            for pdf in pdfs:
                ts_list.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col])
                )
                val_list.extend(float(v) for v in pdf[value_col])
            order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
            if state.exists:
                start, last, n, total = state.get
            else:
                start, last, n, total = None, 0, 0, 0.0
            for i in order:
                t, v = ts_list[i], val_list[i]
                if start is None:
                    start, last, n, total = t, t, 1, v
                elif t - last >= gap_us:
                    out.append(
                        _emit(user_id, start, last, n, total, gap_us, "gap")
                    )
                    start, last, n, total = t, t, 1, v
                else:
                    last = max(last, t)
                    n += 1
                    total += v
            if start is not None:
                state.update((start, last, n, total))
                # close the open session once event time passes
                # last+gap — clamped strictly past the current
                # watermark: a batch whose rows are already behind the
                # watermark (late-but-admitted data) would otherwise
                # request a timeout in the past, which Spark rejects
                # (INVALID_TIMEOUT_TIMESTAMP) and kills the query; the
                # clamp closes such sessions at the next micro-batch
                state.setTimeoutTimestamp(
                    max(
                        (last + gap_us) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "sum_value", "closed_by",
            ],
        )

    from aws_de_final_project_spark.streaming.evtime import ensure_event_time

    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
