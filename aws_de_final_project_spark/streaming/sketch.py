"""Streaming distinct-count sketch: KMV state via applyInPandasWithState.

The streaming twin of the batch KMV entries
(plans/extensions.sketch_kmv_distinct_portable /
rollup_incremental_distinct_kmv): the SAME md5-uniform hash family and
the SAME lossless merge (union + keep-k-smallest), folded per
micro-batch into per-key executor state instead of a stored rollup.
Because the merge is exactly associative, the stream's final estimate
is BIT-IDENTICAL to the batch sketch of the full history — pinned in
tests/test_streaming.py against the batch entry. ASSUMPTION of that
equivalence: the stream dedups by hash VALUE u (np.unique) while the
batch entry dedups by distinct (event_type, user_id) before hashing,
so bit-identity holds absent a 60-bit md5 collision between two
distinct user ids of one event type (batch would keep both ranks, the
stream would collapse them). P ~ (distinct ids per key)²/2⁶¹ —
astronomically small, but it is the assumption the claim rests on.

Scale shape: state is <= k doubles per key BY CONSTRUCTION — unlike a
windowed agg there is nothing for a watermark to evict, the sketch IS
the bound; hash values are computed JVM-side (md5/conv in codegen)
before the stateful grouping, so the Python side only merges k-element
float arrays per batch (numpy, Arrow-delivered).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SCALE = float(16 ** 15)

OUT_SCHEMA = (
    "event_type string, n_in_sketch int, est_users double, n_batches int"
)
STATE_SCHEMA = "us array<double>, nb int"


def kmv_distinct_stream(
    events: DataFrame,
    k: int = 64,
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Running per-key distinct-count estimates over a stream.

    Emits one row per key per micro-batch (update mode): the sketch
    fill, the current estimate ((k-1)/u_k once full, exact below),
    and the batch counter (monotonic — pick max(n_batches) for the
    final state when reading a bounded replay).
    """
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("double")
        / F.lit(_SCALE)
    )
    keyed = events.select(F.col(key_col).alias("_k"), u.alias("_u"))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        prior, nb = (state.get if state.exists else ([], 0))
        batch = [np.asarray(prior, dtype=np.float64)]
        for pdf in pdfs:
            batch.append(pdf["_u"].to_numpy(dtype=np.float64))
        # lossless KMV merge: union, dedup (same id -> same u), keep
        # the k smallest — associative, so stream fold == batch sketch
        merged = np.unique(np.concatenate(batch))[:k]
        nb = int(nb) + 1
        state.update((merged.tolist(), nb))
        n = int(merged.size)
        if n < k:
            est = float(n)
        else:
            est = math.floor((k - 1) / merged[-1] * 100.0 + 0.5) / 100.0
        yield pd.DataFrame(
            [
                {
                    "event_type": etype,
                    "n_in_sketch": n,
                    "est_users": est,
                    "n_batches": nb,
                }
            ]
        )

    return keyed.groupBy("_k").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
