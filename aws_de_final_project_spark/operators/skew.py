"""Skew mitigation: salted joins for hot keys.

First line of defense is AQE (``spark.sql.adaptive.skewJoin`` is on in
session.py): it splits oversized shuffle partitions of a sort-merge
join at runtime. Salting is the explicit fallback for the cases AQE
can't fix — a hot key whose rows must meet a non-broadcastable build
side, or aggregation states too hot for one reducer.

``salted_join``: probe rows get a deterministic salt in [0, n); build
rows are replicated n times (one per salt); the join key becomes
(key, salt), spreading one hot key over n reducers at the cost of
n x build-side duplication — which is why you salt only when the
build side is small-ish yet above the broadcast threshold.

The salt is ``pmod(xxhash64(probe row id), n)`` — deterministic, so
results are stable and testable; a random salt would also be correct
(any uniform assignment works) but breaks retry determinism: a
re-executed task must re-produce the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    n_salts: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` with ``build`` on ``key_col`` with the key
    salted ``n_salts`` ways.

    ``salt_on``: probe column whose hash assigns the salt (defaults to
    the key itself combined with a per-row monotonic id is NOT used —
    callers pass a unique-ish column like an event id for uniform
    spread; falling back to the key alone would put the whole hot key
    in one salt and defeat the purpose).
    """
    if salt_on is None:
        raise ValueError(
            "salt_on is required: pass a probe column with per-row "
            "variation (e.g. a row id) so a hot key spreads uniformly"
        )
    p = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int")
    )
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(b, [key_col, "_salt"], how)
    return out.drop("_salt")
