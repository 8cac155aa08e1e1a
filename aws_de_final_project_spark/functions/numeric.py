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


def round_half_up(col: Column, n: int = 2) -> Column:
    scale = float(10**n)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).alias(
        f"_round{n}"
    )


def sql_round_half_up(expr: str, n: int = 2) -> str:
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
