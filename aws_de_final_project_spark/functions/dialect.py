"""Presto/Athena -> Spark SQL dialect shims.

The reference's analytics layer is Presto SQL (Athena named queries,
``CDK/cdk/athena_queries/*.txt``). Three functions there have silent
semantic gaps when re-expressed in Spark (SURVEY.md §2.3 F4-F6):

* ``date_parse(str, '%m/%d/%Y %T %p')``  — MySQL-style tokens
  (``fixed_dates_violent.txt:7``). Spark wants Java patterns.
* ``date_format(ts, '%W')`` — full weekday *name*
  (``fixed_dates_violent.txt:3``). Spark pattern is ``EEEE``.
* ``DAY_OF_WEEK(ts)`` — ISO numbering Mon=1..Sun=7
  (``fixed_dates_violent.txt:4``). Spark's ``dayofweek`` is
  Sun=1..Sat=7 — a verbatim port is off by one; ``weekday()+1`` is
  the correct mapping.

These shims translate token-by-token so the four reference views can
be replayed verbatim-ish and still agree with an ANSI oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# MySQL/Presto datetime tokens -> Spark (java.time) pattern letters.
# Only tokens that appear in (or near) the reference are mapped; the
# translator fails loudly on anything unknown rather than guessing.
_PRESTO_TO_SPARK_TOKENS = {
    "%Y": "yyyy",  # 4-digit year
    "%y": "yy",
    "%m": "MM",  # month 01-12
    "%c": "M",
    "%d": "dd",  # day 01-31
    "%e": "d",
    "%H": "HH",  # hour 00-23
    "%k": "H",
    "%h": "hh",  # hour 01-12
    "%I": "hh",
    "%i": "mm",  # minutes
    "%s": "ss",  # seconds
    "%S": "ss",
    "%T": "HH:mm:ss",  # time, 24-hour
    "%r": "hh:mm:ss a",  # time, 12-hour with AM/PM
    "%p": "a",  # AM/PM
    "%W": "EEEE",  # full weekday name ("Monday")
    "%a": "EEE",  # abbreviated weekday name
    "%M": "MMMM",  # full month name
    "%b": "MMM",
    "%j": "DDD",  # day of year
    "%f": "SSSSSS",  # fractional seconds (microseconds)
    "%%": "%",
}

_TOKEN_RE = re.compile("%.")


def translate_presto_datetime_pattern(pattern: str) -> str:
    """``'%m/%d/%Y %T %p'`` -> ``'MM/dd/yyyy HH:mm:ss a'``.

    Literal (non-token) characters pass through unchanged; unknown
    tokens raise so a silent wrong-answer can't slip in.

    Note the reference's own pattern is internally odd: ``%T`` is the
    24-hour clock but it is combined with ``%p`` (AM/PM). Presto
    parses that combination by honoring the AM/PM marker; the faithful
    Spark pattern for the *data* (12-hour strings like
    ``03/18/2015 07:44:00 PM``) is ``hh`` not ``HH``, so ``%T %p`` as
    a unit maps to ``hh:mm:ss a``.
    """
    out = []
    pos = 0
    # Special-case the %T-followed-by-%p combination (see docstring):
    # rewrite to equivalent *Presto* tokens (12-hour clock) and let the
    # normal token translation below handle them.
    src = pattern.replace("%T %p", "%h:%i:%s %p")
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m:
            tok = m.group(0)
            if tok not in _PRESTO_TO_SPARK_TOKENS:
                raise ValueError(f"untranslated Presto datetime token: {tok!r}")
            out.append(_PRESTO_TO_SPARK_TOKENS[tok])
            pos += 2
        else:
            ch = src[pos]
            # Alphabetic literals must be single-quoted in Java patterns.
            if ch.isalpha() and ch not in ":/- .,":
                out.append(f"'{ch}'")
            else:
                out.append(ch)
            pos += 1
    return "".join(out)


def presto_date_parse(col: Column | str, presto_pattern: str) -> Column:
    """Presto ``date_parse(string, pattern)`` -> TimestampType column.

    Mirrors ``athena_queries/fixed_dates_violent.txt:7``.
    """
    spark_pattern = translate_presto_datetime_pattern(presto_pattern)
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, spark_pattern)


def presto_date_format(col: Column | str, presto_pattern: str) -> Column:
    """Presto/MySQL ``date_format(ts, pattern)`` -> StringType column.

    Mirrors ``athena_queries/fixed_dates_violent.txt:3`` (``'%W'`` ->
    full weekday name).
    """
    spark_pattern = translate_presto_datetime_pattern(presto_pattern)
    return F.date_format(F.col(col) if isinstance(col, str) else col, spark_pattern)


def iso_day_of_week(col: Column | str) -> Column:
    """Presto ``DAY_OF_WEEK(ts)``: ISO numbering, Monday=1..Sunday=7.

    Spark's ``dayofweek`` is Sunday=1..Saturday=7 (the off-by-one trap
    flagged in SURVEY.md §2.3 F6); ``weekday`` is Monday=0, so +1.
    Mirrors ``athena_queries/fixed_dates_violent.txt:4``.
    """
    return (F.weekday(F.col(col) if isinstance(col, str) else col) + 1).cast("int")
