"""Small-file compaction and JSONL ingestion.

Two lake-maintenance capabilities the reference delegates to Glue's
managed layer but every self-hosted 100 TB lake needs:

- **Compaction**: streaming/incremental ingest (the reference appends
  one CSV per day — ``Glue Script/process_crime_data.py`` writes per-run
  parquet) accretes thousands of small files; scan cost then becomes
  file-open latency, not bytes. ``compact_parquet`` rewrites a
  directory to ~target-size files with a size-derived partition count —
  no driver-side data movement, one distributed read + write.

- **JSONL**: the lingua franca of document corpora. ``read_jsonl``
  reads with an EXPLICIT schema (never runtime inference — a schema
  inferred from 100 TB of JSON costs a full extra scan and drifts run
  to run) in PERMISSIVE mode, capturing malformed lines in a
  ``_corrupt_record`` column instead of failing the job or silently
  dropping them: corpus ingest must quantify its losses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def list_parquet_files(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every data file under ``path`` (driver-side
    listing — metadata only, same listing the scan planner does)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet directory at ``src`` into ``dst`` with
    ~``target_file_bytes`` files. Returns the partition count used.

    The file count comes from the TOTAL INPUT SIZE, not a fixed
    number: ceil(bytes / target). ``repartition(n)`` (round-robin)
    balances rows regardless of input skew; with ``partition_cols``
    the rewrite preserves hive partitioning and repartitions BY the
    partition columns too, so each output partition directory is
    written by few tasks (avoiding the files x tasks explosion).

    At 100 TB this is the nightly maintenance job: pure
    read-shuffle-write, no driver data path, and the shuffle is the
    point (it's what coalesces the files).
    """
    files = list_parquet_files(src)
    total = sum(b for _, b in files)
    n = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src)
    if partition_cols:
        writer = (
            df.repartition(n, *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(n).write.mode("overwrite")
    writer.parquet(dst)
    return n


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read JSON-lines with explicit schema; malformed lines survive
    as ``corrupt_col`` with every data column NULL.

    PERMISSIVE (not DROPMALFORMED) on purpose: a dropped record is an
    unquantified loss. Callers split good/bad with
    :func:`split_corrupt` and decide — quarantine the bad rows, alert
    on a ratio, or fail the batch.

    Implementation reads lines as TEXT and parses with ``from_json``
    rather than the JSON file source: the file source forbids queries
    that touch only the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    exactly what a quarantine branch does. Same single scan, same
    vectorized parse, no restriction.
    """
    full = schema.add(T.StructField(corrupt_col, T.StringType(), True))
    return (
        spark.read.text(path)
        .select(
            F.from_json(
                F.col("value"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
            ).alias("_r")
        )
        .select("_r.*")
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): bad = rows Spark could not parse (corrupt column
    holds the raw line); good drops the corrupt column. Both are
    filters over the same scan — Catalyst shares it when both sides
    are consumed in one action tree."""
    bad = df.filter(F.col(corrupt_col).isNotNull())
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    return good, bad
