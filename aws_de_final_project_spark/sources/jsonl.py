"""JSONL (newline-delimited JSON) source/sink — the de-facto
interchange format of training corpora (every public text dataset
ships as .jsonl / .jsonl.gz shards).

North-star extension (the reference ingests CSV/parquet only;
capability implied by the training-data-pipeline north star). Built
on Spark's native json reader/writer so the scan distributes like any
file source: one task per split, codec inferred from the extension
(.gz shards are NOT splittable — the reader docstring says so loudly
because a single 50 GB .jsonl.gz is the classic one-task trap at
100 TB; write many shards instead, which `write_jsonl` does by
construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL directory/file/glob.

    ``schema``: ALWAYS pass one in production — schema inference runs
    an extra full pass over the data (2x the scan cost at 100 TB) and
    type-widens on whatever this crawl happened to contain, so two
    ingests of different shards can disagree. With an explicit schema
    the read is one pass and the contract is stable.

    Malformed lines: a 100 TB crawl WILL contain broken lines, and
    failing the job on line 80 billion is worse than counting the
    damage. Default (``keep_corrupt=False``) reads DROPMALFORMED —
    broken/ill-typed lines silently vanish and no corrupt column ever
    exists (Spark forbids queries that reference ONLY a PERMISSIVE
    corrupt column, so the clean path must not carry one).
    ``keep_corrupt=True`` reads PERMISSIVE with ``_corrupt_record``
    materialized so the caller can route rejects to a quarantine sink
    (the dead-letter pattern, same as streaming/ingest's) — when
    inspecting it, select at least one data column alongside it (a
    quarantine WRITER naturally does) or cache first, per the same
    Spark restriction.

    gzip shards are read transparently but are NOT splittable — one
    task per .gz file, so shard size (not corpus size) bounds
    parallelism. Prefer many ~100 MB shards or zstd-in-parquet for
    the hot path.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if not keep_corrupt:
        reader = spark.read.option("mode", "DROPMALFORMED")
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        # PERMISSIVE only materializes the corrupt column if it is in
        # the read schema
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as JSONL shards.

    ``n_shards``: exact output file count (repartition — one shuffle);
    None keeps the current partitioning (no shuffle; at 100 TB the
    upstream stage already sized the partitions, don't move the data
    again just to rename files). Complex columns (arrays/structs)
    serialize as native JSON — JSONL is the one sink where that is
    the contract rather than a driver-hash hazard.
    """
    out = df.repartition(n_shards) if n_shards else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
