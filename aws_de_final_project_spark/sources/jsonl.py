"""JSONL (newline-delimited JSON) source/sink — the de-facto
interchange format of training corpora (every public text dataset
ships as .jsonl / .jsonl.gz shards).

North-star extension (the reference ingests CSV/parquet only;
capability implied by the training-data-pipeline north star). The
READ path is `sources/compaction.read_jsonl` — text scan +
``from_json`` rather than the JSON file source, because the file
source forbids queries touching only the corrupt column
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
exactly what a quarantine branch does; this module adds the
convenience split and the WRITE path. One task per split; codec
inferred from the extension (.gz shards are NOT splittable — a single
50 GB .jsonl.gz is the classic one-task trap at 100 TB; write many
shards instead, which `write_jsonl` does by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from aws_de_final_project_spark.sources.compaction import (
    read_jsonl as _read_parsed,
)
from aws_de_final_project_spark.sources.compaction import split_corrupt

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL directory/file/glob with an EXPLICIT schema
    (inference would be a second full pass and a contract that drifts
    with whatever this crawl happened to contain).

    Malformed lines — a 100 TB crawl WILL contain them, and failing
    the job on line 80 billion is worse than counting the damage:
    with ``keep_corrupt=False`` (default) broken/ill-typed lines are
    dropped and the clean frame returned; with ``keep_corrupt=True``
    the raw line survives in ``_corrupt_record`` so the caller routes
    rejects to a quarantine sink (the dead-letter pattern — use
    :func:`sources.compaction.split_corrupt` for the two-way split
    over one shared scan).

    gzip shards are read transparently but are NOT splittable — one
    task per .gz file, so shard size (not corpus size) bounds
    parallelism. Prefer many ~100 MB shards or zstd-in-parquet for
    the hot path.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    df = _read_parsed(spark, path, schema, corrupt_col=CORRUPT_COL)
    if keep_corrupt:
        return df
    good, _bad = split_corrupt(df, corrupt_col=CORRUPT_COL)
    return good


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
