"""Incremental file ingest — the Spark-native replacement for Glue
job bookmarks.

The reference gets exactly-once-per-file semantics from
``--job-bookmark-option: job-bookmark-enable``
(``CDK/cdk/cdk_stack.py:165``): each run processes only files not
seen before. Structured Streaming's file source + checkpoint gives
the same contract declaratively, and ``Trigger.AvailableNow`` turns
it into a batch-incremental run (process everything new, then stop)
— the exact execution shape of a scheduled Glue job run.

At 100 TB: the file-source maintains seen-file state in the
checkpoint (RocksDB-backed at scale); ``maxFilesPerTrigger`` bounds
micro-batch size so a backlog never produces one giant batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def incremental_csv_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    partition_cols: tuple[str, ...] = (),
    max_files_per_trigger: int | None = None,
) -> None:
    """One bookmark-style incremental run: read only new CSV files
    under ``input_dir``, apply ``transform``, append as parquet to
    ``output_dir``; stop when caught up (Trigger.AvailableNow).

    Re-running after new files arrive processes ONLY the new files —
    the checkpoint is the bookmark (exactly-once per file).
    """
    reader = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.csv(input_dir)
    if transform is not None:
        df = transform(df)
    writer = (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    query = writer.start()
    query.awaitTermination()
