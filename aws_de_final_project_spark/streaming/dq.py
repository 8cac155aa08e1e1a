"""Streaming data-quality: per-micro-batch distribution-drift
monitoring against a persisted reference histogram.

The batch form (operators/dq.psi_drift) compares two slices of one
frame; a production stream wants the same monitor per micro-batch: a
reference histogram is frozen once (e.g. from the training corpus or
last month's accepted data), each arriving batch is binned with the
identical edges, and the PSI lands in an append-only metrics table a
dashboard or alert reads. State is the reference's (group, bin)
counts — tiny, loaded per batch from parquet; per-batch cost is one
hash aggregate on the batch plus a broadcast join against the
reference. Binning and the eps-floored PSI terms are byte-identical
to the batch operator, pinned by the stream==batch test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    path: str,
) -> None:
    """Freeze the reference distribution: per-(group, bin) counts of
    ``df`` written to parquet. Same clamp-to-edge binning as
    operators/dq.psi_drift."""
    from aws_de_final_project_spark.operators.rollup_maint import _hist_bin

    (
        df.groupBy(
            F.col(group_col).alias("grp"),
            _hist_bin(value_col, lo, hi, n_bins).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("ref_c"))
        .filter(F.col("bin").isNotNull())
        .write.mode("overwrite")
        .parquet(path)
    )


def psi_against_reference(
    batch: DataFrame,
    reference_path: str,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI of ``batch`` vs the frozen reference, per group: identical
    eps-floored terms as operators/dq.psi_drift. Returns
    (grp, n_ref, n_cur, psi 4dp) for groups present on both sides."""
    from aws_de_final_project_spark.functions.numeric import (
        round_half_up as rnd,
    )
    from aws_de_final_project_spark.operators.rollup_maint import _hist_bin

    spark = batch.sparkSession
    ref = spark.read.parquet(reference_path)
    cur = (
        batch.groupBy(
            F.col(group_col).alias("grp"),
            _hist_bin(value_col, lo, hi, n_bins).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cur_c"))
        .filter(F.col("bin").isNotNull())
    )
    cells = ref.join(cur, ["grp", "bin"], "full").select(
        "grp",
        "bin",
        F.coalesce(F.col("ref_c"), F.lit(0)).alias("_rc"),
        F.coalesce(F.col("cur_c"), F.lit(0)).alias("_cc"),
    )
    tot = cells.groupBy("grp").agg(
        F.sum("_rc").alias("_rn"), F.sum("_cc").alias("_cn")
    )
    p_ref = F.greatest(
        F.col("_rc").cast("double") / F.col("_rn").cast("double"),
        F.lit(float(eps)),
    )
    p_cur = F.greatest(
        F.col("_cc").cast("double") / F.col("_cn").cast("double"),
        F.lit(float(eps)),
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        cells.join(F.broadcast(tot), "grp")
        .filter((F.col("_rn") > 0) & (F.col("_cn") > 0))
        .groupBy("grp")
        .agg(
            F.max("_rn").alias("n_ref"),
            F.max("_cn").alias("n_cur"),
            rnd(F.sum(term), 4).alias("psi"),
        )
    )


def drift_monitor_stream(
    spark,
    src_dir: str,
    schema: str,
    reference_path: str,
    metrics_dir: str,
    checkpoint_dir: str,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    max_files_per_trigger: int = 1,
):
    """Attach the PSI monitor to a landing directory: each micro-batch
    appends (batch_id, grp, n_ref, n_cur, psi) to ``metrics_dir``
    (overwritten per-batch subdir — retry-idempotent like the
    registry-dedup sink). AvailableNow drains the backlog and stops."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = psi_against_reference(
            batch, reference_path, value_col, group_col, lo, hi, n_bins
        ).withColumn("batch_id", F.lit(int(batch_id)))
        out.write.mode("overwrite").parquet(
            f"{metrics_dir}/batch={int(batch_id)}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
