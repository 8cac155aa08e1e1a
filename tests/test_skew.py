"""Salted-join correctness: result set identical to the plain join,
and the hot key actually spreads across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 10k probe rows, 95% on one hot key
    probe = spark.range(10_000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(
            (F.col("id") % 5).cast("long")
        ).alias("k"),
    )
    build = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(10)], ["k", "label"]
    )
    plain = {
        (r.rid, r.k, r.label)
        for r in probe.join(build, "k").collect()
    }
    salted = {
        (r.rid, r.k, r.label)
        for r in salted_join(probe, build, "k", n_salts=8, salt_on="rid").collect()
    }
    assert salted == plain and len(plain) == 10_000


def test_salt_spreads_hot_key(spark):
    probe = spark.range(8_000).select(
        F.col("id").alias("rid"), F.lit(7).alias("k")
    )
    salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("rid")), F.lit(8)).cast("int")
    )
    sizes = [
        r.cnt
        for r in salted.groupBy("_salt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    ]
    assert len(sizes) == 8  # every salt bucket used
    assert max(sizes) < 8_000 * 0.25  # no bucket holds the hot key alone
