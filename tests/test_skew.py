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


def test_aqe_splits_skewed_smj(spark):
    """AQE's runtime skew repair — the first line of defense
    session.py enables — must actually split the hot partition of a
    sort-merge join. Thresholds are lowered so the planted 90%-hot key
    crosses them at test scale; the assertion is the `skew=true`
    marker on the SMJ in the final adaptive plan."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # pad must be incompressible (shuffle stats are post-LZ4) and
        # must survive column pruning (referenced by the aggregate),
        # or the hot partition's bytes never cross the threshold.
        probe = spark.range(400_000).select(
            F.col("id").alias("rid"),
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        build = spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("lbl")
        ).hint("merge")
        df = probe.join(build, "k").groupBy("lbl").agg(
            F.count(F.lit(1)).alias("cnt"), F.min("pad").alias("min_pad")
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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
