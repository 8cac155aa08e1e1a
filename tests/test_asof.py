"""As-of join unit tests: inclusive backward semantics, left-join
nulls, tie handling, and no row blowup."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators.asof import asof_join


def _ts(s: str):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_asof_backward_inclusive(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (1, _ts("2024-01-01 10:10:00"), 102.0),
            (2, _ts("2024-01-01 10:07:00"), 55.0),
        ],
        ["k", "qts", "px"],
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:04:59"), "t1"),   # -> 100.0
            (1, _ts("2024-01-01 10:05:00"), "t2"),   # inclusive -> 101.0
            (1, _ts("2024-01-01 10:20:00"), "t3"),   # -> 102.0
            (1, _ts("2024-01-01 09:00:00"), "t0"),   # before any quote -> null
            (2, _ts("2024-01-01 10:08:00"), "t4"),   # -> 55.0
            (3, _ts("2024-01-01 10:08:00"), "t5"),   # key with no quotes -> null
        ],
        ["k", "tts", "trade_id"],
    )
    out = asof_join(
        trades, quotes, key_col="k", left_ts="tts", right_ts="qts",
        payload_cols=["px", "qts"],
    )
    rows = {r.trade_id: (r.r_px, r.r_qts) for r in out.collect()}
    assert len(rows) == trades.count()  # exactly one output row per left row
    assert rows["t1"][0] == 100.0
    assert rows["t2"][0] == 101.0
    assert rows["t3"][0] == 102.0
    assert rows["t0"] == (None, None)
    assert rows["t4"][0] == 55.0
    assert rows["t5"] == (None, None)


def test_asof_no_cartesian_on_hot_key(spark):
    """1000 left x 1000 right on ONE key must still produce exactly
    1000 output rows (the window formulation never multiplies)."""
    left = spark.range(1000).select(
        F.lit(1).alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_micros((F.col("id") * 1_000_000).cast("long")).alias("lts"),
    )
    right = spark.range(1000).select(
        F.lit(1).alias("k"),
        F.timestamp_micros((F.col("id") * 1_000_000 + 500_000).cast("long")).alias("rts"),
        (F.col("id") * 10).alias("payload"),
    )
    out = asof_join(left, right, "k", "lts", "rts", ["payload"])
    assert out.count() == 1000
    got = {r.lid: r.r_payload for r in out.collect()}
    assert got[0] is None          # 0.0s < first right at 0.5s
    assert got[1] == 0             # 1.0s -> right at 0.5s (id 0)
    assert got[999] == 9980        # 999.0s -> right at 998.5s (id 998)


def test_range_join_semantics(spark):
    """Exclusive end, single-bin points never duplicated even when an
    interval spans many bins."""
    from aws_de_final_project_spark.operators.rangejoin import range_join

    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 10:00:00"), "long"),
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"), "short"),
            (2, _ts("2024-01-01 05:00:00"), _ts("2024-01-01 06:00:00"), "other"),
        ],
        ["k", "lo", "hi", "tag"],
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 03:33:00"), "inside-long"),
            (1, _ts("2024-01-01 10:00:00"), "boundary"),   # end-exclusive: short only
            (1, _ts("2024-01-01 10:29:59"), "in-short"),
            (1, _ts("2024-01-01 11:00:00"), "nowhere"),
            (2, _ts("2024-01-01 05:30:00"), "other-key"),
        ],
        ["k", "pts", "name"],
    )
    out = range_join(points, intervals, "k", "pts", "lo", "hi", bin_minutes=60)
    got = sorted((r.name, r.tag) for r in out.collect())
    assert got == [
        ("boundary", "short"),
        ("in-short", "short"),
        ("inside-long", "long"),
        ("other-key", "other"),
    ]
    # a 10-hour interval spans 10 bins but each point matches exactly once
    assert out.count() == 4

    # left join: unmatched points survive NULL-padded (the predicate
    # is in the join condition, not a post-filter — ADVICE r1)
    left = range_join(
        points, intervals, "k", "pts", "lo", "hi", bin_minutes=60, how="left"
    )
    lgot = sorted((r.name, r.tag) for r in left.collect())
    assert lgot == [
        ("boundary", "short"),
        ("in-short", "short"),
        ("inside-long", "long"),
        ("nowhere", None),
        ("other-key", "other"),
    ]

    # duplicate-unsafe outer variants are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate-free"):
        range_join(
            points, intervals, "k", "pts", "lo", "hi", how="full"
        )


def test_overlap_pairs_semantics(spark):
    """Inclusive-endpoint overlap; a pair sharing many bins counts
    once; key isolation; no self/reversed pairs."""
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators.rangejoin import overlap_pairs

    iv = spark.createDataFrame(
        [
            # key 1: a overlaps b (touching endpoints), c disjoint
            (1, 1, "2024-01-01", "2024-03-15"),   # 75-day span, many bins
            (2, 1, "2024-03-15", "2024-03-20"),   # touches a's end -> overlap
            (3, 1, "2024-06-01", "2024-06-10"),   # disjoint
            # key 2: same dates as 1/2 but different key
            (4, 2, "2024-01-01", "2024-03-15"),
            (5, 2, "2024-05-01", "2024-05-02"),
        ],
        "id int, k int, lo string, hi string",
    ).select(
        "id", "k", F.to_date("lo").alias("lo"), F.to_date("hi").alias("hi")
    )
    out = overlap_pairs(iv, ["k"], "lo", "hi", "id", bin_days=7)
    got = {(r.id_a, r.id_b): r.overlap_days for r in out.collect()}
    assert got == {(1, 2): 1}  # touching endpoint day counts, once


def test_overlap_pairs_equal_bruteforce(spark):
    """Exact parity with the all-pairs theta-join on a random-ish
    deterministic scatter across keys and bin widths."""
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators.rangejoin import overlap_pairs

    base = spark.range(300).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 5).cast("int").alias("k"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            ((F.col("id") * 37) % 365).cast("int"),
        ).alias("lo"),
    ).withColumn(
        "hi", F.date_add(F.col("lo"), ((F.col("id") * 13) % 45).cast("int"))
    )
    for width in (7, 30, 400):
        got = {
            (r.id_a, r.id_b, r.overlap_days)
            for r in overlap_pairs(
                base, ["k"], "lo", "hi", "id", bin_days=width
            ).collect()
        }
        a = base.select(
            F.col("id").alias("id_a"), "k",
            F.col("lo").alias("loa"), F.col("hi").alias("hia"),
        )
        b = base.select(
            F.col("id").alias("id_b"), F.col("k").alias("kb"),
            F.col("lo").alias("lob"), F.col("hi").alias("hib"),
        )
        brute = {
            (r.id_a, r.id_b, r.od)
            for r in a.join(b, (F.col("k") == F.col("kb")) & (F.col("id_a") < F.col("id_b")))
            .filter((F.col("loa") <= F.col("hib")) & (F.col("lob") <= F.col("hia")))
            .select(
                "id_a", "id_b",
                (F.datediff(F.least("hia", "hib"), F.greatest("loa", "lob")) + 1)
                .cast("long").alias("od"),
            )
            .collect()
        }
        assert got == brute, f"bin_days={width}"
        assert len(brute) > 100


def test_interval_coverage_sweep_line(spark):
    """Hand-checkable union: overlapping, nested, disjoint, and
    duplicate intervals all reduce to the right covered length."""
    from aws_de_final_project_spark.plans.queries import (
        interval_coverage_per_user,
    )  # noqa: F401  (entry exercises the real table; here test the math)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [  # (user, start, end)
        (1, 0, 10), (1, 5, 15),      # overlap -> 15
        (1, 20, 25),                 # disjoint -> +5
        (2, 0, 100), (2, 10, 20),    # nested -> 100
        (2, 0, 100),                 # duplicate -> still 100
    ]
    e = spark.createDataFrame(rows, "user_id long, _s long, _e long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = e.withColumn("_pme", F.max("_e").over(w))
    contrib = F.greatest(
        F.col("_e")
        - F.greatest(F.col("_s"), F.coalesce(F.col("_pme"), F.col("_s"))),
        F.lit(0),
    )
    got = {
        r.user_id: r.c
        for r in swept.groupBy("user_id")
        .agg(F.sum(contrib).alias("c"))
        .collect()
    }
    assert got == {1: 20, 2: 100}
