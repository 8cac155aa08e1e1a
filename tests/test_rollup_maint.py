"""Incremental rollup maintenance == full recompute
(operators/rollup_maint.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators.rollup_maint import (
    maintain_rollup,
    merge_aggs,
    partial_aggs,
)

MEASURES = [
    ("total_value", "value", "sum"),
    ("n_events", "value", "count"),
    ("min_value", "value", "min"),
    ("max_value", "value", "max"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user_id int, value double")


def test_merge_equals_recompute(spark):
    d1 = _mk(spark, [(1, 10.0), (1, 20.0), (2, 5.0)])
    d2 = _mk(spark, [(1, 1.0), (3, 7.0)])
    d3 = _mk(spark, [(2, -4.0), (3, 100.0), (3, None)])

    state = partial_aggs(d1, ["user_id"], MEASURES)
    for d in (d2, d3):
        state = merge_aggs(
            state, partial_aggs(d, ["user_id"], MEASURES), ["user_id"], MEASURES
        )

    full = partial_aggs(
        d1.unionByName(d2).unionByName(d3), ["user_id"], MEASURES
    )
    got = {tuple(r) for r in state.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    # count counted non-null values only
    by_user = {r["user_id"]: r for r in state.collect()}
    assert by_user[3]["n_events"] == 2
    assert by_user[2]["min_value"] == -4.0


def test_maintain_rollup_on_disk(spark, tmp_path):
    path = str(tmp_path / "rollup")
    deltas = [
        _mk(spark, [(1, 10.0), (2, 5.0)]),
        _mk(spark, [(1, 2.0), (3, 9.0)]),
        _mk(spark, [(2, 1.0), (1, 4.0)]),
    ]
    for d in deltas:
        state = maintain_rollup(spark, d, path, ["user_id"], MEASURES)

    full = partial_aggs(
        deltas[0].unionByName(deltas[1]).unionByName(deltas[2]),
        ["user_id"],
        MEASURES,
    )
    got = {tuple(r) for r in state.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    # derived avg at read time matches
    avg = (
        state.withColumn("avg_value", F.col("total_value") / F.col("n_events"))
        .filter(F.col("user_id") == 1)
        .collect()[0]["avg_value"]
    )
    assert abs(avg - (10.0 + 2.0 + 4.0) / 3) < 1e-12


VAR_MEASURES = [
    ("s1", "value", "sum"),
    ("n", "value", "count"),
    ("s2", "value", "sumsq"),
    ("kinds", "kind", "hll"),
]


def test_sumsq_and_hll_merge_equals_recompute(spark):
    """VERDICT r2 #7: the second moment (variance at read) and the
    HLL distinct sketch must both be delta-mergeable — merge of
    per-delta partials == one-shot aggregate, including the sketch's
    ESTIMATE (DataSketches HLL union is exactly associative)."""
    rows = [
        (1, 10.0, "a"), (1, 20.0, "b"), (1, 20.0, "a"),
        (2, 5.0, "a"), (2, -3.0, "c"), (3, 7.0, "b"), (3, None, "b"),
    ]
    df = spark.createDataFrame(rows, "user_id int, value double, kind string")
    deltas = [df.filter(F.expr(f"pmod(hash(value), 2) = {i}")) for i in range(2)]

    state = partial_aggs(deltas[0], ["user_id"], VAR_MEASURES)
    state = merge_aggs(
        state,
        partial_aggs(deltas[1], ["user_id"], VAR_MEASURES),
        ["user_id"],
        VAR_MEASURES,
    )
    full = partial_aggs(df, ["user_id"], VAR_MEASURES)

    def deriv(frame):
        return {
            r["user_id"]: (
                round(r["s1"] or 0.0, 9),
                r["n"],
                round(r["s2"] or 0.0, 9),
                r["n_kinds"],
                round(r["var"], 9) if r["var"] is not None else None,
            )
            for r in frame.select(
                "user_id", "s1", "n", "s2",
                F.hll_sketch_estimate("kinds").alias("n_kinds"),
                F.when(
                    F.col("n") > 0,
                    F.col("s2") / F.col("n")
                    - (F.col("s1") / F.col("n")) ** 2,
                ).alias("var"),
            ).collect()
        }

    got, want = deriv(state), deriv(full)
    assert got == want
    # spot-check against closed-form population variance for user 1
    import statistics

    assert abs(got[1][4] - statistics.pvariance([10.0, 20.0, 20.0])) < 1e-9
    assert got[1][3] == 2  # distinct kinds a, b


def test_hist_merge_equals_recompute_and_quantile_bound(spark):
    """hist state: 3-delta fold == one-shot partial (integer bin
    counts merge exactly), and the read-time quantile estimate is
    within one bin width of the exact percentile."""
    import random

    from aws_de_final_project_spark.operators.rollup_maint import (
        hist_quantile,
    )

    rng = random.Random(11)
    rows = [(i % 4, rng.uniform(0.0, 100.0)) for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id int, value double")
    kind = "hist:0.0:100.0:25"  # bin width 4.0
    measures = [("h", "value", kind)]

    state = None
    for i in range(3):
        delta = df.filter(F.expr(f"pmod(CAST(value * 1000 AS INT), 3) = {i}"))
        part = partial_aggs(delta, ["user_id"], measures)
        state = (
            part if state is None
            else merge_aggs(state, part, ["user_id"], measures)
        )
    oneshot = {
        r.user_id: list(r.h)
        for r in partial_aggs(df, ["user_id"], measures).collect()
    }
    folded = {r.user_id: list(r.h) for r in state.collect()}
    assert folded == oneshot  # exact integer-count merge

    est = {
        r.user_id: r.p50
        for r in hist_quantile(
            state, ["user_id"], "h", kind, 0.5, "p50"
        ).collect()
    }
    vals = {}
    for u, v in rows:
        vals.setdefault(u, []).append(v)
    for u, xs in vals.items():
        xs.sort()
        exact = xs[int(0.5 * len(xs))]
        assert abs(est[u] - exact) <= 4.0 + 1e-9, (u, est[u], exact)
