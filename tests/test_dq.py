"""Data-quality expectation suite (operators/dq.py).

Every check type exercised on inline rows with KNOWN violation counts,
plus plan-shape proof that an arbitrary suite costs one scan (single
hash-aggregate) and that referential checks ride a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators import dq


def _suite_map(df, checks, refs=()):
    rows = dq.check_suite(df, checks, refs=refs).collect()
    return {r["check_name"]: (r["violations"], r["passed"]) for r in rows}


def test_all_check_types(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "OK"),
            (2, None, 250.0, "OK"),       # null name, price over ceiling
            (2, "c", -5.0, "BAD"),        # dup id, price under floor, bad status
            (3, "d", None, "weird"),      # null price (not a range violation)
        ],
        "id int, name string, price double, status string",
    )
    got = _suite_map(
        df,
        [
            dq.not_null("name"),
            dq.unique("id"),
            dq.in_range("price", 0.0, 100.0),
            dq.accepted_values("status", ["OK", "BAD"]),
            dq.matches_regex("status", "^[A-Z]+$"),
            dq.satisfies("price_under_1k", F.col("price") < 1000),
        ],
    )
    assert got["not_null:name"] == (1, False)
    assert got["unique:id"] == (1, False)
    assert got["in_range:price"] == (2, False)
    assert got["accepted_values:status"] == (1, False)
    assert got["matches_regex:status"] == (1, False)
    # NULL price -> cond NULL -> counted as violation (unverifiable row)
    assert got["satisfies:price_under_1k"] == (1, False)


def test_referential_check(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, fk int"
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "k int")
    got = _suite_map(
        fact, [dq.not_null("fk")], refs=[("fk", dim, "k")]
    )
    # fk=99 is an orphan; NULL fk is NOT an orphan (it's a not_null hit)
    assert got["referential:fk->k"] == (1, False)
    assert got["not_null:fk"] == (1, False)


def test_passing_suite(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    out = dq.check_suite(df, [dq.unique("id"), dq.not_null("s")])
    assert all(r["passed"] and r["violations"] == 0 for r in out.collect())


def test_single_scan_plan(spark, sf_dir):
    """An N-check suite with a referential check must still be ONE scan
    of the fact table: exactly one parquet scan of orders in the plan,
    and the dimension side broadcast (no shuffle of the fact)."""
    from aws_de_final_project_spark.plans.extensions import dq_orders_suite

    plan = dq_orders_suite(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_psi_drift_detects_planted_shift(spark):
    """PSI ~ 0 when both slices share a distribution; large when the
    current slice shifts. Also pins the one-scan plan (single base
    aggregate) and the parameter guard."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators.dq import psi_drift

    rows = []
    for i in range(4000):
        # group "stable": identical distribution both sides
        rows.append(("stable", float(i % 100), i % 2 == 0))
        # group "shifted": current slice moved up by 60
        base = float(i % 100)
        cur = i % 2 == 0
        rows.append(("shifted", base + (60.0 if cur else 0.0), cur))
    df = spark.createDataFrame(rows, "grp string, v double, cur boolean")
    out = {
        r.grp: r.psi
        for r in psi_drift(
            df, "v", F.col("cur"), "grp", lo=0.0, hi=160.0, n_bins=16
        ).collect()
    }
    assert out["stable"] < 0.01, out
    assert out["shifted"] > 0.25, out

    with _pt.raises(ValueError):
        psi_drift(df, "v", F.col("cur"), "grp", lo=1.0, hi=1.0)


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    """A single extreme point must be flagged WITHOUT dragging the
    estimate (the failure mode of mean/stddev z-scores): median and
    MAD stay at the bulk's values."""
    from aws_de_final_project_spark.operators.dq import mad_outliers

    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14, 1000]]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, "v", "grp", k=3.0).collect()
    flagged = {r.v for r in out if r.is_outlier}
    assert flagged == {1000.0}
    assert out[0].group_median == 12.5  # bulk median, not dragged
    import pytest as _pt

    with _pt.raises(ValueError):
        mad_outliers(df, "v", "grp", k=0)


def test_k_anonymity_classes_and_validation(spark):
    import pytest

    from aws_de_final_project_spark.operators.dq import k_anonymity

    rows = (
        [("60601", 1990)] * 5      # big class: safe at k=3
        + [("60602", 1990)] * 2    # size 2 < 3: violating
        + [("60603", 1985)]        # singleton: violating
        + [(None, 1985)] * 2       # NULLs form their OWN class
    )
    df = spark.createDataFrame(rows, "zip string, birth_year int")
    out = {
        (r["zip"], r["birth_year"], r["class_size"])
        for r in k_anonymity(df, ["zip", "birth_year"], k=3).collect()
    }
    assert out == {
        ("60602", 1990, 2),
        ("60603", 1985, 1),
        (None, 1985, 2),
    }
    with pytest.raises(ValueError):
        k_anonymity(df, ["zip"], k=1)
