"""Join-view IVM (operators/ivm.py): delta algebra == one-shot join,
term disjointness, and empty-delta no-ops."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators import ivm


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_fold_equals_oneshot(spark):
    a_rows = [(k, f"a{k}") for k in range(30)]
    b_rows = [(k % 10, f"b{k}") for k in range(20)]  # key reuse -> fanout
    a = _df(spark, a_rows, "k long, av string")
    b = _df(spark, b_rows, "k long, bv string")
    oneshot = sorted(
        (r.k, r.av, r.bv) for r in a.join(b, "k").collect()
    )
    a_b = [a.filter(F.col("k") % 3 == i) for i in range(3)]
    b_b = [b.filter(F.col("k") % 3 == i) for i in range(3)]
    folded = sorted(
        (r.k, r.av, r.bv)
        for r in ivm.fold_join_view(a_b, b_b, ["k"]).collect()
    )
    assert folded == oneshot and len(folded) > 0


def test_delta_terms_are_disjoint_and_complete(spark):
    """dV must contain exactly the NEW join rows: every pair with at
    least one delta member, none twice."""
    a_old = _df(spark, [(1, "a1")], "k long, av string")
    da = _df(spark, [(1, "a2"), (2, "a3")], "k long, av string")
    b_old = _df(spark, [(1, "b1"), (2, "b2")], "k long, bv string")
    db = _df(spark, [(2, "b3")], "k long, bv string")
    dv = sorted(
        (r.k, r.av, r.bv)
        for r in ivm.join_view_delta(a_old, da, b_old, db, ["k"]).collect()
    )
    # new pairs = all pairs minus old x old
    a_all = [(1, "a1"), (1, "a2"), (2, "a3")]
    b_all = [(1, "b1"), (2, "b2"), (2, "b3")]
    all_pairs = sorted(
        (ka, av, bv) for ka, av in a_all for kb, bv in b_all if ka == kb
    )
    old_pairs = sorted(
        (ka, av, bv)
        for ka, av in [(1, "a1")]
        for kb, bv in [(1, "b1"), (2, "b2")]
        if ka == kb
    )
    want = sorted(p for p in all_pairs if p not in old_pairs)
    assert dv == want
    assert len(dv) == len(set(dv))  # no term double-counts


def test_empty_deltas_are_noops(spark):
    a_old = _df(spark, [(1, "a1")], "k long, av string")
    b_old = _df(spark, [(1, "b1")], "k long, bv string")
    empty_a = a_old.limit(0)
    empty_b = b_old.limit(0)
    dv = ivm.join_view_delta(a_old, empty_a, b_old, empty_b, ["k"])
    assert dv.count() == 0
    with pytest.raises(ValueError):
        ivm.fold_join_view([], [], ["k"])
