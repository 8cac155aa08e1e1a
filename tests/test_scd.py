"""SCD2 changelog builder: run collapse, null-safe change detection,
timestamp tie-breaks, interval chaining, point-in-time lookup."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators.scd import (
    scd2_from_changelog,
    scd2_point_in_time,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _log(spark):
    rows = [
        # entity 1: A, A (no-op), B, B (no-op), A again -> 3 runs
        (1, "A", _ts("2026-01-01T00:00:00"), 1),
        (1, "A", _ts("2026-01-02T00:00:00"), 2),
        (1, "B", _ts("2026-01-03T00:00:00"), 3),
        (1, "B", _ts("2026-01-04T00:00:00"), 4),
        (1, "A", _ts("2026-01-05T00:00:00"), 5),
        # entity 2: NULL -> NULL is no change; NULL -> X is a change
        (2, None, _ts("2026-01-01T00:00:00"), 6),
        (2, None, _ts("2026-01-02T00:00:00"), 7),
        (2, "X", _ts("2026-01-03T00:00:00"), 8),
        # entity 3: same-timestamp collision ordered by the tie column
        (3, "P", _ts("2026-01-01T00:00:00"), 9),
        (3, "Q", _ts("2026-01-01T00:00:00"), 10),
    ]
    return spark.createDataFrame(
        rows, "key int, attr string, ts timestamp, seq int"
    )


def test_scd2_runs_and_intervals(spark):
    out = scd2_from_changelog(_log(spark), "key", ["attr"], "ts", "seq")
    rows = sorted(
        [
            (r["key"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()
        ],
        key=lambda r: (r[0], r[2], r[1] or ""),
    )
    e1 = [r for r in rows if r[0] == 1]
    assert [(r[1], r[4]) for r in e1] == [("A", False), ("B", False), ("A", True)]
    # intervals chain with no gaps: each valid_to == next valid_from
    assert e1[0][3] == e1[1][2] and e1[1][3] == e1[2][2]
    e2 = [r for r in rows if r[0] == 2]
    assert [(r[1], r[4]) for r in e2] == [(None, False), ("X", True)]
    assert e2[0][2] == _ts("2026-01-01T00:00:00")  # first NULL opens the run
    e3 = [r for r in rows if r[0] == 3]
    # tie broken by seq: P first (closed instantly), Q current
    assert [(r[1], r[4]) for r in e3] == [("P", False), ("Q", True)]


def test_scd2_point_in_time(spark):
    dim = scd2_from_changelog(_log(spark), "key", ["attr"], "ts", "seq")
    at = scd2_point_in_time(dim, _ts("2026-01-03T12:00:00"))
    state = {r["key"]: r["attr"] for r in at.collect()}
    assert state == {1: "B", 2: "X", 3: "Q"}
    # before any observation: empty state
    assert scd2_point_in_time(dim, _ts("2025-12-31T00:00:00")).count() == 0


def test_scd2_one_shuffle_on_entity_key(spark):
    """Both windows must share the user partition — exactly one
    Exchange in the plan (plus the scan)."""
    plan = (
        scd2_from_changelog(_log(spark), "key", ["attr"], "ts", "seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cdc_apply_hand_stream(spark):
    from aws_de_final_project_spark.operators.scd import cdc_apply

    rows = [
        # key 1: insert, update -> survives with newest payload
        (1, "a", _ts("2026-01-01T00:00:00"), 1, "U"),
        (1, "b", _ts("2026-01-02T00:00:00"), 2, "U"),
        # key 2: upsert then delete -> absent
        (2, "x", _ts("2026-01-01T00:00:00"), 3, "U"),
        (2, "x", _ts("2026-01-02T00:00:00"), 4, "D"),
        # key 3: delete then re-insert -> present again
        (3, "p", _ts("2026-01-01T00:00:00"), 5, "D"),
        (3, "q", _ts("2026-01-02T00:00:00"), 6, "U"),
        # key 4: same-ts collision, tie broken by seq (D is newest)
        (4, "m", _ts("2026-01-01T00:00:00"), 7, "U"),
        (4, "m", _ts("2026-01-01T00:00:00"), 8, "D"),
    ]
    df = spark.createDataFrame(
        rows, "key int, payload string, ts timestamp, seq int, op string"
    )
    out = cdc_apply(df, ["key"], "ts", "seq", "op")
    state = {r["key"]: r["payload"] for r in out.collect()}
    assert state == {1: "b", 3: "q"}
    assert "op" not in out.columns and "_rn" not in out.columns


def test_table_diff_classifies_all_transitions(spark):
    from aws_de_final_project_spark.operators.scd import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, None, 3.0), (5, "e", 5.0)],
        "k int, s string, v double",
    )
    out = {
        r["k"]: r["change_type"]
        for r in table_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # 1 unchanged (omitted), 2 changed, 3 unchanged with NULLs
    # (null-safe compare), 4 removed, 5 added
    assert out == {2: "changed", 4: "removed", 5: "added"}
    row = {
        r["k"]: r
        for r in table_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert row[2]["old_s"] == "b" and row[2]["new_s"] == "B"
    assert row[5]["old_s"] is None and row[5]["new_s"] == "e"
