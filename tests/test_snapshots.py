"""Snapshot/time-travel layout (sources/snapshots.py): generation
writes, pointer reads, rollback, post-rollback allocation, vacuum."""

from __future__ import annotations

import os

import pytest

from aws_de_final_project_spark.sources import snapshots as S


def _vals(spark, df):
    return sorted(r.v for r in df.collect())


def test_snapshot_lifecycle(spark, tmp_path):
    table = str(tmp_path / "state")
    for i in range(3):
        df = spark.createDataFrame([(i * 10 + j,) for j in range(3)], ["v"])
        gen = S.write_snapshot(df, table)
        assert gen == i
    assert S.list_generations(table) == [0, 1, 2]
    assert S.current_generation(table) == 2

    # current + time travel
    assert _vals(spark, S.read_snapshot(spark, table)) == [20, 21, 22]
    assert _vals(spark, S.read_snapshot(spark, table, 0)) == [0, 1, 2]

    # rollback is a pointer move; data untouched
    S.rollback(table, 1)
    assert _vals(spark, S.read_snapshot(spark, table)) == [10, 11, 12]
    assert S.list_generations(table) == [0, 1, 2]

    # a write after rollback allocates PAST the abandoned gen-2
    gen = S.write_snapshot(
        spark.createDataFrame([(99,)], ["v"]), table
    )
    assert gen == 3
    assert _vals(spark, S.read_snapshot(spark, table)) == [99]

    # vacuum keeps the newest N plus current, drops the rest
    S.rollback(table, 1)
    dropped = S.vacuum(table, keep_last=2)
    assert dropped == [0]  # gen-1 kept (current), 2 and 3 newest
    assert S.list_generations(table) == [1, 2, 3]
    assert _vals(spark, S.read_snapshot(spark, table)) == [10, 11, 12]

    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, table, 0)
    with pytest.raises(FileNotFoundError):
        S.rollback(table, 77)
    with pytest.raises(ValueError):
        S.vacuum(table, keep_last=0)


def test_snapshot_readers_never_torn(spark, tmp_path):
    """A failed write (gen dir exists, pointer not flipped) leaves
    readers on the previous version."""
    table = str(tmp_path / "state")
    S.write_snapshot(spark.createDataFrame([(1,)], ["v"]), table)
    # simulate a crash: orphan gen dir without a pointer flip
    os.makedirs(os.path.join(table, "gen-1"))
    assert S.current_generation(table) == 0
    assert _vals(spark, S.read_snapshot(spark, table)) == [1]
    # the next real write skips past the orphan
    gen = S.write_snapshot(spark.createDataFrame([(2,)], ["v"]), table)
    assert gen == 2
    assert _vals(spark, S.read_snapshot(spark, table)) == [2]
