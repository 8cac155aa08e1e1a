"""Dialect-gap unit tests (SURVEY.md §5.4): the three Presto<->Spark
semantic traps F4-F6, where a naive port silently breaks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.dialect import (
    iso_day_of_week,
    presto_date_format,
    presto_date_parse,
    translate_presto_datetime_pattern,
)


def test_token_translation_reference_patterns():
    # the exact patterns in the reference
    assert (
        translate_presto_datetime_pattern("%m/%d/%Y %T %p")
        == "MM/dd/yyyy hh:mm:ss a"
    )
    assert translate_presto_datetime_pattern("%W") == "EEEE"
    assert translate_presto_datetime_pattern("%Y-%m-%d") == "yyyy-MM-dd"


def test_unknown_token_raises():
    with pytest.raises(ValueError):
        translate_presto_datetime_pattern("%Q")


def test_date_parse_and_weekday(spark):
    # 2015-03-18 was a Wednesday (ISO weekday 3); 12-hour PM string
    df = spark.createDataFrame(
        [("03/18/2015 07:44:00 PM",), ("01/01/2024 12:09:58 AM",)], ["s"]
    )
    out = df.select(
        presto_date_parse("s", "%m/%d/%Y %T %p").alias("ts")
    ).select(
        F.col("ts"),
        presto_date_format("ts", "%W").alias("name"),
        iso_day_of_week("ts").alias("iso"),
        F.dayofweek("ts").alias("spark_dow"),
    )
    rows = {str(r.ts): r for r in out.collect()}
    r1 = rows["2015-03-18 19:44:00"]
    assert r1.name == "Wednesday" and r1.iso == 3
    # the off-by-one trap: Spark's dayofweek is Sunday=1 -> Wed=4
    assert r1.spark_dow == 4
    r2 = rows["2024-01-01 00:09:58"]  # 12:09 AM parses to 00:09
    assert r2.name == "Monday" and r2.iso == 1


def test_sunday_boundary(spark):
    # Sunday: ISO=7, Spark dayofweek=1 — the worst-case disagreement
    df = spark.createDataFrame([("01/07/2024 01:00:00 PM",)], ["s"])
    r = df.select(
        iso_day_of_week(
            presto_date_parse("s", "%m/%d/%Y %T %p")
        ).alias("iso")
    ).first()
    assert r.iso == 7
