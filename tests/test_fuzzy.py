"""Symmetric-delete fuzzy matching (operators/fuzzy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators.fuzzy import fuzzy_pairs


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "id int, name string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df).collect()
    }


def test_edit_kinds(spark):
    got = _pairs(
        spark,
        [
            (1, "kitten"),
            (2, "mitten"),   # substitution  -> dist 1
            (3, "kittens"),  # insertion     -> dist 1
            (4, "kitte"),    # deletion      -> dist 1
            (5, "kitten"),   # exact dup     -> dist 0
            (6, "sitting"),  # far           -> absent
        ],
    )
    assert (1, 2, 1) in got
    assert (1, 3, 1) in got
    assert (1, 4, 1) in got
    assert (1, 5, 0) in got
    assert not any(6 in (a, b) for a, b, _ in got)


def test_no_duplicate_pairs(spark):
    """A pair sharing several delete variants ('aa' vs 'ab' shares
    variant 'a' twice pre-distinct) surfaces exactly once."""
    df = spark.createDataFrame(
        [(1, "aa"), (2, "ab")], "id int, name string"
    )
    rows = fuzzy_pairs(df).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in rows] == [(1, 2, 1)]


def test_transposition_excluded(spark):
    """'ab' vs 'ba' shares delete variants but unit-cost levenshtein
    is 2 — the exact verify must reject the candidate."""
    assert _pairs(spark, [(1, "ab"), (2, "ba")]) == set()


def test_recall_equals_bruteforce(spark):
    rows = [(i, f"Customer#{i:09d}") for i in range(1, 151)]
    df = spark.createDataFrame(rows, "id int, name string")
    got = {(a, b) for a, b, _ in _pairs(spark, rows)}
    a = df.select(F.col("id").alias("id_a"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("id_b"), F.col("name").alias("nb"))
    brute = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("na", "nb") <= 1)
        .collect()
    }
    assert got == brute
    assert len(brute) > 100
