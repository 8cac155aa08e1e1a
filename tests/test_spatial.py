"""Grid-bucketed spatial radius join (operators/spatial.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators.spatial import (
    grid_cell_sizes,
    haversine_km,
    spatial_near_pairs,
)


def test_haversine_known_distance(spark):
    # Chicago Loop (41.8781, -87.6298) to O'Hare (41.9742, -87.9073):
    # ~25.9 km great-circle
    df = spark.createDataFrame(
        [(41.8781, -87.6298, 41.9742, -87.9073)], "la double, lo double, lb double, lob double"
    )
    d = df.select(
        haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lob")).alias("d")
    ).collect()[0]["d"]
    assert 25.0 < d < 27.0


def test_cell_sizes_cover_radius(spark):
    wlat, wlon = grid_cell_sizes(1.0, 42.1)
    # each cell edge is at least the radius in km anywhere in the band
    assert wlat * 110.574 >= 1.0 - 1e-9
    assert wlon * 111.32 * math.cos(math.radians(42.1)) >= 1.0 - 1e-9


def test_grid_pairs_equal_bruteforce(spark):
    """Exact-recall proof on a deterministic scatter: the grid join
    must find exactly the brute-force pair set — including pairs that
    straddle cell boundaries."""
    import random

    rng = random.Random(7)
    rows = [
        (i, 41.6 + rng.random() * 0.5, -87.9 + rng.random() * 0.4)
        for i in range(400)
    ]
    pts = spark.createDataFrame(rows, "id int, lat double, lon double")
    grid = {
        (r.id_a, r.id_b)
        for r in spatial_near_pairs(pts, 1.0, 42.1).collect()
    }
    a = pts.select(
        F.col("id").alias("id_a"), F.col("lat").alias("la"), F.col("lon").alias("lo")
    )
    b = pts.select(
        F.col("id").alias("id_b"), F.col("lat").alias("lb"), F.col("lon").alias("lob")
    )
    brute = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "d",
            haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lob")),
        )
        .filter(F.round(F.col("d"), 4) <= 1.0)
        .collect()
    }
    assert grid == brute
    assert len(brute) > 50  # the scatter actually produced near pairs


def test_no_duplicate_pairs(spark):
    """A pair straddling cells must appear exactly once (one-ring
    probe joins each pair in a single cell — no distinct needed)."""
    pts = spark.createDataFrame(
        [(1, 41.700, -87.700), (2, 41.7001, -87.7001), (3, 41.709, -87.709)],
        "id int, lat double, lon double",
    )
    out = spatial_near_pairs(pts, 1.0, 42.1).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs))
    assert (1, 2) in pairs
