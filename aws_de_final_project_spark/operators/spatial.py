"""Grid-bucketed spatial operators (radius self-join without a cross
product).

The reference's domain is geographic — Chicago crimes with
latitude/longitude columns (``CDK/cdk/cdk_stack.py`` crawls them;
FIXTURES.md §A) — but its Athena views never exploit them. Proximity
analysis ("incidents within 1 km of each other") is the canonical
spatial query, and the naive form is an O(n²) theta-join on a distance
expression — the same scale-killer as all-pairs cosine.

The scale shape here mirrors the embedding-dedup design: bucket each
point into a lat/lon grid whose cell edge is AT LEAST the search
radius everywhere in the latitude band, probe the 3x3 neighbor ring on
one side only, equi-join on the cell id, then verify with the exact
haversine distance. A qualifying pair can never be 2 cells apart (cell
edge >= radius), so recall is exact — and the registered query's
DuckDB twin is the BRUTE-FORCE all-pairs join, which makes the
correctness check a recall proof, not just a formula check.

Valid per latitude band: the longitude cell width uses the band's
highest |latitude| (where degrees are narrowest). A global version
shards into bands first; this corpus (Chicago, 41.6°-42.1°N) is one
band.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import round_half_up as rnd

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 110.574
KM_PER_DEG_LON_EQ = 111.32


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km. Written as products (no pow) with
    a fixed operation order so the identical expression interpolates
    into ANSI SQL with bit-compatible float behavior."""
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat_a))
        * F.cos(F.radians(lat_b))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell_sizes(radius_km: float, band_max_abs_lat: float) -> tuple[float, float]:
    """(lat_deg, lon_deg) cell edge sizes that are >= radius_km in km
    everywhere in the band — the one-ring-coverage precondition."""
    wlat = radius_km / KM_PER_DEG_LAT
    wlon = radius_km / (
        KM_PER_DEG_LON_EQ * math.cos(math.radians(band_max_abs_lat))
    )
    return wlat, wlon


def spatial_near_pairs(
    points: DataFrame,
    radius_km: float,
    band_max_abs_lat: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (haversine),
    found via a grid-cell equi-join — no CartesianProduct (pinned in
    tests/test_plan_shapes.py).

    One side keeps its home cell; the other explodes the 3x3 neighbor
    ring (9x rows on ONE side only, like the LSH multi-probe shape).
    Each qualifying pair joins in exactly one cell (the home cell of
    the lower id's partner), so no post-join distinct is needed; the
    ``id_a < id_b`` filter both dedups and halves the verify work.
    Output: id_a, id_b, dist_km (4dp, round-then-filter so the
    threshold behaves identically across engines).
    """
    wlat, wlon = grid_cell_sizes(radius_km, band_max_abs_lat)
    cx = F.floor(F.col(lat_col) / F.lit(wlat)).cast("int")
    cy = F.floor(F.col(lon_col) / F.lit(wlon)).cast("int")
    home = points.select(
        F.col(id_col).alias("_ida"),
        F.col(lat_col).alias("_lata"),
        F.col(lon_col).alias("_lona"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    ring = F.expr(
        "explode(array("
        + ",".join(
            f"named_struct('dx', {dx}, 'dy', {dy})"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    probe = points.select(
        F.col(id_col).alias("_idb"),
        F.col(lat_col).alias("_latb"),
        F.col(lon_col).alias("_lonb"),
        cx.alias("_cxb"),
        cy.alias("_cyb"),
        ring.alias("_d"),
    ).select(
        "_idb",
        "_latb",
        "_lonb",
        (F.col("_cxb") + F.col("_d.dx")).alias("cx"),
        (F.col("_cyb") + F.col("_d.dy")).alias("cy"),
    )
    return (
        home.join(probe, ["cx", "cy"])
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            rnd(
                haversine_km(
                    F.col("_lata"), F.col("_lona"), F.col("_latb"), F.col("_lonb")
                ),
                4,
            ).alias("dist_km"),
        )
        .filter(F.col("dist_km") <= radius_km)
    )
