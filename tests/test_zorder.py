"""Z-order clustered writer: multi-dimension file skipping, measured.

The claim behind sources/registry.write_zordered is about file
ENVELOPES: after z-order clustering, each parquet file's [min, max]
range is tight in every z-ordered dimension, so a point/band predicate
on ANY dimension overlaps few files. The test measures exactly that
from the written footers (pyarrow), comparing against the
single-column range-sorted layout where the non-leading dimension's
envelopes each span the whole domain (coverage ~1.0).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from aws_de_final_project_spark.sources.registry import (
    write_range_sorted,
    write_zordered,
)

N_FILES = 16


def _envelopes(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.read_metadata(f)
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = (
                        s.min if lo[name] is None else min(lo[name], s.min)
                    )
                    hi[name] = (
                        s.max if hi[name] is None else max(hi[name], s.max)
                    )
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _coverage(envs: list[dict], col: str, probes: list[float]) -> float:
    """Mean fraction of files whose [min,max] contains a probe."""
    hits = [
        sum(1 for e in envs if e[col][0] <= p <= e[col][1]) / len(envs)
        for p in probes
    ]
    return sum(hits) / len(hits)


def test_zorder_skips_files_on_both_dims(spark, tmp_path):
    from pyspark.sql import functions as F

    df = (
        spark.range(40000)
        .select(
            (F.pmod(F.xxhash64("id"), 100000) / 100000.0).alias("x"),
            (F.pmod(F.xxhash64((F.col("id") + 7).cast("long")), 100000)
             / 100000.0).alias("y"),
            F.col("id"),
        )
    )
    probes = [0.05, 0.25, 0.5, 0.75, 0.95]

    linear = str(tmp_path / "linear")
    write_range_sorted(df, linear, ["x"], n_partitions=N_FILES)
    env_lin = _envelopes(linear, ["x", "y"])
    # leading key: near-perfect skipping; other dim: none
    assert _coverage(env_lin, "x", probes) < 0.2
    assert _coverage(env_lin, "y", probes) > 0.9

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, ["x", "y"], n_partitions=N_FILES)
    env_z = _envelopes(zpath, ["x", "y"])
    cx, cy = _coverage(env_z, "x", probes), _coverage(env_z, "y", probes)
    # both dimensions must skip a solid majority of files
    assert cx < 0.6 and cy < 0.6, (cx, cy)
    # and the layout must beat the linear sort on the non-leading dim
    assert cy < _coverage(env_lin, "y", probes) - 0.3

    # correctness: same rows either way
    a = spark.read.parquet(linear).agg(F.sum("id")).collect()[0][0]
    b = spark.read.parquet(zpath).agg(F.sum("id")).collect()[0][0]
    assert a == b


def test_zorder_pruned_scan_entry_skips_files(spark):
    """VERDICT r4 #4: the clustered-layout win, pinned on the REGISTERED
    query (plans/extensions.py::zorder_pruned_scan), not just a synthetic
    frame. After the entry writes its z-ordered copy of events, (a) the
    box predicate's file-envelope intersection must cover a minority of
    the written files — the fraction any footer-stats reader (Spark's
    row-group pruning included) actually reads — and (b) the predicate
    must reach the parquet scan as PushedFilters, so the skipping isn't
    undone by a post-scan filter."""
    import os
    import tempfile

    from aws_de_final_project_spark.plans import extensions as X

    sf_dir = "/root/testdata/sf0.001"
    df = X.zorder_pruned_scan(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0

    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_zorder_events_{os.path.basename(sf_dir)}",
    )
    envs = _envelopes(path, ["user_id", "value"])
    n_written = len(envs)
    assert n_written >= 8  # the writer actually fanned out
    hit = sum(
        1
        for e in envs
        if e["user_id"][0] < 40 and e["user_id"][1] >= 10
        and e["value"][0] < 150.0 and e["value"][1] >= 50.0
    )
    # fewer files read than written — the point of the layout
    assert hit < n_written / 2, (hit, n_written)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(user_id,10)" in plan


def test_zorder_null_keys_and_all_null_column(spark, tmp_path):
    """ADVICE r4: zorder_column must not TypeError on an all-NULL
    z-column (it contributes no bits) and NULL values in a z-column
    must cluster at the low end instead of poisoning the interleaved
    key to NULL (which scatters those rows under repartitionByRange)."""
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.sources.registry import (
        write_zordered,
        zorder_column,
    )

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 97)
        .alias("x"),
        F.lit(None).cast("double").alias("dead"),
    )
    # all-NULL column: no crash, z-key still built from x alone
    _, z = zorder_column(df, ["x", "dead"])
    rows = df.withColumn("_z", z).select("id", "x", "_z").collect()
    assert all(r._z is not None for r in rows)  # NULL x -> 0, not NULL
    null_z = {r._z for r in rows if r.x is None}
    min_nonnull = min(r._z for r in rows if r.x is not None)
    assert null_z == {0} and min_nonnull >= 0

    # end-to-end write survives, row count preserved
    out = str(tmp_path / "z_with_nulls")
    write_zordered(df, out, ["x", "dead"], n_partitions=4)
    assert spark.read.parquet(out).count() == 1000
