"""Physical-plan shape guardrails — the 100 TB posture, asserted.

Correct results are necessary but not sufficient: these tests pin the
plan properties that make each operator survive a 1000-executor
cluster — filters reaching the parquet scan, small dimensions
broadcast instead of shuffled, top-k avoiding global sorts, and column
pruning keeping scans narrow. A regression here is a performance bug
even when every value still matches the oracle.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    """name -> executed-plan string (AQE final plans where relevant)."""
    q = entrymod.queries()

    def plan_of(name: str) -> str:
        df = q[name](spark, SF_DIR)
        # trigger execution so AdaptiveSparkPlan reports final plans
        df.count()
        return df._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_filter_pushdown_to_scan(plans):
    """The 5-way disjunction must reach the parquet reader as a
    PushedFilters entry — at 100 TB this is the difference between
    reading row groups and skipping them."""
    p = plans("filter_disjunctive")
    assert "PushedFilters: [" in p
    assert "Or(" in p.split("PushedFilters:")[1][:400]


def test_column_pruning_on_wide_agg(plans):
    """q1 reads 6 of lineitem's 11 columns; the scan schema must show
    only what the aggregate needs."""
    p = plans("q1_pricing_summary")
    scan = p[p.index("FileScan") :]
    read_schema = scan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in read_schema and "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema and "l_shipdate" not in read_schema


def test_dim_joins_are_broadcast(plans):
    """customer->nation->region enrichment must broadcast the dims:
    no shuffle of the fact side for either join."""
    p = plans("dim_join_rollup")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_flagship_broadcasts_dims(plans):
    p = plans("return_pct_by_nation")
    assert p.count("BroadcastHashJoin") >= 2


def test_topk_avoids_global_sort(plans):
    """ORDER BY ... LIMIT 15 must plan TakeOrderedAndProject (per-
    partition top-k + driver merge), never a full Exchange+Sort."""
    p = plans("topk_customers")
    assert "TakeOrderedAndProject" in p


def test_minhash_has_no_cartesian(plans):
    """The LSH pipeline must never degenerate to a cross product."""
    p = plans("dedup_minhash_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ann_lsh_is_equijoin(plans):
    p = plans("ann_lsh_topk")
    assert "CartesianProduct" not in p


def test_partial_aggregation_before_exchange(plans):
    """q1's aggregate must be partial (map-side) then final — shuffle
    rows are per-group partials, not raw lineitems."""
    p = plans("q1_pricing_summary")
    first_agg = p.index("HashAggregate")
    assert "partial_sum" in p or "Partial" in p[first_agg:]
