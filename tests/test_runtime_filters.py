"""Runtime bloom-filter semi-join reduction — the 100 TB scan-skip
lever beyond static pushdown: a selective filter on the dim side of a
SHUFFLE join materializes a bloom filter over the join keys and the
fact side probes it (might_contain) inside its own scan stage, skipping
rows/row-groups that cannot join. Static PushedFilters can't do this —
the predicate is on the OTHER table.

Local data is far below the default applicationSideScanSizeThreshold
(10 GB), so the test lowers the thresholds to force what a 100 TB scan
triggers naturally; session.py only pins the feature flag on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def test_bloom_filter_reduces_shuffle_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        # the probe must sit on the FACT side, upstream of the join
        probe_idx = plan.index("might_contain")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # and partial aggregation builds the filter without a collect
        assert "partial_bloom_filter_agg" in plan
        assert probe_idx > -1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
