#!/usr/bin/env python
"""Time individual queries with bench.py's exact methodology (cold +
median-of-3 warm, System.gc() between, full-width drive action).

Usage: python tools/time_queries.py name [name ...]
Prints one line per query: name cold warm [reps].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_de_final_project_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bench import drive  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        drive(fn(spark, sf_dir))
        cold = time.perf_counter() - t0
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            drive(fn(spark, sf_dir))
            reps.append(time.perf_counter() - t0)
        warm = sorted(reps)[1]
        print(
            f"{name:45s} cold={cold:6.3f} warm={warm:6.3f} "
            f"reps={[round(r, 3) for r in reps]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
