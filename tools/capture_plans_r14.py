#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r14/.

Usage: python tools/capture_plans_r14.py <suffix> [--final] [query ...]
  suffix: e.g. "before" / "after" -> plans/r14/<query>_<suffix>.txt
  --final: EXECUTE the query first (df.collect()) and dump the plan of
           the same QueryExecution afterwards, so AdaptiveSparkPlan
           prints isFinalPlan=true with ReusedExchange / AQEShuffleRead
           nodes visible (r13 VERDICT item 5: the pre-execution plans
           could not evidence runtime exchange reuse).
  no query args = the full headline list from bench.py.

Without --final nothing is executed (safe alongside other work).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_de_final_project_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    suffix = args.pop(0)
    final = False
    if args and args[0] == "--final":
        final = True
        args.pop(0)
    names = args
    if not names:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            if final:
                # execute THIS DataFrame's own QueryExecution (collect,
                # not a derived agg) so the adaptive plan finalizes and
                # the explain below shows the runtime plan
                df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record, keep going
            plan = f"ERROR capturing plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
