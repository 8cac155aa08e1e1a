#!/usr/bin/env python
"""Profile one query: run it warm with the Spark UI enabled, then dump
per-job wall-clock and the heaviest stages from the UI REST API —
empirical stage attribution per the optimization guide §1/§7.

Usage: python tools/profile_query.py <query> [n_warm]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_de_final_project_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bench import drive  # noqa: E402


def _get(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}") as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn = entrymod.queries()[name]
    # cold run (not attributed)
    spark.sparkContext.setJobDescription(f"{name}: cold")
    t0 = time.perf_counter()
    drive(fn(spark, sf_dir))
    cold = time.perf_counter() - t0
    jobs_before = {j["jobId"] for j in _get("/applications")[0:0] or []}
    app_id = _get("/applications")[0]["id"]
    jobs_before = {j["jobId"] for j in _get(f"/applications/{app_id}/jobs")}
    spark.sparkContext._jvm.System.gc()
    spark.sparkContext.setJobDescription(f"{name}: warm")
    warms = []
    for _ in range(n_warm):
        t0 = time.perf_counter()
        drive(fn(spark, sf_dir))
        warms.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: cold={cold:.3f} warm={warms}")
    jobs = [
        j
        for j in _get(f"/applications/{app_id}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {
        s["stageId"]: s
        for s in _get(f"/applications/{app_id}/stages?status=complete")
    }

    def ms(t):
        return time.mktime(
            time.strptime(t[:19], "%Y-%m-%dT%H:%M:%S")
        ) + float(t[19:23] or 0)

    print(f"\n--- jobs ({len(jobs)}) across {n_warm} warm run(s) ---")
    for j in jobs:
        dur = ms(j["completionTime"]) - ms(j["submissionTime"])
        sids = j["stageIds"]
        print(
            f"job {j['jobId']:4d} {dur:7.3f}s stages={len(sids):2d} "
            f"tasks={j['numTasks']:4d} {j.get('description', '')[:60]}"
        )
        for sid in sorted(sids):
            s = stages.get(sid)
            if not s or s["status"] != "COMPLETE":
                continue
            sd = ms(s["completionTime"]) - ms(s["firstTaskLaunchedTime"])
            if sd < 0.05:
                continue
            nm = s["name"].split("\n")[0][:70]
            print(
                f"   stage {sid:4d} wall={sd:6.3f}s run="
                f"{s['executorRunTime'] / 1000:7.2f}s "
                f"tasks={s['numTasks']:3d} in={s['inputBytes'] >> 20}MB "
                f"sr={s['shuffleReadBytes'] >> 20}MB "
                f"sw={s['shuffleWriteBytes'] >> 20}MB {nm}"
            )


if __name__ == "__main__":
    main()
