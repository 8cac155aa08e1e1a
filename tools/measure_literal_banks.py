#!/usr/bin/env python
"""VERDICT r2 #5: literal-bank cost at realistic embedding width.

The ANN/blocked-dedup operators ship their hyperplane/centroid banks
as SQL literal arrays (operators/similarity.py:_lit_array_sql) — one
parsed string, zero py4j round trips. The bank is O(tables x planes x
dim) text; the repo's fixtures are dim 64, real embedding models are
768-4096. This script generates a dim-768 corpus and splits each
operator's wall time into:

  build    — python call until the DataFrame object exists
             (py4j traffic + string concat)
  analyze  — .schema access (Catalyst parse + analysis of the bank)
  execute  — full-width checksum action

Usage: python tools/measure_literal_banks.py [dim] [rows]
Prints one JSON line per operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_fixture(path: str, rows: int, dim: int) -> None:
    rng = np.random.default_rng(7)
    base = rng.standard_normal((rows, dim)).astype(np.float32)
    # plant near-duplicates so the blocked-dedup path has real work
    base[1::50] = base[::50][: len(base[1::50])] + 0.01 * rng.standard_normal(
        (len(base[1::50]), dim)
    ).astype(np.float32)
    tab = pa.table(
        {
            "vec_id": pa.array(range(rows), pa.int64()),
            "embedding": pa.array(list(base), pa.list_(pa.float32())),
            "label": pa.array([i % 7 for i in range(rows)], pa.int32()),
        }
    )
    pq.write_table(tab, path)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators import similarity as S
    from aws_de_final_project_spark.session import get_spark

    spark = get_spark()
    spark.range(10).count()

    fix = f"/tmp/lit_bank_dim{dim}_{rows}.parquet"
    if not os.path.exists(fix):
        make_fixture(fix, rows, dim)
    corpus = spark.read.parquet(fix)
    queries = corpus.limit(16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def drive(df):
        df.agg(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()

    cases = {
        "ann_lsh_12x4": lambda: S.lsh_ann_topk(
            corpus, queries, dim=dim, k=10, n_planes=12, n_tables=4
        ),
        "blocked_dedup_8tx6b": lambda: S.cosine_dup_pairs(
            corpus,
            threshold=0.9,
            block_planes=6,
            dim=dim,
            n_tables=8,
        ),
        "ann_lsh_12x4_arrow": lambda: S.lsh_ann_topk(
            corpus,
            queries,
            dim=dim,
            k=10,
            n_planes=12,
            n_tables=4,
            sig_impl="arrow",
        ),
        "blocked_dedup_8tx6b_arrow": lambda: S.cosine_dup_pairs(
            corpus,
            threshold=0.9,
            block_planes=6,
            dim=dim,
            n_tables=8,
            sig_impl="arrow",
        ),
    }
    for name, mk in cases.items():
        try:
            df, t_build = timed(mk)
            if df is None:
                continue
            _, t_analyze = timed(lambda: df.schema)
            _, t_exec = timed(lambda: drive(df))
            print(
                json.dumps(
                    {
                        "case": name,
                        "dim": dim,
                        "rows": rows,
                        "build_s": round(t_build, 3),
                        "analyze_s": round(t_analyze, 3),
                        "exec_s": round(t_exec, 3),
                    }
                )
            )
        except Exception as e:  # keep measuring the rest
            print(json.dumps({"case": name, "err": str(e)[:200]}))


if __name__ == "__main__":
    main()
