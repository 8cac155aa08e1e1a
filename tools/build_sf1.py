#!/usr/bin/env python
"""Build the sf1 tier (/tmp/sf1): every table x10 from sf0.1, with
per-copy transforms chosen so EVERY query's true output scales
linearly — the full-decade full-suite bench (VERDICT r8 item 5) then
measures engine scaling, not fixture aliasing.

Per-copy construction (copy i of 10):
- lineitem/orders/customer/part/supplier: join keys shifted in
  LOCKSTEP (orderkey on both lineitem and orders, custkey on orders
  and customer, part/supp keys on lineitem and their dims), so each
  copy is an isomorphic TPC-H instance disjoint from the others —
  joins, triangles, and group counts scale exactly 10x. Dates and
  nationkeys unchanged (nation/region are fixed dimensions; date
  groups get 10x rows per group, which IS linear).
- name columns (c_name, p_name, s_name): per-copy [a-z0-9] bijection
  (scale_probe._copy_cipher) — within-copy edit-distance/fuzzy
  structure exact, cross-copy names share no variants, so blocked
  linkage pair counts stay 10x, not 100x.
- events: event_id shifted, ts shifted by a full span per copy
  (scale_probe.build_x10 logic) — per-user density constant, session
  and window cardinalities 10x.
- documents: per-copy cipher over text (scale_probe.build_docs_xn) —
  dedup/shingle structure exact within copies, disjoint across.
- embeddings: vec_id shifted AND a per-copy deterministic +-1
  SIGN-FLIP pattern applied per dimension (copy 0 = identity). A
  sign flip is orthogonal: every within-copy cosine/dot is EXACTLY
  preserved, while a cross-copy pair of formerly-identical vectors
  lands at cos = sum(s_d * v_d^2) ~ 0 — without it, 10 identical
  copies of each vector form 45-pair cross-copy cliques and the
  near-dup output grows 100x (fixture aliasing, not engine cost).

Usage: python tools/build_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import random
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from scale_probe import _ALNUM, _copy_cipher, build_docs_xn, build_x10  # noqa: E402

N_COPIES = 10


def _union(copies):
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def build_sf1(spark, src_sf: str, out_dir: str) -> None:
    import shutil

    from pyspark.sql import functions as F

    from aws_de_final_project_spark.sources.registry import load_tables

    os.makedirs(out_dir, exist_ok=True)
    t = load_tables(
        spark,
        src_sf,
        ("lineitem", "orders", "customer", "part", "supplier",
         "nation", "region", "embeddings"),
        register_views=False,
    )

    def span(df, key):
        return df.agg(F.max(key)).collect()[0][0] + 1

    n_ord = span(t["orders"], "o_orderkey")
    n_cust = span(t["customer"], "c_custkey")
    n_part = span(t["part"], "p_partkey")
    n_supp = span(t["supplier"], "s_suppkey")

    def shifted(df, shifts: dict, ciphered: tuple = (), i: int = 0):
        cols = []
        rot = _copy_cipher(i, N_COPIES)
        for c in df.columns:
            if c in shifts:
                cols.append((F.col(c) + F.lit(i * shifts[c])).alias(c))
            elif c in ciphered:
                cols.append(F.translate(c, _ALNUM, rot).alias(c))
            else:
                cols.append(F.col(c))
        return df.select(*cols)

    plans = {
        "lineitem": (
            {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp},
            (),
        ),
        "orders": ({"o_orderkey": n_ord, "o_custkey": n_cust}, ()),
        "customer": ({"c_custkey": n_cust}, ("c_name",)),
        "part": ({"p_partkey": n_part}, ("p_name",)),
        "supplier": ({"s_suppkey": n_supp}, ("s_name",)),
    }
    for name, (shifts, ciph) in plans.items():
        df = t[name]
        out = _union(
            [shifted(df, shifts, ciph, i) for i in range(N_COPIES)]
        )
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"built {name}", flush=True)

    # fixed dimensions: copy through unchanged
    for name in ("nation", "region"):
        t[name].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    # embeddings: id shift + per-copy sign-flip (orthogonal; copy 0
    # is the identity so the original corpus is a strict subset)
    em = t["embeddings"]
    dim = len(em.select("embedding").first()[0])
    n_vec = span(em, "vec_id")
    copies = []
    for i in range(N_COPIES):
        if i == 0:
            vec = F.col("embedding")
        else:
            rng = random.Random(0xE1 + i)
            signs = F.array(
                *[
                    F.lit(float(rng.choice((-1.0, 1.0))))
                    for _ in range(dim)
                ]
            )
            vec = F.zip_with(
                "embedding", signs, lambda x, s: (x * s).cast("float")
            )
        copies.append(
            em.select(
                (F.col("vec_id") + F.lit(i * n_vec)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    _union(copies).repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    print("built embeddings", flush=True)

    # events + documents reuse the probe builders (cached tiers are
    # picked up as-is), then copy into place
    from scale_probe import DOCS_X10_DIR, X10_DIR

    if not os.path.exists(os.path.join(X10_DIR, "events.parquet")):
        build_x10(spark, src_sf)
    if not os.path.exists(os.path.join(DOCS_X10_DIR, "documents.parquet")):
        build_docs_xn(spark, src_sf, 10, DOCS_X10_DIR)
    for src, name in (
        (X10_DIR, "events.parquet"),
        (DOCS_X10_DIR, "documents.parquet"),
    ):
        dst = os.path.join(out_dir, name)
        if not os.path.exists(dst):
            shutil.copytree(os.path.join(src, name), dst)
        print(f"built {name}", flush=True)


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from aws_de_final_project_spark.session import get_spark

    spark = get_spark("build-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark, "/root/testdata/sf0.1", out_dir)
    print("sf1 ready at", out_dir)
