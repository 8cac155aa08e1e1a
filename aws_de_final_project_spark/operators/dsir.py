"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"
— public arXiv:2302.03169): score every raw document by how much more
likely a hashed bag-of-words model of the TARGET corpus makes it than
a model of the RAW corpus, then keep the top slice. The standard
"make the crawl look like the seed" selection stage of LLM data
recipes.

Model: bucket(tok) = md5_60(tok) mod D (the same engine-portable
hashing-trick family as operators/classifier.py), per-bucket Laplace-
smoothed unigram log-probabilities on each corpus, and

    importance(doc) = sum_tok [ ln p_target(b(tok)) - ln p_raw(b(tok)) ]

Shape at 100 TB (all three stages shuffle-bounded):
1. Two bucket-count aggregates — the corpus collapses map-side to at
   most D partial rows per task (D ~ 2^16 deployed, 64 in the oracle
   fixture), so each shuffle is O(D x tasks), not corpus-sized.
2. The weight table is D rows — broadcast.
3. Scoring joins exploded tokens against the broadcast weights and
   re-aggregates per doc. That last keyed shuffle is (doc_id, partial
   sum) pairs — narrow. The SHUFFLE-FREE deployment alternative:
   round the trained weights once offline and score with
   classifier.linear_text_scores(weights=..., pool='sum') — same
   gather, zero shuffles, the same duality the classifier documents.

ln() portability: both engines call the platform libm log on IEEE
doubles and the score is floor-rounded at 4dp, so the DuckDB oracle
replays the identical arithmetic (the md5 buckets and integer counts
are exact by construction).

Reference parity: no ML-selection stage exists in the reference
(zcauchon/AWS_DE_Final_Project) — north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import round_half_up as rnd
from aws_de_final_project_spark.operators.classifier import (
    WS_RE,
    hashed_bucket,
)

N_BUCKETS = 64


def _doc_buckets(df: DataFrame, text_col: str, id_col: str, n: int):
    """(id, bucket) one row per token — tokenization identical to the
    classifier's (lowercase, explicit WS class, empties dropped)."""
    tks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), WS_RE),
        lambda t: F.length(t) > 0,
    )
    return df.select(
        F.col(id_col), F.explode(tks).alias("_tok")
    ).select(
        id_col, hashed_bucket(F.col("_tok"), n).alias("_bucket")
    )


def _bucket_counts(toks: DataFrame, n: int):
    """Per-bucket token counts over a full bucket spine (so smoothing
    sees every bucket, observed or not)."""
    spark = toks.sparkSession
    spine = spark.range(n).select(F.col("id").alias("_bucket"))
    got = toks.groupBy("_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    return spine.join(got, "_bucket", "left").select(
        "_bucket", F.coalesce("_cnt", F.lit(0).cast("long")).alias("_cnt")
    )


def dsir_importance(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Importance score for every RAW document (id, n_tokens, score):
    sum over tokens of the smoothed per-bucket target/raw log-ratio.
    Laplace alpha = 1: w_b = ln((t_b + 1)/(T + D)) - ln((r_b + 1)/
    (R + D)). Empty documents score 0 (no evidence). Per-bucket
    weights are rounded to 4dp BEFORE the per-doc sum (the same
    discipline dsir_train_weights applies to the deployment bank):
    F.sum accumulates in shuffle order, so summing unrounded doubles
    could land within an ulp of a 1e-4 floor boundary and flip the
    rounded score between runs/engines; a sum of 4dp-quantized
    addends is (up to ulps) a MULTIPLE of 1e-4 — half a quantum away
    from the floor(x*1e4+0.5) decision boundary — so ulp-scale
    accumulation-order error can never flip the rounded result. The
    final score is also floor-rounded 4dp for engine-stable
    hashing."""
    tt = _doc_buckets(target, text_col, id_col, n_buckets)
    rt = _doc_buckets(raw, text_col, id_col, n_buckets)
    tc = _bucket_counts(tt, n_buckets).withColumnRenamed("_cnt", "_t")
    rc = _bucket_counts(rt, n_buckets).withColumnRenamed("_cnt", "_r")
    # totals ride the weight frame relationally (no driver constant
    # besides D): cross-join the two 1-row total frames
    t_tot = tc.agg(F.sum("_t").alias("_tsum"))
    r_tot = rc.agg(F.sum("_r").alias("_rsum"))
    d = float(n_buckets)
    w = (
        tc.join(rc, "_bucket")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "_bucket",
            rnd(
                F.log(
                    (F.col("_t") + 1).cast("double")
                    / (F.col("_tsum") + d).cast("double")
                )
                - F.log(
                    (F.col("_r") + 1).cast("double")
                    / (F.col("_rsum") + d).cast("double")
                ),
                4,
            ).alias("_w"),
        )
    )
    scored = (
        rt.join(F.broadcast(w), "_bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_w").alias("_score"),
        )
    )
    # docs with zero tokens drop out of the explode — restore them
    # with the no-evidence score
    base = raw.select(id_col)
    return (
        base.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            rnd(
                F.coalesce("_score", F.lit(0.0)), 4
            ).alias("importance"),
        )
    )


def dsir_train_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    n_buckets: int = N_BUCKETS,
) -> tuple[float, ...]:
    """Offline step for the SHUFFLE-FREE deployment path: the same
    smoothed log-ratio per bucket, collected (D rows) and rounded to
    4 decimals — plug into classifier.linear_text_scores(weights=...,
    bias=0.0, pool='sum') to score a 100 TB corpus inside the scan
    with zero shuffles."""
    import math

    t_ids = target.select(text_col).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    r_ids = raw.select(text_col).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    tt = _doc_buckets(t_ids, text_col, "_rid", n_buckets)
    rt = _doc_buckets(r_ids, text_col, "_rid", n_buckets)
    tc = {r._bucket: r._cnt for r in _bucket_counts(tt, n_buckets).collect()}
    rc = {r._bucket: r._cnt for r in _bucket_counts(rt, n_buckets).collect()}
    T, R, D = sum(tc.values()), sum(rc.values()), n_buckets
    return tuple(
        round(
            math.log((tc[b] + 1) / (T + D)) - math.log((rc[b] + 1) / (R + D)),
            4,
        )
        for b in range(n_buckets)
    )
