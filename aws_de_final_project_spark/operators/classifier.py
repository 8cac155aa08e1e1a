"""Linear text-classifier inference as a scan-side projection.

The model-based quality filter is the step every modern corpus
pipeline runs at full-corpus scale (a fastText-style linear
classifier over hashed bag-of-words features: CCNet's wiki-vs-crawl
filter, the "quality classifier" stages of GPT-3/LLaMA-style data
recipes). Training happens offline on a small labeled set; INFERENCE
is the 100 TB problem — and for a linear model over hashed features
it collapses to a pure per-row expression:

    bucket(tok) = md5(tok) mod D            (the hashing trick)
    logit       = bias + mean_tok w[bucket(tok)]
    prob        = sigmoid(logit)

which Spark evaluates entirely inside whole-stage codegen with array
higher-order functions (``transform`` + ``aggregate`` over the token
array): NO explode, NO join, NO shuffle — a 100 TB corpus is scored
in one scan at IO speed, embarrassingly parallel across executors.
The weight vector rides into the plan as a literal array (for real
models, D ~ 2^18 still broadcasts in KBs).

The md5-based bucket hash makes scores engine-independent, so the
DuckDB oracle replays the identical model bit-for-bit
(``list_transform``/``list_sum`` over the same literal weights).

Weights here are a deterministic vendored stand-in for an
offline-trained model (seeded, fixed literals); the operator contract
is inference, not training.

Reference parity: the reference (zcauchon/AWS_DE_Final_Project) has
no ML-filter stage — this is part of the brief's
training-data-pipeline extension surface, same family as
functions/text.py quality scores.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import round_half_up as rnd
from aws_de_final_project_spark.functions.text import tokens

#: Hashed-feature dimensionality. Small so the literal bank stays
#: readable in the oracle SQL; the plan shape is identical at 2^18.
N_BUCKETS = 64

#: Vendored stand-in weights: seeded uniform in [-0.5, 0.5], rounded
#: to 4 decimals so both engines parse the identical decimal literal
#: to the identical double.
_rng = random.Random(0x5EED)
QUALITY_CLF_WEIGHTS: tuple[float, ...] = tuple(
    round(_rng.uniform(-0.5, 0.5), 4) for _ in range(N_BUCKETS)
)
QUALITY_CLF_BIAS: float = 0.1234
del _rng


def hashed_bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hashing-trick feature bucket: first 60 bits of md5(token) mod
    n_buckets. 15 hex chars < 2^60 always fits (and stays
    non-negative in) a BIGINT, on both engines."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )


def linear_text_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...] = QUALITY_CLF_WEIGHTS,
    bias: float = QUALITY_CLF_BIAS,
) -> DataFrame:
    """Score every row with the linear model; returns
    (id_col, n_tokens, logit, keep).

    One projection, zero shuffles: the token array is built, hashed,
    gathered against the literal weight array, and mean-pooled with
    array higher-order functions inside the scan stage. ``keep`` is
    the sigmoid>=0.5 decision, expressed as logit>=0 so the oracle
    never has to replay floating-point exp().

    Empty documents (0 tokens) score the bare bias — the conventional
    "no evidence" prediction.
    """
    n = len(weights)
    w_arr = F.array(*[F.lit(float(w)) for w in weights])
    tks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda t: F.length(t) > 0
    )
    # per-token weight gather: element_at is 1-based
    per_tok = F.transform(
        tks, lambda t: F.element_at(w_arr, (hashed_bucket(t, n) + 1).cast("int"))
    )
    n_tokens = F.size(tks)
    wsum = F.aggregate(
        per_tok, F.lit(0.0), lambda acc, x: acc + x
    )
    logit = F.when(n_tokens == 0, F.lit(float(bias))).otherwise(
        F.lit(float(bias)) + wsum / n_tokens.cast("double")
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        logit.alias("_logit"),
    ).select(
        id_col,
        "n_tokens",
        rnd(F.col("_logit"), 4).alias("logit"),
        (F.col("_logit") >= 0).cast("int").alias("keep"),
    )
