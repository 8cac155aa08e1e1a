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

Two interchangeable execution paths, auto-dispatched on model width
(the ``_resolve_impl`` pattern shared with operators/similarity):

``impl='sql'`` (oracle-fixture widths, D < 256)
    Spark evaluates the model entirely inside whole-stage codegen
    with array higher-order functions (``transform`` + ``aggregate``
    over the token array): NO explode, NO join, NO shuffle. The
    weight vector rides into the plan as a literal array, and the
    md5-based bucket hash makes scores engine-independent, so the
    DuckDB oracle replays the identical model bit-for-bit.

``impl='arrow'`` (deployment widths, D >= 256)
    The literal bank is a plan-build pathology at real model sizes
    (D ~ 2^16-2^21: megabytes of SQL text parsed on the driver). The
    Arrow path ships the weight vector to executors as a task-closure
    numpy array instead and scores each Arrow batch in vectorized
    numpy (same recipe as similarity.signature_table_arrow): hash
    each DISTINCT token once per batch, gather weights, left-fold per
    document so the float summation order matches the SQL aggregate
    exactly. Plan size is O(1) in D.

Weights default to a deterministic vendored stand-in for an
offline-trained model (seeded, fixed literals); the operator contract
is inference, not training — but :func:`train_logistic_weights`
provides the offline step (plain numpy logistic regression over the
same hashed features) so discrimination is testable end-to-end with
planted-label corpora.

Reference parity: the reference (zcauchon/AWS_DE_Final_Project) has
no ML-filter stage — this is part of the brief's
training-data-pipeline extension surface, same family as
functions/text.py quality scores.
"""

from __future__ import annotations

import hashlib
import math
import random
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import round_half_up as rnd
from aws_de_final_project_spark.operators.similarity import (
    ARROW_AUTO_DIM,
    _resolve_impl,
)

# Explicit whitespace class (same dialect discipline as
# webcrawl.WS_RE / text._SENT_WS_RE): Java \s == this class, but RE2
# (the DuckDB oracle) excludes \x0B from \s — so both engines split
# on the INTERPOLATED class, never the shorthand.
WS_RE = r"[ \t\n\x0B\f\r]+"

#: Hashed-feature dimensionality of the vendored stand-in model.
#: Small so the literal bank stays readable in the oracle SQL; the
#: arrow path exercises the same math at 2^16+.
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


def _py_bucket(tok: str, n_buckets: int) -> int:
    """Python twin of :func:`hashed_bucket` (same md5-prefix math),
    used by the arrow path and by offline training so all three
    consumers hash identically."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def _py_tokens(text: str, _split=re.compile(WS_RE).split) -> list[str]:
    """Python twin of the Spark-side tokenization: lowercase, split on
    the explicit WS class, drop empties. (Spark trims then splits;
    trimming only ever removes tokens that the empty-filter drops, so
    skipping it here cannot change the token list.)"""
    return [t for t in _split(text.lower()) if t]


def linear_text_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...] = QUALITY_CLF_WEIGHTS,
    bias: float = QUALITY_CLF_BIAS,
    impl: str = "auto",
    pool: str = "mean",
) -> DataFrame:
    """Score every row with the linear model; returns
    (id_col, n_tokens, logit, keep).

    ``impl='sql'``: one projection, zero shuffles — the token array is
    built, hashed, gathered against the literal weight array, and
    pooled with array higher-order functions inside the scan
    stage. ``impl='arrow'``: same math per Arrow batch with the
    weights as a closure numpy array (mandatory at deployment D — the
    literal bank's plan-build cost is linear in D). ``'auto'`` picks
    arrow at D >= ARROW_AUTO_DIM. ``keep`` is the sigmoid>=0.5
    decision, expressed as logit>=0 so the oracle never has to replay
    floating-point exp().

    ``pool``: ``'mean'`` (fastText-style classification — length-
    normalized) or ``'sum'`` (log-likelihood-ratio accumulation, the
    DSIR importance contract — see operators/dsir.py).

    Empty documents (0 tokens) score the bare bias — the conventional
    "no evidence" prediction.
    """
    if pool not in ("mean", "sum"):
        raise ValueError(f"pool must be 'mean' or 'sum', got {pool!r}")
    impl = _resolve_impl(impl, len(weights), "impl")
    if impl == "arrow":
        return _scores_arrow(df, text_col, id_col, weights, bias, pool)
    return _scores_sql(df, text_col, id_col, weights, bias, pool)


def _scores_sql(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...],
    bias: float,
    pool: str = "mean",
) -> DataFrame:
    n = len(weights)
    w_arr = F.array(*[F.lit(float(w)) for w in weights])
    tks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), WS_RE),
        lambda t: F.length(t) > 0,
    )
    # per-token weight gather: element_at is 1-based
    per_tok = F.transform(
        tks, lambda t: F.element_at(w_arr, (hashed_bucket(t, n) + 1).cast("int"))
    )
    n_tokens = F.size(tks)
    wsum = F.aggregate(
        per_tok, F.lit(0.0), lambda acc, x: acc + x
    )
    pooled = (
        wsum if pool == "sum" else wsum / n_tokens.cast("double")
    )
    logit = F.when(n_tokens == 0, F.lit(float(bias))).otherwise(
        F.lit(float(bias)) + pooled
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


def _scores_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...],
    bias: float,
    pool: str = "mean",
) -> DataFrame:
    """Deployment-width scorer: weights ride the task closure as ONE
    numpy float64 array (D=2^21 is 16 MB — broadcast-sized, never SQL
    text), tokens of each batch are hashed once per distinct string,
    and each document's gathered weights are summed with an explicit
    left fold so the result is bit-identical to the SQL aggregate's
    left-to-right accumulation (numpy's pairwise sum is NOT).

    NULL text scores (NULL, NULL, NULL) exactly like the SQL path
    (where lower/split propagate the NULL through every derived
    column) — emitted via pandas nullable dtypes so Arrow ships real
    NULLs, not sentinel zeros; pinned by a NULL row in
    tests/test_classifier.py::test_arrow_matches_sql_exactly."""
    import numpy as np

    w = np.ascontiguousarray(weights, dtype=np.float64)
    n = int(w.shape[0])
    b = float(bias)
    id_type = df.schema[id_col].dataType.simpleString()

    def score(batches):
        import pandas as pd

        split = re.compile(WS_RE).split
        bucket_cache: dict[str, int] = {}

        def bucket(tok: str) -> int:
            v = bucket_cache.get(tok)
            if v is None:
                v = (
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    % n
                )
                bucket_cache[tok] = v
            return v

        for pdf in batches:
            if not len(pdf):
                continue
            n_toks: list[int | None] = []
            logits: list[float | None] = []
            keeps: list[int | None] = []
            for text in pdf[text_col].astype(object):
                if not isinstance(text, str):
                    # NULL text -> NULL outputs, same as the SQL path
                    n_toks.append(None)
                    logits.append(None)
                    keeps.append(None)
                    continue
                toks = [t for t in split(text.lower()) if t]
                if not toks:
                    lg = b
                else:
                    acc = 0.0
                    for t in toks:  # left fold == SQL aggregate order
                        acc += float(w[bucket(t)])
                    lg = b + (
                        acc if pool == "sum" else acc / float(len(toks))
                    )
                n_toks.append(len(toks))
                logits.append(math.floor(lg * 10000.0 + 0.5) / 10000.0)
                keeps.append(1 if lg >= 0 else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_tokens": pd.array(n_toks, dtype="Int64"),
                    "logit": pd.array(logits, dtype="Float64"),
                    "keep": pd.array(keeps, dtype="Int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        score,
        f"{id_col} {id_type}, n_tokens long, logit double, keep int",
    )


def train_logistic_weights(
    texts: list[str],
    labels: list[int],
    n_buckets: int = N_BUCKETS,
    epochs: int = 200,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> tuple[tuple[float, ...], float]:
    """Offline training step: full-batch logistic regression over the
    SAME hashed mean-pooled features the scorer evaluates, in plain
    numpy on the driver. Training sets are small by design (CCNet
    trains on ~thousands of labeled pages) — the 100 TB side is
    inference only, which is why this never touches Spark.

    Returns (weights, bias) with weights rounded to 4 decimals so the
    trained model obeys the same literal-roundtrip discipline as the
    vendored stand-in (both engines parse identical decimals).
    """
    import numpy as np

    if len(texts) != len(labels):
        raise ValueError("texts and labels must be the same length")
    X = np.zeros((len(texts), n_buckets), dtype=np.float64)
    for i, text in enumerate(texts):
        toks = _py_tokens(text)
        if not toks:
            continue
        for t in toks:
            X[i, _py_bucket(t, n_buckets)] += 1.0
        X[i] /= float(len(toks))
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * float(g.mean())
    return tuple(round(float(x), 4) for x in w), round(float(b), 4)
