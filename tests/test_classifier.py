"""Linear text-classifier inference (operators/classifier): Python
ground-truth replay of the hashed-feature model, empty-doc contract,
and the shuffle-free plan pin. Oracle parity for the registered entry
lives in tests/test_oracle_parity.py."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators import classifier as CLF


def _py_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % CLF.N_BUCKETS


def _py_score(text: str) -> tuple[int, float]:
    toks = [t for t in text.lower().strip().split() if t]
    if not toks:
        return 0, CLF.QUALITY_CLF_BIAS
    acc = 0.0
    for t in toks:
        acc += CLF.QUALITY_CLF_WEIGHTS[_py_bucket(t)]
    return len(toks), CLF.QUALITY_CLF_BIAS + acc / len(toks)


def test_scores_match_python_ground_truth(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "hello"),
        (2, ""),
        (3, "  spaced   out   tokens  "),
        (4, "MIXED Case TOKENS and 123 numbers !!"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in CLF.linear_text_scores(df, "text", "doc_id").collect()
    }
    for i, text in rows:
        n, logit = _py_score(text)
        r = got[i]
        assert r.n_tokens == n, (i, r.n_tokens, n)
        import math

        want = math.floor(logit * 10000.0 + 0.5) / 10000.0
        assert abs(r.logit - want) < 1e-12, (i, r.logit, want)
        assert r.keep == (1 if logit >= 0 else 0)


def test_empty_doc_scores_bias(spark):
    df = spark.createDataFrame([(0, ""), (1, "   ")], ["doc_id", "text"])
    rows = CLF.linear_text_scores(df, "text", "doc_id").collect()
    for r in rows:
        assert r.n_tokens == 0
        assert abs(r.logit - round(CLF.QUALITY_CLF_BIAS, 4)) < 1e-12


def test_bucket_range(spark):
    df = spark.createDataFrame(
        [(w,) for w in ("a", "zz", "tok3", "längère", "123")], ["tok"]
    )
    rows = df.select(
        CLF.hashed_bucket(F.col("tok")).alias("b")
    ).collect()
    for r in rows:
        assert 0 <= r.b < CLF.N_BUCKETS


def test_inference_is_shuffle_free(spark):
    """Model inference must stay a projection — the whole point of the
    hashing-trick formulation is that a 100 TB corpus scores inside
    the scan stage with no exchange."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id")).alias("text"),
    )
    plan = (
        CLF.linear_text_scores(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
