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


def test_vertical_tab_tokenizes_identically(spark):
    """The \\x0B dialect edge: Java \\s includes vertical tab, RE2's
    does not — both sides now split on the interpolated explicit
    class, so a doc containing U+000B must tokenize the same in the
    Spark plan, the arrow path, and the Python twin."""
    text = "alpha\x0bbeta gamma"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    sql_row = CLF.linear_text_scores(
        df, "text", "doc_id", impl="sql"
    ).collect()[0]
    arrow_row = CLF.linear_text_scores(
        df, "text", "doc_id", impl="arrow"
    ).collect()[0]
    assert sql_row.n_tokens == 3 == arrow_row.n_tokens
    assert sql_row.logit == arrow_row.logit
    assert CLF._py_tokens(text) == ["alpha", "beta", "gamma"]


def test_arrow_matches_sql_exactly(spark):
    """arrow == literal-bank agreement at D=64: identical n_tokens,
    bit-identical rounded logit (the arrow path left-folds in token
    order for exactly this reason), identical keep."""
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "hello"),
        (2, ""),
        (3, "  spaced   out \t tokens \x0b mixed "),
        (4, "MIXED Case TOKENS and 123 numbers !!"),
        (5, "unicode tökens français 日本語 emoji ✨"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # NULL text stays IN: the SQL path propagates NULL through
    # lower/split into NULL n_tokens/logit/keep, and the arrow path
    # must emit the same NULLs (pandas nullable dtypes), not score
    # the bare bias — the silent-keep-flip the r9 advice flagged.
    a = {
        r.doc_id: r
        for r in CLF.linear_text_scores(df, "text", "doc_id", impl="sql").collect()
    }
    b = {
        r.doc_id: r
        for r in CLF.linear_text_scores(df, "text", "doc_id", impl="arrow").collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].n_tokens == b[k].n_tokens, (k, a[k], b[k])
        assert a[k].logit == b[k].logit, (k, a[k], b[k])
        assert a[k].keep == b[k].keep, (k, a[k], b[k])
    # and the NULL row really is NULL on both paths
    assert a[6].n_tokens is None and a[6].logit is None and a[6].keep is None
    assert b[6].n_tokens is None and b[6].logit is None and b[6].keep is None


def test_auto_dispatch_picks_arrow_at_deployment_width(spark):
    from aws_de_final_project_spark.operators.similarity import ARROW_AUTO_DIM

    df = spark.createDataFrame([(0, "hi")], ["doc_id", "text"])
    wide = tuple(0.0 for _ in range(ARROW_AUTO_DIM))
    plan = (
        CLF.linear_text_scores(df, "text", "doc_id", weights=wide)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan, plan
    narrow_plan = (
        CLF.linear_text_scores(df, "text", "doc_id")  # D=64 default
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in narrow_plan, narrow_plan


def test_deployment_width_plan_build_is_flat(spark):
    """D=2^16 probe: the arrow plan must not embed the weight bank —
    plan construction stays O(1) in D (the literal bank at this width
    is megabytes of SQL text), and scores still match the Python
    ground truth."""
    import random as _random
    import time

    rng = _random.Random(7)
    D = 1 << 16
    w = tuple(round(rng.uniform(-0.5, 0.5), 4) for _ in range(D))
    df = spark.createDataFrame(
        [(i, f"tok{i} shared word{i % 3}") for i in range(8)],
        ["doc_id", "text"],
    )
    t0 = time.monotonic()
    scored = CLF.linear_text_scores(df, "text", "doc_id", weights=w, bias=0.01)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    build_s = time.monotonic() - t0
    assert build_s < 5.0, f"plan build took {build_s:.1f}s at D=2^16"
    assert len(plan) < 20_000, f"plan text {len(plan)} chars — bank leaked?"
    got = {r.doc_id: r for r in scored.collect()}
    for i in range(8):
        toks = CLF._py_tokens(f"tok{i} shared word{i % 3}")
        acc = 0.0
        for t in toks:
            acc += w[CLF._py_bucket(t, D)]
        lg = 0.01 + acc / len(toks)
        import math

        want = math.floor(lg * 10000.0 + 0.5) / 10000.0
        assert got[i].n_tokens == len(toks)
        assert abs(got[i].logit - want) < 1e-12, (i, got[i].logit, want)


def test_trained_weights_discriminate(spark):
    """Planted-label discrimination: train on trivially-separable
    corpora (disjoint vocabularies), then BOTH impls must keep every
    good doc and drop every bad doc — a random stand-in cannot catch
    a sign flip; a trained model does."""
    import random as _random

    rng = _random.Random(42)
    good_vocab = [f"good{i}" for i in range(40)]
    bad_vocab = [f"bad{i}" for i in range(40)]
    texts, labels = [], []
    for _ in range(60):
        texts.append(" ".join(rng.choices(good_vocab, k=rng.randint(5, 20))))
        labels.append(1)
        texts.append(" ".join(rng.choices(bad_vocab, k=rng.randint(5, 20))))
        labels.append(0)
    w, b = CLF.train_logistic_weights(texts, labels, n_buckets=CLF.N_BUCKETS)

    # held-out docs from the same vocabularies
    held = [
        (i, " ".join(rng.choices(good_vocab if i % 2 == 0 else bad_vocab, k=12)))
        for i in range(20)
    ]
    df = spark.createDataFrame(held, ["doc_id", "text"])
    for impl in ("sql", "arrow"):
        got = {
            r.doc_id: r.keep
            for r in CLF.linear_text_scores(
                df, "text", "doc_id", weights=w, bias=b, impl=impl
            ).collect()
        }
        for i, _ in held:
            want = 1 if i % 2 == 0 else 0
            assert got[i] == want, (impl, i, got[i])


def test_dsir_importance_matches_python_reference(spark):
    """DSIR importance equals a pure-Python replay: md5 buckets,
    Laplace-smoothed per-bucket log-ratios between target and raw,
    per-doc sum — and target-vocabulary docs must outscore
    raw-vocabulary docs (the selection signal, not just the math)."""
    import hashlib
    import math

    from aws_de_final_project_spark.operators import dsir

    target_texts = ["alpha beta gamma delta", "alpha beta epsilon",
                    "gamma delta alpha"]
    raw_texts = [
        (0, "alpha beta gamma"),          # target-like
        (1, "zeta eta theta iota"),       # raw-like
        (2, "alpha zeta"),                # mixed
        (3, ""),                          # empty -> 0
        (4, "zeta eta zeta eta"),
    ]
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(target_texts)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(raw_texts, ["doc_id", "text"])

    D = 64

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % D

    def toks(t):
        return [x for x in t.lower().strip().split() if x]

    tcnt, rcnt = [0] * D, [0] * D
    for t in target_texts:
        for tok in toks(t):
            tcnt[bucket(tok)] += 1
    for _, t in raw_texts:
        for tok in toks(t):
            rcnt[bucket(tok)] += 1
    T, R = sum(tcnt), sum(rcnt)
    w = [
        math.log((tcnt[b] + 1) / (T + D)) - math.log((rcnt[b] + 1) / (R + D))
        for b in range(D)
    ]

    # dsir_importance floor-rounds each per-bucket weight to 4dp
    # BEFORE the per-doc sum (determinism vs F.sum accumulation
    # order) — replay the same quantization here
    w4 = [math.floor(x * 10000.0 + 0.5) / 10000.0 for x in w]

    got = {
        r.doc_id: r
        for r in dsir.dsir_importance(tgt, raw, "text", "doc_id").collect()
    }
    for i, t in raw_texts:
        tk = toks(t)
        want = math.floor(sum(w4[bucket(x)] for x in tk) * 10000.0 + 0.5) / 10000.0
        assert got[i].n_tokens == len(tk)
        assert abs(got[i].importance - want) < 1e-9, (i, got[i], want)
    # the selection signal: target-like beats raw-like
    assert got[0].importance > got[2].importance > got[1].importance
    assert got[3].importance == 0.0

    # deployment path: offline-trained weights + classifier sum-pool
    # gather produce the SAME importance (zero-shuffle scoring twin)
    from aws_de_final_project_spark.operators.classifier import (
        linear_text_scores,
    )

    wts = dsir.dsir_train_weights(tgt, raw, "text")
    assert all(abs(a - round(b, 4)) < 1e-12 for a, b in zip(wts, w))
    scored = {
        r.doc_id: r.logit
        for r in linear_text_scores(
            raw, "text", "doc_id", weights=wts, bias=0.0, pool="sum",
            impl="sql",
        ).collect()
    }
    for i, t in raw_texts:
        tk = toks(t)
        want = math.floor(
            sum(round(w[bucket(x)], 4) for x in tk) * 10000.0 + 0.5
        ) / 10000.0
        assert abs(scored[i] - want) < 1e-9, (i, scored[i], want)


def test_classifier_pool_sum_vs_mean(spark):
    from aws_de_final_project_spark.operators.classifier import (
        QUALITY_CLF_WEIGHTS,
        linear_text_scores,
    )

    df = spark.createDataFrame(
        [(0, "one two three four")], ["doc_id", "text"]
    )
    mean_row = linear_text_scores(df, "text", "doc_id", pool="mean").collect()[0]
    sum_row = linear_text_scores(df, "text", "doc_id", pool="sum").collect()[0]
    # sum = bias + 4 * (mean - bias), up to the 4dp rounding
    import math
    b = 0.1234
    want = math.floor((b + (mean_row.logit - b) * 4) * 10000.0 + 0.5) / 10000.0
    assert abs(sum_row.logit - want) < 2e-4  # rounding slack on mean
    for impl in ("sql", "arrow"):
        a = linear_text_scores(df, "text", "doc_id", pool="sum", impl=impl).collect()[0]
        assert a.logit == sum_row.logit
