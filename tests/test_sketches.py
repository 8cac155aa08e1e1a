"""Sketch-aggregate accuracy + schema-drift CSV merge tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_de_final_project_spark.sources.registry import (
    load_tables,
    read_csv_dir_merged,
)


def test_sketches_close_to_exact(spark):
    from aws_de_final_project_spark.plans.extensions import sketch_event_stats

    approx = {
        r.event_type: r
        for r in sketch_event_stats(spark, "/root/testdata/sf0.01").collect()
    }
    t = load_tables(spark, "/root/testdata/sf0.01", ("events",))
    exact = {
        r.event_type: r
        for r in t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) / e.users <= 0.05
        # approx p50 within 5% of the exact median's magnitude window
        spread = max(abs(e.p50), 1.0)
        assert abs(a.p50 - e.p50) <= 0.05 * spread
        assert a.p50 <= a.p95 <= a.p99


def test_csv_dir_merged_schema_drift(spark, tmp_path):
    """CombineCompatibleSchemas parity: a file that gains a column
    must not break the read; old files surface NULL for it."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.csv").write_text("id,name\n1,x\n2,y\n")
    (d / "b.csv").write_text("id,name,extra\n3,z,9\n")
    df = read_csv_dir_merged(spark, str(d))
    rows = {r.id: (r.name, r.extra) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", 9)}
    assert set(df.columns) == {"id", "name", "extra"}


def test_redact_pii_matches_duckdb(spark):
    """PII scrubbing parity on constructed rows: Spark's chained
    regexp_replace must equal DuckDB's over the same patterns (both
    restricted to the regex subset the engines share)."""
    import duckdb

    from aws_de_final_project_spark.functions.text import (
        PII_PATTERNS,
        redact_pii,
    )

    rows = [
        (1, "contact bob.smith+spam@corp.example.co for info"),
        (2, "call 555-867-5309 or 555.867.5309 now"),
        (3, "ssn-ish 123456789 and card 4111111111111111 inline"),
        (4, "mixed a@b.io then 999-111-2222 then 987654321 end"),
        (5, "clean text with no pii at all"),
        (6, "edge a@b.c not-an-email @nope 12345678 short"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r.id: r.red for r in df.select("id", redact_pii("t").alias("red")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE s (id INT, t VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", rows)
    expr = "t"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = dict(con.execute(f"SELECT id, {expr} FROM s").fetchall())
    assert got == want
    assert got[1] == "contact <EMAIL> for info"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == "ssn-ish <ID> and card <ID> inline"
    assert got[5] == rows[4][1]


def test_csv_dir_merged_choice_types(spark, tmp_path):
    """resolveChoice parity: a column drifting int -> string across
    files widens to string; int -> double widens to double — one
    merged table either way, never a union failure."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.csv").write_text("id,ward,score\n1,7,10\n2,9,20\n")
    (d / "b.csv").write_text("id,ward,score\n3,7B,1.5\n")
    df = read_csv_dir_merged(spark, str(d))
    assert dict(df.dtypes) == {"id": "int", "ward": "string", "score": "double"}
    rows = {r.id: (r.ward, r.score) for r in df.collect()}
    assert rows == {1: ("7", 10.0), 2: ("9", 20.0), 3: ("7B", 1.5)}
    # oracle twin: DuckDB's union_by_name read of the same directory
    import duckdb

    con = duckdb.connect()
    n, w = con.execute(
        f"SELECT count(*), count(DISTINCT ward) FROM "
        f"read_csv_auto('{d}/*.csv', union_by_name=true)"
    ).fetchone()
    assert (n, w) == (df.count(), df.select("ward").distinct().count())


def test_phrase_occurrences_semantics(spark):
    """Padding prevents substring hits; counting is non-overlapping
    left-to-right; punctuation and case fold away; empty-normalizing
    phrases are rejected."""
    import pytest
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.functions.text import phrase_occurrences

    rows = [
        (1, "Data Model basics"),            # 1 (case/strip)
        (2, "bigdata model"),                # 0 (no substring hit)
        (3, "data model, then data model!"), # 2 (separated repeats)
        (4, "data modeling"),                # 0 (word boundary)
        (5, "a data model data model b"),    # 2 back-to-back... shares
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", phrase_occurrences("text", "Data-Model").alias("n")
        ).collect()
    }
    assert got[1] == 1 and got[2] == 0 and got[4] == 0
    assert got[3] == 2  # separated by another word: both count
    # back-to-back repeats share the boundary space: non-overlapping
    # left-to-right replace deterministically counts ONE — the
    # documented convention, pinned so a future regex rewrite that
    # double-counts fails here before it fails oracle parity
    assert got[5] == 1
    with pytest.raises(ValueError):
        df.select(phrase_occurrences("text", "!!!"))


def test_kmv_sketch_exact_branch_and_estimator_accuracy(spark):
    """KMV portable sketch: groups with < k distinct users report the
    EXACT count (the sketch holds the whole set); larger groups use
    the (k-1)/u_k estimator, which at k=64 must land within ~4 std
    errors (50%) of exact on the fixture — wide enough to be
    deterministic, tight enough to catch a broken estimator (an
    off-by-one in rank or a wrong normalizer is 2x+ off)."""
    from aws_de_final_project_spark.plans.extensions import (
        sketch_kmv_distinct_portable,
    )

    rows = sketch_kmv_distinct_portable(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r.exact_users < 64:
            assert r.est_users == float(r.exact_users)
        else:
            assert abs(r.est_users - r.exact_users) / r.exact_users < 0.5


def test_cms_one_sided_error_and_accuracy(spark):
    """CMS guarantee: estimates never undercount, and with 4x512
    cells over this corpus's vocabulary the top-30 heavy tokens'
    estimates stay within the epsilon*N Markov bound (w=512 ->
    eps=e/512, failure prob e^-4 per row; the min over 4 rows makes
    a visible violation on 30 probes astronomically unlikely)."""
    from aws_de_final_project_spark.plans.extensions import (
        sketch_cms_token_freq,
    )
    from aws_de_final_project_spark.functions.text import normalized_text

    rows = sketch_cms_token_freq(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 30
    t = load_tables(spark, "/root/testdata/sf0.01", ("documents",))
    n_total = (
        t["documents"]
        .select(
            F.explode(F.split(normalized_text("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .count()
    )
    eps_n = 2.718281828 / 512.0 * n_total
    for r in rows:
        assert r.cms_est >= r.exact_n  # one-sided, always
        assert r.cms_est - r.exact_n <= eps_n
