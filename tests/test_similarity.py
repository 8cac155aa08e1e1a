"""Similarity-search tests: brute-force correctness + LSH recall."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_cosine_topk_self_similarity_excluded(emb):
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk(emb, q, k=5).collect()
    assert all(r.neighbor_id != r.query_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        cs = [r.cos for r in sorted(rows, key=lambda r: r.rank)]
        assert cs == sorted(cs, reverse=True)
        assert all(-1.0001 <= c <= 1.0001 for c in cs)


def test_topk_matches_numpy_ground_truth(emb):
    """Brute-force top-10 must equal an independent numpy computation.

    (The test embeddings have NO real cosine cluster structure — mean
    same-label cos ~= cross-label cos ~= 0 — so label agreement is
    not a valid check; exact ground truth is.)"""
    import numpy as np

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    np.fill_diagonal(S, -2.0)
    expected = {}
    for qi in range(5):
        order = sorted(range(len(ids)), key=lambda j: (-S[qi, j], ids[j]))[:10]
        expected[ids[qi]] = [ids[j] for j in order]

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in similarity.cosine_topk(emb, q, k=10).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got = {k: [n for _, n in sorted(v)] for k, v in got.items()}
    assert got == expected


def test_lsh_recall_vs_bruteforce(emb):
    """On weakly-structured vectors LSH needs short signatures + many
    tables (top-1 cos is only ~0.36 here -> per-table collision
    p ~= 0.62^n_planes). 4 planes x 8 tables gives ~70-80% expected
    recall; assert a conservative floor."""
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_ann_topk(
            emb, q, dim=dim, k=10, n_planes=4, n_tables=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_lsh_high_recall_on_clustered_data(spark):
    """The scale-path claim: when embeddings DO cluster (the real-world
    case), hyperplane LSH recovers near-exact top-k. Planted clusters:
    10 centers, members = center + small noise."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, rows = [], []
    for i in range(400):
        c = i % 10
        v = centers[c] + rng.normal(scale=0.08, size=32)
        v /= np.linalg.norm(v)
        vecs.append(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_ann_topk(
            emb, q, dim=32, k=10, n_planes=10, n_tables=6
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"clustered LSH recall {recall:.2f}"


def test_kmeans_centroids_beat_random_at_low_probe(spark):
    """The trained coarse quantizer must earn its one offline job:
    with 16 planted clusters, 16 cells, and n_probe=1, k-means
    centroids converge near the true centers while random ones split
    clusters across cells — recall must improve, strictly."""
    import numpy as np

    from aws_de_final_project_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(16, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(640):
        v = centers[i % 16] + rng.normal(scale=0.06, size=32)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, q, k=10).collect()
    }

    def recall(cents):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_ann_topk(
                emb, q, dim=32, k=10, n_centroids=16, n_probe=1,
                centroids=cents,
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r_random = recall(None)
    trained = kmeans_centroids(emb, dim=32, n_centroids=16, sample=640)
    r_trained = recall(trained)
    assert r_trained > r_random, (r_trained, r_random)
    assert r_trained >= 0.8, r_trained


def test_blocked_dup_pairs_recall_and_precision(spark):
    """Hyperplane-blocked cosine_dup_pairs vs the exact cross-join on
    planted near-duplicates (cos ~0.97): precision must be 1 (the
    exact cosine re-check runs inside the blocked path) and recall
    high (miss probability (1-p^b)^T with p~0.92, b=8, T=6 -> ~1%)."""
    import numpy as np

    from aws_de_final_project_spark.operators.similarity import cosine_dup_pairs

    rng = np.random.default_rng(23)
    rows = []
    for i in range(150):
        base = rng.normal(size=32)
        base /= np.linalg.norm(base)
        dup = base + rng.normal(scale=0.04, size=32)
        dup /= np.linalg.norm(dup)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in dup]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_dup_pairs(
            emb, threshold=0.9, block_planes=0
        ).collect()
    }
    blocked = {
        (r.id_a, r.id_b)
        for r in cosine_dup_pairs(
            emb, threshold=0.9, block_planes=8, dim=32, n_tables=6
        ).collect()
    }
    assert blocked <= exact, "blocked path emitted a non-duplicate pair"
    assert exact, "planted duplicates did not exceed the threshold"
    recall = len(blocked) / len(exact)
    assert recall >= 0.9, f"blocked dedup recall {recall:.2f}"


def test_ivf_recall_on_clustered_data(spark):
    """IVF with random centroids on planted clusters: probing 4 of 8
    cells must recover most exact neighbors (same-cluster vectors land
    in the same or adjacent cells)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(300):
        v = centers[i % 6] + rng.normal(scale=0.08, size=32)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_ann_topk(
            emb, q, dim=32, k=10, n_centroids=8, n_probe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f}"


def test_vectorized_topk_matches_hof_path(emb):
    """The Arrow/numpy mapInPandas twin must produce the exact same
    (query_id, neighbor_id, rank) rows as the HOF path, with cos equal
    at the shared 4dp rounding — the contract that lets it share
    ann_cosine_topk's DuckDB oracle."""
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hof = similarity.cosine_topk(emb, q, k=10).orderBy("query_id", "rank")
    vec = similarity.cosine_topk_vectorized(emb, q, k=10).orderBy(
        "query_id", "rank"
    )
    hof_rows = [tuple(r) for r in hof.collect()]
    vec_rows = [tuple(r) for r in vec.collect()]
    assert hof.columns == vec.columns == [
        "query_id", "neighbor_id", "cos", "rank"
    ]
    assert hof_rows == vec_rows


def test_semantic_dup_pairs_recall_and_precision(spark):
    """SemDeDup-style clustered dedup on planted near-duplicates
    (cos ~0.97): precision 1 (exact cosine verify inside), and near-
    identical vectors agree on their nearest centroid almost always —
    top-2 soft assignment covers the cell-boundary stragglers."""
    import numpy as np

    from aws_de_final_project_spark.operators.similarity import (
        cosine_dup_pairs,
        semantic_dup_pairs,
    )

    rng = np.random.default_rng(31)
    rows = []
    for i in range(150):
        base = rng.normal(size=32)
        base /= np.linalg.norm(base)
        dup = base + rng.normal(scale=0.04, size=32)
        dup /= np.linalg.norm(dup)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in dup]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_dup_pairs(
            emb, threshold=0.9, block_planes=0
        ).collect()
    }
    clustered = {
        (r.id_a, r.id_b)
        for r in semantic_dup_pairs(
            emb, dim=32, threshold=0.9, n_clusters=8, n_assign=2
        ).collect()
    }
    assert clustered <= exact, "clustered path emitted a non-duplicate pair"
    assert exact, "planted duplicates did not exceed the threshold"
    recall = len(clustered) / len(exact)
    assert recall >= 0.9, f"semantic dedup recall {recall:.2f}"


def test_arrow_signatures_match_sql_bank(emb):
    """The BLAS signature kernel and the SQL literal bank must assign
    every vector the same (tbl, sig) buckets — same hyperplanes, same
    sign bits (a flip would need |dot| ~ 1e-13; the fixture's dots are
    far from zero). This pins that sig_impl='arrow' is a drop-in for
    the oracled sql path, not a different LSH."""
    from aws_de_final_project_spark.operators import similarity as S

    dim = len(emb.select("embedding").first()[0])
    tables = [S._hyperplanes(dim, 8, seed=42 + 1000 * t) for t in range(4)]

    arrow = {
        (r.vec_id, r.tbl, r.sig)
        for r in S.signature_table_arrow(
            emb, "vec_id", "embedding", tables
        ).collect()
    }
    from pyspark.sql import functions as F

    sql_rows = emb.select(
        "vec_id",
        *[
            S.lsh_signature("embedding", planes).alias(f"_s{t}")
            for t, planes in enumerate(tables)
        ],
    ).collect()
    sql = {
        (r.vec_id, t, r[f"_s{t}"]) for r in sql_rows for t in range(4)
    }
    assert arrow == sql


def test_blocked_dedup_arrow_wide_dim_recall(spark):
    """Wide-embedding scale path (VERDICT r2 #5): at dim 256 with
    planted near-duplicates, the arrow-signature blocked dedup must
    find every planted pair (precision is 1 by the exact verify)."""
    import numpy as np

    from aws_de_final_project_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    base = rng.standard_normal((400, 256)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(400)]
    # plant 40 near-dups of the first 40 vectors
    planted = set()
    for i in range(40):
        noisy = base[i] + 0.02 * rng.standard_normal(256).astype(np.float32)
        rows.append((1000 + i, [float(x) for x in noisy]))
        planted.add((i, 1000 + i))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(
            corpus,
            threshold=0.9,
            block_planes=12,
            dim=256,
            n_tables=8,
            sig_impl="arrow",
        ).collect()
    }
    assert planted <= got
    # every extra pair is a genuine >= threshold pair (exact verify)


def test_arrow_cell_assignment_matches_sql_bank(emb):
    """cell_assign_arrow must assign every vector the same top-2 cells
    (same order) as the SQL centroid bank — same centroids, same
    (dot desc, index asc) tiebreak via stable argsort."""
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators import similarity as S

    dim = len(emb.select("embedding").first()[0])
    cents = S._centroids(dim, 8)

    sql_rows = emb.select(
        "vec_id",
        F.expr(S._top_cells_sql("embedding", cents, 2)).alias("cells"),
    ).collect()
    sql = {(r.vec_id, i, c) for r in sql_rows for i, c in enumerate(r.cells)}

    arrow_df = S.cell_assign_arrow(emb, "vec_id", "embedding", cents, 2)
    # kernel emits n_assign blocks in rank order: recover rank by
    # re-ranking each id's cells via the dot products
    import numpy as np

    C = np.asarray(cents)
    by_id = {}
    for r in emb.select("vec_id", "embedding").collect():
        d = np.asarray(r.embedding, dtype=np.float64) @ C.T
        order = np.argsort(-d, kind="stable")[:2]
        by_id[r.vec_id] = list(order)
    arrow = set()
    for r in arrow_df.select("vec_id", "cell").collect():
        rank = by_id[r.vec_id].index(r.cell)
        arrow.add((r.vec_id, rank, r.cell))
    assert arrow == sql


def test_ivf_and_semantic_arrow_match_sql_results(emb):
    """End-to-end: the arrow assignment path must produce the exact
    same IVF top-k and SemDeDup pair set as the literal-bank path at
    dim 64 (bit-equal cells -> identical candidates -> identical
    4dp-rounded outputs)."""
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators import similarity as S

    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = S.ivf_ann_topk(emb, queries, dim=dim, k=5, n_centroids=8, n_probe=3)
    b = S.ivf_ann_topk(
        emb, queries, dim=dim, k=5, n_centroids=8, n_probe=3,
        assign_impl="arrow",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    pa = S.semantic_dup_pairs(emb, dim=dim, threshold=0.3)
    pb = S.semantic_dup_pairs(emb, dim=dim, threshold=0.3, assign_impl="arrow")
    assert sorted(map(tuple, pa.collect())) == sorted(map(tuple, pb.collect()))


def test_impl_auto_dispatch(spark):
    """VERDICT r4 #2: the default impl is 'auto' — literal-bank SQL at
    oracle-fixture widths, the Arrow BLAS kernel at real embedding
    widths (dim >= 256), so the measured-fast path no longer requires
    reading the docstring. Resolution is pinned directly and via the
    physical plan (the arrow path shows a MapInPandas node)."""
    from pyspark.sql import functions as F

    from aws_de_final_project_spark.operators import similarity as S

    assert S._resolve_impl("auto", 64, "x") == "sql"
    assert S._resolve_impl("auto", 255, "x") == "sql"
    assert S._resolve_impl("auto", 256, "x") == "arrow"
    assert S._resolve_impl("auto", 768, "x") == "arrow"
    assert S._resolve_impl("sql", 768, "x") == "sql"       # explicit wins
    assert S._resolve_impl("arrow", 8, "x") == "arrow"
    import pytest as _pt

    with _pt.raises(ValueError, match="sig_impl"):
        S._resolve_impl("fast", 64, "sig_impl")

    def wide_corpus(n, dim):
        rows = [(i, [float((i * 31 + j) % 7 - 3) for j in range(dim)])
                for i in range(n)]
        return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    narrow = wide_corpus(20, 32)
    wide = wide_corpus(20, 256)
    # default (auto): narrow -> pure codegen, wide -> Arrow kernel
    p_narrow = plan_of(S.cosine_dup_pairs(
        narrow, threshold=0.3, block_planes=4, dim=32, n_tables=2))
    p_wide = plan_of(S.cosine_dup_pairs(
        wide, threshold=0.3, block_planes=4, dim=256, n_tables=2))
    # the exact-cosine verify is MapInPandas(score) in both paths; the
    # signature kernel MapInPandas(sign) appears only under arrow
    assert "MapInPandas sign" not in p_narrow
    assert "MapInPandas sign" in p_wide


def test_hard_negatives_topk_planted(spark):
    """Two tight clusters with different labels plus one same-label
    distractor: the top hard negative must be the nearest
    OTHER-label vector, and no same-label vector may ever appear."""
    rows = [
        # label 0 cluster near +x
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.99, 0.1, 0.0], 0),   # same-label near-dup: must be excluded
        # label 1 cluster: one near +x (hard), one far (easy)
        (3, [0.95, 0.3, 0.0], 1),
        (4, [0.0, 0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    anchors = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    out = similarity.hard_negatives_topk(emb, anchors, k=2).collect()
    assert [r.negative_id for r in out] == [3, 4]  # hard first
    assert all(r.negative_id != 2 for r in out)  # same label never
    assert out[0].cos > out[1].cos


def test_int8_ann_recall_vs_exact(spark):
    """Two-stage int8 retrieval must recover (nearly) the exact
    top-10: int8 keeps ~2 decimal digits per component, and the 4x
    refine buffer absorbs quantization rank noise. Also pins the
    parameter guard."""
    from aws_de_final_project_spark.sources.registry import load_tables

    t = load_tables(
        spark, "/root/testdata/sf0.001", ("embeddings",),
        register_views=False,
    )
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qs, k=10).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.int8_ann_topk(
            emb, qs, k=10, refine_factor=4
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.95, recall

    with pytest.raises(ValueError):
        similarity.int8_ann_topk(emb, qs, k=10, refine_factor=0)


def test_auto_blocking_sizes_with_corpus(spark):
    """'auto' blocking: planes/cells grow one step per corpus
    doubling (constant expected block population — the sf1 tier
    measured fixed-parameter blocking at a ~14x decade slope, auto at
    ~3x). Small corpora keep the floor values, so the oracled
    fixed-parameter entries and auto agree there."""
    import math as m

    from aws_de_final_project_spark.operators.similarity import (
        BLOCK_TARGET_ROWS,
        cosine_dup_pairs,
        semantic_dup_pairs,
    )

    dim = 8
    emb = spark.range(600).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(xxhash64(id, i) % 1000 AS FLOAT) / 1000.0) AS embedding",
    )
    # 600 rows -> floor: planes = max(4, ceil(log2(600/256))) = 4
    out = cosine_dup_pairs(
        emb, threshold=0.9, block_planes="auto", dim=dim, n_tables=2
    )
    out.count()  # runs
    big_n = 300_000
    want_planes = max(4, m.ceil(m.log2(big_n / BLOCK_TARGET_ROWS)))
    assert want_planes == 11  # one per doubling above the floor
    # semdedup auto on the same tiny corpus -> k floor of 16
    sd = semantic_dup_pairs(
        emb, dim=dim, threshold=0.95, n_clusters="auto", n_assign=2
    )
    sd.count()


def test_quadratic_guard_and_auto_defaults(spark):
    """r10 default flip: the SIGNATURE defaults are the scale-safe
    paths ('auto' blocking / 'auto' cells), and the exact O(n^2)
    cross-join is opt-in — block_planes=0 above QUADRATIC_ROW_CAP
    raises unless allow_quadratic=True, so a naive caller can never
    get the one plan that cannot finish at 100 TB."""
    import inspect

    import pytest

    from aws_de_final_project_spark.operators import similarity as S

    assert (
        inspect.signature(S.cosine_dup_pairs).parameters["block_planes"].default
        == "auto"
    )
    assert (
        inspect.signature(S.semantic_dup_pairs).parameters["n_clusters"].default
        == "auto"
    )

    dim = 4
    emb = spark.range(S.QUADRATIC_ROW_CAP + 1).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {dim}), i -> "
        "CAST(xxhash64(id, i) % 1000 AS FLOAT) / 1000.0) AS embedding",
    )
    with pytest.raises(ValueError, match="QUADRATIC_ROW_CAP"):
        S.cosine_dup_pairs(emb, threshold=0.9, block_planes=0)
    # opt-in still builds the plan (no execution needed for the guard)
    S.cosine_dup_pairs(
        emb, threshold=0.9, block_planes=0, allow_quadratic=True
    ).explain()
    # 'auto' default without dim: a clear error, not a cryptic one
    with pytest.raises(ValueError, match="dim is required"):
        S.cosine_dup_pairs(emb, threshold=0.9)
    # small corpus: exact baseline needs no opt-in
    small = emb.limit(50)
    assert S.cosine_dup_pairs(
        small, threshold=0.999, block_planes=0
    ).count() >= 0
