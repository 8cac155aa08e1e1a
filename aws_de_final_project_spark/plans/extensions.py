"""North-star extension queries over documents/embeddings tables.

Each function is ``(spark, sf_dir) -> DataFrame`` with stable aliased
columns, twinning a DuckDB oracle in ``__spark_entry__`` where the
semantics are ANSI-expressible (exact dedup, jaccard, brute-force
cosine, text stats); the hash-function-dependent ops (minhash/simhash
LSH) get rows-only checks by design — their verification story is the
agreement test against the exact operators in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_de_final_project_spark.functions.numeric import epoch_us
from aws_de_final_project_spark.functions.numeric import round_half_up as rnd

from aws_de_final_project_spark.functions import text as TX
from aws_de_final_project_spark.operators import (
    dedup,
    dq,
    multimodal,
    rangejoin,
    segments,
    similarity,
    spatial,
)
from aws_de_final_project_spark.operators.util import spread
from aws_de_final_project_spark.sources.registry import embedding_dim, load_tables


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups on documents.text (md5 fingerprint)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.exact_dedup_groups(t["documents"], "text", "doc_id").select(
        F.col("fp").alias("fingerprint"), "n_copies", "keeper_id"
    ).orderBy("fingerprint")


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard near-dup pairs (J >= 0.5), blocked by
    lang. Oracle-checkable; also the ground truth the LSH variants
    are tested against."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.jaccard_pairs(
        t["documents"], "text", "doc_id", threshold=0.5, block_col="lang"
    ).orderBy("doc_a", "doc_b")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram shingle Jaccard near-dup pairs (J >= 0.5) —
    the ground truth dedup_minhash_lsh approximates. O(n^2) within a
    lang block; oracle-checkable."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.ngram_jaccard_pairs(
        t["documents"], "text", "doc_id", threshold=0.5, block_col="lang"
    ).orderBy("doc_a", "doc_b")


def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide word-3-gram Jaccard pairs (J >= 0.5) via
    prefix filtering (AllPairs/PPJoin) — identical OUTPUT to the
    quadratic join but candidates come from a rare-shingle prefix
    equi-join producing under 2% of the possible pairs on the 500-doc
    fixture (bound pinned in tests/test_dedup.py). Skew-resistant by
    construction — the frequent shingles that would hot-spot the join
    key are exactly the ones prefixes exclude. The oracle is the
    brute-force quadratic twin; equality IS the exactness proof (no
    recall knob, unlike MinHash)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.prefix_filter_jaccard_pairs(
        t["documents"], "text", "doc_id", threshold=0.5, ngram=3
    ).orderBy("doc_a", "doc_b")


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over 3-gram shingles (verified
    shingle-J >= 0.5). No SQL oracle (signatures depend on Spark's
    xxhash64); recall vs dedup_ngram_jaccard is asserted in
    tests/test_dedup.py. Oracled twin: dedup_minhash_portable —
    the identical pipeline on the portable md5 hash family, FULL
    DuckDB oracle (the pairing the rows-only contract test pins)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.minhash_lsh_pairs(
        t["documents"], "text", "doc_id", threshold=0.5
    ).orderBy("doc_a", "doc_b")


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs — the documented exact O(n^2)
    BASELINE (block_planes=0 is now opt-in behind allow_quadratic;
    the operator DEFAULT is the corpus-sized 'auto' blocking, r10
    flip). Kept as the recall yardstick the blocked/clustered entries
    verify against."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.cosine_dup_pairs(
        t["embeddings"],
        threshold=0.3,
        block_planes=0,
        allow_quadratic=True,
    ).orderBy("id_a", "id_b")


def dedup_embedding_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for embedding dedup: hyperplane-signature
    blocking turns the O(n^2) self-join into an equi-join on
    (table, signature) — no CartesianProduct in the plan (pinned in
    tests/test_plan_shapes.py). Fully oracle-checked: the hyperplanes
    are deterministic driver-side literals, so the SAME literals
    interpolate into the DuckDB twin and even the bucketing is
    verified; recall vs the exact entry is also asserted in
    tests/test_similarity.py. Parameters are tuned for
    this weakly-structured corpus (threshold 0.3 -> per-plane
    agreement ~0.6): 4-bit signatures x 8 tables."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.cosine_dup_pairs(
        t["embeddings"],
        threshold=0.3,
        block_planes=4,
        dim=embedding_dim(sf_dir),
        n_tables=8,
        # oracled entry: pin the literal-bank path — parity must not
        # ride the dim>=256 arrow auto-dispatch heuristic
        sig_impl="sql",
    ).orderBy("id_a", "id_b")


def dedup_embedding_cosine_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECOMMENDED embedding-dedup path, exactly as a naive caller
    gets it: ``cosine_dup_pairs`` with its r10 DEFAULT
    ``block_planes='auto'`` — one count job sizes the hyperplane
    signature to the corpus (one extra plane per doubling holds
    expected bucket population, and so verify cost per row, constant;
    the fixed-plane twin measured a 14.9x decade slope on the sf1
    tier before the auto remediation). FULL DuckDB oracle: the twin
    interpolates the SAME auto-computed plane count for the oracle
    corpus as a static literal bank (auto sizing is a deterministic
    function of the row count), proving auto sizing changes
    recall/output not at all vs the committed literals."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.cosine_dup_pairs(
        t["embeddings"],
        threshold=0.3,
        # block_planes NOT passed: this entry exists to drive the
        # signature default ('auto')
        dim=embedding_dim(sf_dir),
        n_tables=8,
        sig_impl="sql",  # oracle parity must not ride the dim>=256 heuristic
    ).orderBy("id_a", "id_b")


def dedup_semantic_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECOMMENDED SemDeDup path, exactly as a naive caller gets
    it: ``semantic_dup_pairs`` with its r10 DEFAULT
    ``n_clusters='auto'`` — k grows linearly with the corpus so the
    O(n^2/k) within-cell verify stays linear per row (the fixed-16
    twin measured a 13.7x decade slope on the sf1 tier before the
    auto remediation). FULL DuckDB oracle with the auto-computed k
    interpolated as the static centroid bank."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.semantic_dup_pairs(
        t["embeddings"],
        dim=embedding_dim(sf_dir),
        threshold=0.3,
        # n_clusters NOT passed: drives the signature default ('auto')
        n_assign=2,
        assign_impl="sql",
    ).orderBy("id_a", "id_b")


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3). Rows-only check
    (signatures depend on Spark's xxhash64). Oracled twin:
    dedup_simhash_portable — same banding/verify on the
    portable md5 family, FULL DuckDB oracle (the pairing the
    rows-only contract test pins)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.simhash_near_pairs(
        t["documents"], "text", "doc_id", max_hamming=3
    ).orderBy("doc_a", "doc_b")


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for five fixed query vectors
    (vec_id < 5) over the embeddings corpus."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(emb, queries, k=10).orderBy("query_id", "rank")


def ann_cosine_topk_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy twin of ann_cosine_topk: same queries, same output
    contract, scored by per-partition BLAS matmul via mapInPandas
    instead of pair-row HOF dots (operators/similarity.py:
    cosine_topk_vectorized). Shares ann_cosine_topk's oracle; bench
    measures the vectorized-vs-interpreted gap."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk_vectorized(emb, queries, k=10).orderBy(
        "query_id", "rank"
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 for the same queries.
    Oracle-checked end-to-end (plane literals interpolated into the
    DuckDB twin); recall vs brute force asserted in
    tests/test_similarity.py.

    Parameters are tuned for THIS corpus, whose vectors are weakly
    structured (top-1 cos ~0.36): short 4-bit signatures x 8 tables.
    On real clustered embeddings, raise n_planes (see
    tests/test_similarity.py::test_lsh_high_recall_on_clustered_data).
    """
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = embedding_dim(sf_dir)
    return similarity.lsh_ann_topk(
        emb, queries, dim=dim, k=10, n_planes=4, n_tables=8,
        sig_impl="sql",  # oracled: pin vs the arrow auto-dispatch
    ).orderBy("query_id", "rank")


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-10 for the same queries.
    Oracle-checked end-to-end (centroid literals interpolated into
    the DuckDB twin — cell assignment and probing included); recall
    vs brute force asserted in tests/test_similarity.py."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = embedding_dim(sf_dir)
    return similarity.ivf_ann_topk(
        emb, queries, dim=dim, k=10, n_centroids=8, n_probe=4,
        assign_impl="sql",  # oracled: pin vs the arrow auto-dispatch
    ).orderBy("query_id", "rank")


def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: sliding-window min of
    md5-prefix hashes over char-5-grams, deduped. Oracle-checked."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.winnow_fingerprints(
        t["documents"], "text", "doc_id", n=5, window=4
    ).orderBy("doc_id", "fp")


def multimodal_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end media pipeline composition: binary payloads ->
    Arrow-batched decode (stub codec) -> 8-dim feature vectors ->
    brute-force cosine top-5 neighbors for three query media. The
    shape of "embed the corpus, search it" with zero driver round
    trips between stages. Oracle-checked: the stub features are
    sha256 byte math, and DuckDB reproduces the float32 rounding via
    ::FLOAT::DOUBLE."""
    t = load_tables(spark, sf_dir, ("documents",))
    media = multimodal.synthesize_media(t["documents"])
    feats = multimodal.decode_media(media, codec="stub").select("media_id", "feature")
    queries = feats.filter(F.col("media_id") < 3).select(
        F.col("media_id").alias("query_id"), F.col("feature")
    )
    return similarity.cosine_topk(
        feats, queries, k=5, id_col="media_id", vec_col="feature"
    ).orderBy("query_id", "rank")


def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched stub resize over image payloads + rollup.
    Oracle-checked: the stub's byte-budget crop is pure arithmetic on
    octet_length, which DuckDB reproduces."""
    t = load_tables(spark, sf_dir, ("documents",))
    media = multimodal.synthesize_media(t["documents"])
    resized = multimodal.resize_media(media, width=224, height=224)
    return (
        resized.groupBy("kind", "width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.octet_length("payload")).alias("resized_bytes"),
            F.sum("orig_bytes").alias("orig_bytes"),
        )
        .orderBy("kind", "width", "height")
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub frame sampling (1 row -> N frame rows via mapInPandas) +
    per-media frame counts. Oracle-checked: the fixed-stride slicing
    reduces to closed-form byte math DuckDB reproduces."""
    t = load_tables(spark, sf_dir, ("documents",))
    media = multimodal.synthesize_media(t["documents"])
    frames = multimodal.sample_frames(media, frame_bytes=64, every_n=4)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("n_bytes").alias("sampled_bytes"),
        )
        .orderBy("media_id")
    )


def sketch_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event_type: HyperLogLog++ distinct users
    and approximate value percentiles. Rows-only check (sketch
    internals are engine-specific); accuracy vs exact is asserted in
    tests/test_sketches.py. Oracled twin: sketch_kmv_distinct_portable
    — the same sketch-vs-exact contract on the portable KMV family,
    FULL DuckDB oracle (the pairing the rows-only contract test pins).

    The 100 TB rationale: exact COUNT(DISTINCT) shuffles every
    distinct key; the HLL sketch is a fixed few-KB buffer per group,
    merged associatively map-side — constant shuffle volume at any
    cardinality. Same story for percentiles vs a global sort.
    """
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx(
                "value", [0.5, 0.95, 0.99], 10000
            ).alias("value_pcts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_pcts")[0].alias("p50"),
            F.col("value_pcts")[1].alias("p95"),
            F.col("value_pcts")[2].alias("p99"),
            "n_events",
        )
        .orderBy("event_type")
    )


def sketch_kmv_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event_type —
    the FULL-oracle twin of sketch_event_stats' HLL++ column, same
    recipe as the portable MinHash/SimHash twins: the hash family is
    ``int(md5(user_id)[:15 hex]) / 16^15`` (bit-identical in DuckDB),
    so signatures, the k-th minimum, and the (k-1)/u_k estimator all
    replay exactly and the driver hash-checks the whole sketch.

    Estimator (Bar-Yossef et al.): with u_k the k-th smallest of the
    distinct hash values in [0,1), E[distinct] = (k-1)/u_k; when a
    group holds fewer than k distinct values the sketch IS the exact
    set. Output pins both the estimate and the exact count, so the
    row itself exhibits the sketch's accuracy. k=64 (~12% rel err) is
    chosen so BOTH branches are driver-exercised: sf0.001 groups hold
    <64 distinct users (exact branch), sf0.01+ hold more (estimator).

    Scale shape: KMV state is k doubles per group, merged by
    union+keep-k-smallest — an associative merge, so the k-minimum is
    computed in two bounded phases (the salted top-k pattern): a rank
    within (group, salt-of-user) cells keeps each cell's k smallest
    in parallel (no task ever sorts more than a cell), then a final
    rank over the <= salts*k survivors per group picks the global k
    smallest. No single task ever sees a group's full distinct set.
    The exact_users column is the one deliberately exact (full
    distinct) aggregate — it exists to exhibit the estimator's error
    in the output itself; a production sketch would drop it."""
    t = load_tables(spark, sf_dir, ("events",))
    from pyspark.sql.window import Window

    k = 64
    n_salts = 64
    scale = float(16 ** 15)
    d = t["events"].select("event_type", "user_id").distinct()
    h = d.select(
        "event_type",
        F.pmod(F.crc32(F.col("user_id").cast("string")), F.lit(n_salts)).alias(
            "_salt"
        ),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("double")
            / F.lit(scale)
        ).alias("u"),
    )
    # phase 1: per-(group, salt) k smallest — each cell's local k-min
    # is a superset filter for the global k-min (k smallest of a
    # union = k smallest of the per-part k-smallest)
    w1 = Window.partitionBy("event_type", "_salt").orderBy("u")
    cand = (
        h.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .select("event_type", "u")
    )
    # phase 2: global k smallest over the <= n_salts*k survivors
    w = Window.partitionBy("event_type").orderBy("u")
    ranked = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    exact = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_users")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_in_sketch"),
            F.max("u").alias("_uk"),
        )
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            F.when(
                F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
            )
            .otherwise(F.lit(float(k - 1)) / F.col("_uk"))
            .alias("_est"),
        )
        .select(
            "event_type",
            "exact_users",
            rnd(F.col("_est"), 2).alias("est_users"),
        )
        .orderBy("event_type")
    )


def rollup_incremental_distinct_kmv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable COUNT(DISTINCT) rollup maintenance, the portable
    twin of rollup_maint's HLL measure: the corpus arrives as TWO
    deltas (event_id parity split), each folded to a per-group KMV
    sketch (k smallest md5-uniforms of its distinct users), and the
    stored state is MERGED — union of the two k-lists, dedup (a user
    seen in both deltas hashes to the same u), keep the k smallest.
    KMV's merge is exactly lossless: the k smallest distinct hashes
    of A ∪ B are contained in kmin(A) ∪ kmin(B), so the merged
    sketch is BIT-IDENTICAL to the direct sketch of the full corpus
    — which is what the oracle computes (it shares
    sketch_kmv_distinct_portable's SQL verbatim). A green driver row
    therefore proves the mergeability property itself, end-to-end:
    at 100 TB the rollup applies each day's delta against k doubles
    per group of stored state and never rescans history.

    Scale shape: each delta's k-min uses the same salted two-phase
    rank as the base sketch (no task ever sorts a group's full
    distinct set); the merge input is <= 2k rows per group."""
    t = load_tables(spark, sf_dir, ("events",))
    from pyspark.sql.window import Window

    k = 64
    n_salts = 64
    scale = float(16 ** 15)
    ev = t["events"]
    u_expr = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(scale)
    )

    def delta_sketch(df: DataFrame) -> DataFrame:
        d = df.select(
            "event_type",
            F.pmod(
                F.crc32(F.col("user_id").cast("string")), F.lit(n_salts)
            ).alias("_salt"),
            u_expr.alias("u"),
        ).distinct()
        w1 = Window.partitionBy("event_type", "_salt").orderBy("u")
        cand = (
            d.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .select("event_type", "u")
        )
        w2 = Window.partitionBy("event_type").orderBy("u")
        return (
            cand.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k)
            .select("event_type", "u")
        )

    b1 = delta_sketch(ev.where(F.col("event_id") % 2 == 0))
    b2 = delta_sketch(ev.where(F.col("event_id") % 2 == 1))
    # merge: union + dedup + keep k smallest — |state| + |delta|
    # rows per group, never the history
    w = Window.partitionBy("event_type").orderBy("u")
    state = (
        b1.unionByName(b2)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    return (
        state.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_in_sketch"),
            F.max("u").alias("_uk"),
        )
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            F.when(
                F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
            )
            .otherwise(F.lit(float(k - 1)) / F.col("_uk"))
            .alias("_est"),
        )
        .select(
            "event_type",
            "exact_users",
            rnd(F.col("_est"), 2).alias("est_users"),
        )
        .orderBy("event_type")
    )


def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-seeded corpus shuffle: the data-ordering
    primitive of a training loop. Each doc draws a uniform key from
    md5(epoch_seed || doc_id) — reproducible under retries, task
    re-execution, and repartitioning (no rand()); docs are hash-
    assigned to shards and ordered within each shard by the key.
    Output: (doc_id, shard, pos) — a complete, deterministic epoch
    permutation a trainer can consume shard-per-worker.

    Scale shape: the shard assignment is a pure projection; the only
    shuffle is the per-shard ordering window — partitioned by shard,
    so it's the standard distributed-sort pattern (each shard sorts
    its own slice; nothing global). At 100 TB you'd raise n_shards to
    the worker count and the per-shard sort stays bounded. Fully
    oracle-checked (md5 replays bit-identically)."""
    from pyspark.sql.window import Window

    seed = "epoch-7:"
    n_shards = 8
    t = load_tables(spark, sf_dir, ("documents",))
    keyed = t["documents"].select(
        "doc_id",
        F.md5(
            F.concat(F.lit(seed), F.col("doc_id").cast("string"))
        ).alias("_k"),
    )
    shard = F.pmod(
        F.conv(F.substring("_k", 1, 15), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_k")
    return (
        keyed.select("doc_id", shard.alias("shard"), "_k")
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).alias("pos"),
        )
        .orderBy("shard", "pos")
    )


def split_train_val_test_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic leak-free train/val/test assignment (80/10/10)
    by hash range: each doc draws u = md5(salt || doc_id)/16^15 in
    [0,1) and lands in a split by fixed thresholds. The production
    split recipe at corpus scale — a pure projection (ZERO shuffles,
    the filter composes onto the scan), reproducible under retries
    and re-partitioning, and stable as the corpus grows: adding docs
    NEVER moves an existing doc between splits, which a rank-quota
    split cannot promise (rank shifts reassign the boundary docs —
    train/test leakage across dataset versions). Per-group
    proportions are binomial-approximate; the companion aggregate
    entries (mixture_rebalance, stratified_sample_events) cover the
    exact-quota shapes. Fully oracle-checked: the threshold compare
    replays on the identical md5-derived double."""
    t = load_tables(spark, sf_dir, ("documents",))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("split-42:"), F.col("doc_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16 ** 15))
    )
    return (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            F.when(u < 0.8, F.lit("train"))
            .when(u < 0.9, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring rolled up per language."""
    t = load_tables(spark, sf_dir, ("documents",))
    per_doc = t["documents"].select(
        "lang",
        TX.token_count("text").alias("n_tokens"),
        TX.char_count("text").alias("n_chars_m"),
        TX.quality_score("text").alias("quality"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            rnd(F.avg("n_tokens"), 2).alias("avg_tokens"),
            rnd(F.avg("n_chars_m"), 2).alias("avg_chars"),
            rnd(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting, whitespace AND BPE-style regex
    pre-tokenization (both JVM-side; no Python in the loop)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id",
        TX.token_count("text").alias("n_ws_tokens"),
        TX.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document md5 fingerprint of normalized text."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id", TX.fingerprint("text").alias("fingerprint")
    ).orderBy("doc_id")


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-based language ID per document (deterministic
    heuristic; accuracy is not the point — the JVM-side classifier
    shape is)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id", "lang", TX.lang_id("text").alias("predicted_lang")
    ).orderBy("doc_id")


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan over synthesized media payloads."""
    t = load_tables(spark, sf_dir, ("documents",))
    media = multimodal.synthesize_media(t["documents"])
    return multimodal.media_byte_stats(media)


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (stub codec) + rollup of the
    extracted dimensions. Oracle-checked: the stub derives dims from
    sha256 bytes, and DuckDB's sha256() hashes the same UTF-8
    payload."""
    t = load_tables(spark, sf_dir, ("documents",))
    media = multimodal.synthesize_media(t["documents"])
    decoded = multimodal.decode_media(media, codec="stub")
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            rnd(F.avg("width"), 2).alias("avg_width"),
            rnd(F.avg("height"), 2).alias("avg_height"),
        )
        .orderBy("kind")
    )


def quality_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate per document: the repetition/quality
    signals (token window, mean word length, symbol ratio, duplicate
    lines) plus the combined keep flag. All built-ins; at scale the
    flag evaluates in the scan stage, so filtered rows never shuffle.
    Oracle-checked."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        rnd(TX.mean_word_len("text"), 4).alias("mean_word_len"),
        rnd(TX.symbol_ratio("text"), 4).alias("symbol_ratio"),
        rnd(TX.dup_line_frac("text"), 4).alias("dup_line_frac"),
        TX.gopher_keep("text").alias("keep"),
    ).orderBy("doc_id")


def ngram_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-10 word bigrams per language (frequency, not
    distinct-set, so counts reflect true occurrence mass).

    At scale this is the canonical "heavy hitters" shape: explode ->
    two-level aggregation (map-side partial collapses the explode
    before the exchange) -> per-group top-k window over the already
    tiny (lang, ngram) aggregate. Oracle-checked."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, ("documents",))
    words = t["documents"].select(
        "lang", F.split(TX.normalized_text("text"), " ").alias("_w")
    )
    grams = words.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_w") - 1, F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, 2)),
            )
        ).alias("ngram"),
    )
    counts = grams.groupBy("lang", "ngram").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("ngram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "ngram", "n", "rank")
        .orderBy("lang", "rank")
    )


def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates applied
    via an md5-derived hash bucket of the row id — reproducible across
    runs, engines, and cluster sizes (unlike df.sample, whose output
    depends on partitioning). The filter is scan-stage; no shuffle.
    Oracle-checked (DuckDB computes the identical md5 buckets)."""
    t = load_tables(spark, sf_dir, ("events",))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 1000
    )
    rate = (
        F.when(F.col("event_type") == "click", F.lit(50))
        .when(F.col("event_type") == "view", F.lit(20))
        .otherwise(F.lit(100))
    )
    return (
        t["events"]
        .filter(bucket < rate)
        .select("event_id", "event_type", "user_id", "value")
        .orderBy("event_id")
    )


def dedup_component_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS, not just pairs: connected components
    over the exact 3-gram-Jaccard pair list, assigning every document
    its cluster's min doc_id (singletons keep their own id) and an
    is_keeper flag — the final "keep one per cluster" step of a dedup
    pipeline. Iterative min-label propagation (operators/dedup.py);
    oracle-checked via a DuckDB recursive-CTE transitive closure over
    the same pair list.

    Edges here come from the EXACT Jaccard join (O(n^2) within a lang
    block) so the oracle can reproduce them — this entry is the
    correctness twin. The scale path is
    :func:`dedup_component_groups_lsh`, identical clustering over
    MinHash+LSH edges."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, block_col="lang"
    )
    # impl='auto': the LSH pair list is aggregation-sized (a few edges
    # per near-dup cluster), so the bounded driver union-find runs and
    # the ~log-diameter pointer-doubling rounds (each a scheduled
    # join+agg+checkpoint) collapse to one collect; past the 2M-pair
    # cap it falls back to the distributed iteration (r13; same
    # dispatch as the entity-resolution entry, equivalence pinned in
    # tests/test_dedup.py)
    return dedup.dedup_components(
        docs, pairs, "doc_id", impl="auto"
    ).orderBy("doc_id")


def dedup_component_groups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB dedup-clustering path: connected components over
    MinHash+LSH candidate edges (every stage bucketed — no O(n^2)
    anywhere). Rows-only check (edges depend on Spark's xxhash64);
    the clustering itself is pinned by the oracled exact twin and the
    union-find ground-truth test, and LSH edge recall by
    tests/test_dedup.py. Oracled twin: dedup_component_groups_portable
    — the identical clustering over the portable md5 LSH edges, FULL
    DuckDB oracle (the pairing the rows-only contract test pins)."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    # impl='auto': the LSH pair list is aggregation-sized (a few edges
    # per near-dup cluster), so the bounded driver union-find runs and
    # the ~log-diameter pointer-doubling rounds (each a scheduled
    # join+agg+checkpoint) collapse to one collect; past the 2M-pair
    # cap it falls back to the distributed iteration (r13; same
    # dispatch as the entity-resolution entry, equivalence pinned in
    # tests/test_dedup.py)
    return dedup.dedup_components(
        docs, pairs, "doc_id", impl="auto"
    ).orderBy("doc_id")


def dedup_component_groups_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-edge clustering with a FULL oracle: connected components
    over the portable-md5 MinHash+LSH candidate edges
    (operators/dedup.py minhash_lsh_pairs_portable — the hash family
    DuckDB replays bit-identically), so the driver hash-checks the
    entire approximate-clustering pipeline end-to-end: signatures →
    bands → candidate join → Jaccard verify → components → keeper
    flags. Same banded/bucketed plan shape as the xxhash64 scale
    path (:func:`dedup_component_groups_lsh`); only the hash family
    differs."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    pairs = dedup.minhash_lsh_pairs_portable(
        docs, "text", "doc_id", threshold=0.5
    )
    # impl='auto': the LSH pair list is aggregation-sized (a few edges
    # per near-dup cluster), so the bounded driver union-find runs and
    # the ~log-diameter pointer-doubling rounds (each a scheduled
    # join+agg+checkpoint) collapse to one collect; past the 2M-pair
    # cap it falls back to the distributed iteration (r13; same
    # dispatch as the entity-resolution entry, equivalence pinned in
    # tests/test_dedup.py)
    return dedup.dedup_components(
        docs, pairs, "doc_id", impl="auto"
    ).orderBy("doc_id")


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroid, emitted as (label, pos, avg) rows
    — class prototypes for a training corpus. posexplode + two-key
    aggregate: the explode collapses map-side (partial avg per
    (label, pos)) so shuffle volume is |labels| x dim regardless of
    corpus size. Oracle-checked."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return (
        t["embeddings"]
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(rnd(F.avg(F.col("v").cast("double")), 4).alias("avg_v"))
        .orderBy("label", "pos")
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term scoring for a fixed doc slice (doc_id < 50):
    term frequency x ln(N/df) with df from the whole corpus.

    The classic two-aggregation shape: per-(doc, term) counts, then
    per-term document frequencies, joined back — both aggregations
    collapse map-side; N arrives as a broadcast 1-row cross join, not
    a driver round trip. Oracle-checked (ln() agrees across engines
    at 4dp rounding)."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    words = docs.select(
        "doc_id", F.explode(F.split(TX.normalized_text("text"), " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.filter(F.col("doc_id") < 50)
        .join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            rnd(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "term")
    )


def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with an md5 hash family — the oracle-checkable twin
    of dedup_minhash_lsh: DuckDB computes the identical signatures,
    bands, candidate pairs, and Jaccard verify, so the driver
    hash-checks the full approximate pipeline (not just its recall)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.minhash_lsh_pairs_portable(
        t["documents"], "text", "doc_id", threshold=0.5
    ).orderBy("doc_a", "doc_b")


def decontaminate_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 23rd document stands in for an
    eval set; the rest are scored for 5-gram overlap against it
    (operators/curation.py — hashed shingles, broadcast benchmark,
    no corpus shuffle). Fully oracle-checked: the md5 shingle hashes
    replay bit-identically in DuckDB."""
    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    rest = docs.filter(F.col("doc_id") % 23 != 0)
    return curation.decontaminate(rest, bench, ngram=5).orderBy("doc_id")


def mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: downweight over-represented
    languages (en 0.3x, zh 0.8x, rest kept) via a pure (salt, doc_id)
    md5 draw — reproducible under retries/repartitioning, replayed
    exactly by the DuckDB oracle. Output: post-sample mixture."""
    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    kept = curation.mixture_sample(
        t["documents"], {"en": 0.3, "zh": 0.8}, group_col="lang"
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5 hash family (60 portable
    bits, 4 chunks of 15) — the oracle-checkable twin of
    dedup_simhash_pairs: DuckDB computes the identical signatures,
    pigeonhole bands, candidate join, and popcount verify, so the
    driver hash-checks the full approximate pipeline."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.simhash_near_pairs(
        t["documents"], "text", "doc_id", max_hamming=3,
        chunks=4, bits=60, hash_family="md5",
    ).orderBy("doc_a", "doc_b")


def line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global line dedup with document reassembly:
    each 10-word pseudo-line is kept only at its smallest (doc_id,
    pos) occurrence corpus-wide, and documents are rebuilt from their
    surviving lines. One md5-keyed shuffle + one doc_id shuffle —
    the canonical pretraining line-dedup pass at corpus scale."""
    t = load_tables(spark, sf_dir, ("documents",))
    return segments.line_dedup(
        t["documents"], "text", "doc_id", words_per_line=10
    ).orderBy("doc_id")


def chunk_text_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: 120-char sliding windows with stride 80
    (40-char overlap), tail-covering, with 1-based [begin, end]
    character offsets. Pure narrow transform — sequence + posexplode
    + substring, zero shuffles."""
    t = load_tables(spark, sf_dir, ("documents",))
    return segments.chunk_text(
        t["documents"], "text", "doc_id", size=120, stride=80
    ).orderBy("doc_id", "chunk_id")


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of the documents table into
    256-token training sequences across 4 shards: docs lie end-to-end
    per shard in id order, cut every 256 whitespace tokens; a doc
    crossing a cut appears once per overlapped sequence with the
    half-open [begin_tok, end_tok) slice it contributes. The offset
    window is partitioned by shard — no global-order single-task
    window anywhere in the plan."""
    t = load_tables(spark, sf_dir, ("documents",))
    return segments.pack_sequences(
        t["documents"], "text", "doc_id", budget=256, n_shards=4
    ).orderBy("doc_id", "shard", "seq_id")


def dq_orders_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite on orders: 5 expression checks +
    a referential check against customer, all computed in a SINGLE
    scan of the fact table (one hash-aggregate; the customer key set
    is broadcast into the same pass). The 400k price ceiling is
    deliberately tight so in_range reports real violations — a check
    suite that can only ever return zeros proves nothing."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return dq.check_suite(
        t["orders"],
        [
            dq.not_null("o_custkey"),
            dq.unique("o_orderkey"),
            dq.in_range("o_totalprice", 0.0, 400000.0),
            dq.accepted_values("o_orderstatus", ["O", "F", "P"]),
            dq.matches_regex("o_orderpriority", "^[1-5]-[A-Z ]+$"),
            dq.satisfies(
                "date_in_epoch", F.col("o_orderdate") >= F.lit("1992-01-01")
            ),
        ],
        refs=[("o_custkey", t["customer"], "c_custkey")],
    )


def dq_documents_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ suite on documents: uniqueness, consistency between the
    n_chars metadata column and the actual text length, and an
    accepted-language list that deliberately omits 'zh' so the check
    surfaces a real violation count."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dq.check_suite(
        t["documents"],
        [
            dq.unique("doc_id"),
            dq.not_null("text"),
            dq.satisfies(
                "n_chars_consistent", F.col("n_chars") == F.length("text")
            ),
            dq.accepted_values("lang", ["en", "de", "es", "fr"]),
            dq.matches_regex("source", "^src[0-9]+$"),
        ],
    )


def dedup_semantic_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style clustered embedding dedup: 16 fixed centroids,
    top-2 soft assignment, within-cell exact-cosine verify at 0.3.
    Third point in the embedding-dedup design space alongside the
    exact baseline (dedup_embedding_cosine) and hyperplane-LSH
    blocking (dedup_embedding_cosine_blocked); fully oracle-checked
    because the centroid bank is a deterministic driver-side literal."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.semantic_dup_pairs(
        t["embeddings"],
        dim=embedding_dim(sf_dir),
        threshold=0.3,
        n_clusters=16,
        n_assign=2,
        # oracled entry: pin the centroid literal bank — parity must
        # not ride the dim>=256 arrow auto-dispatch heuristic
        assign_impl="sql",
    ).orderBy("id_a", "id_b")


def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document (vowel-group syllable
    estimator) — the classic text-quality feature alongside the
    Gopher-rule gate. Counts and score are pure regex/arithmetic
    expressions: whole-stage codegen end to end, no UDF, and the
    identical IEEE-double formula interpolates into the DuckDB twin
    (3dp round absorbs nothing — op order is the same — but keeps the
    contract explicit)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = spread(t["documents"])  # 1-file scan = 1 task: parallelize the per-row token work
    return (
        d.select(
            "doc_id",
            TX.token_count("text").alias("n_words"),
            TX.sentence_count("text").alias("n_sentences"),
            TX.syllable_count("text").alias("n_syllables"),
            rnd(TX.flesch_reading_ease("text"), 3).alias("flesch"),
        )
        .filter(F.col("n_words") > 0)
        .orderBy("doc_id")
    )


def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality model: score each document by the
    mean natural-log unigram probability of its tokens under the
    corpus's own empirical distribution (the cheap stand-in for a
    KenLM-style fluency filter — outlier docs score far from the
    corpus mode, gibberish scores low).

    Two-pass shape that scales: pass 1 aggregates the vocabulary
    (token -> count, vocab-sized output); pass 2 re-scans documents
    and joins tokens to the BROADCAST vocabulary — the classic
    hot-key join (stopwords dominate) is avoided entirely because the
    small side ships to every executor and the fact side never
    shuffles on token."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = spread(t["documents"])  # 1-file scan = 1 task: parallelize the per-row token work
    toks = d.select(
        "doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("tok")
    ).filter(F.length("tok") > 0)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n")).select(
        F.lit(1).alias("_one"), "n"
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(total), "_one")
        .select(
            "doc_id",
            (F.log(F.col("tf").cast("double") / F.col("n").cast("double"))).alias(
                "lp"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            rnd(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def perplexity_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail: per-LANGUAGE equal-population fluency
    terciles over the unigram mean-logprob score (higher = more
    fluent = head) — the bucketing CCNet applies to LM perplexity so
    training can sample head and middle at higher rates than tail.
    Composition: the oracled unigram LM score (unigram_logprob_scores
    above), lang joined back from the documents scan, then
    curation.fluency_buckets' integer-rank histogram terciles — the
    whole bucket assignment is exact integer arithmetic on 4dp
    scores, so the oracle replays it bit-for-bit."""
    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    scored = unigram_logprob_scores(spark, sf_dir).join(
        t["documents"].select("doc_id", "lang"), "doc_id"
    )
    out = curation.fluency_buckets(
        scored, "avg_logprob", "lang", "doc_id"
    )
    return out.select(
        "doc_id", "lang", "avg_logprob", "bucket"
    ).orderBy("doc_id")


def curation_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one driver-checkable query —
    the manifest a corpus build hands to training: exact dedup
    (first-id-wins fingerprint) → per-source median quality gate →
    benchmark decontamination (drop any 5-gram overlap with the
    doc_id%23 eval slice) → deterministic hash-range train/val/test
    assignment. Stage ordering is curate_corpus's (operators/
    curation.py:244): dedup before the gate so copies don't vote on
    quantile thresholds; decontaminate after the gates so the
    broadcast shingle join runs on the smallest surviving set.

    Every stage is an individually-oracled operator; this entry pins
    the COMPOSITION (the part curate_corpus itself can't oracle-check
    because it writes shards and returns a dict). All stage math is
    md5/threshold-replayable, so the DuckDB twin runs the identical
    pipeline end-to-end."""
    from aws_de_final_project_spark.operators import curation

    from aws_de_final_project_spark.operators.util import cut as _cutf

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    corpus = docs.filter(F.col("doc_id") % 23 != 0)
    # checkpoint the two multi-consumer stage frames (same as
    # curate_corpus): deduped feeds the gate AND the semi-join,
    # gated feeds decontamination AND the final semi-join — without
    # the cuts each stage's whole subtree replays per consumer
    deduped = _cutf(dedup.exact_dedup(corpus, "text", "doc_id"))
    gated_ids = curation.quantile_quality_filter(
        deduped, group_col="source", q=0.5
    ).select("doc_id")
    gated = _cutf(deduped.join(gated_ids, "doc_id", "left_semi"))
    overlap = curation.decontaminate(gated, bench, ngram=5)
    clean_ids = overlap.filter(F.col("n_hits") == 0).select("doc_id")
    clean = gated.join(clean_ids, "doc_id", "left_semi")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("split-42:"), F.col("doc_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16 ** 15))
    )
    return (
        clean.select(
            "doc_id",
            "lang",
            "source",
            F.when(u < 0.8, F.lit("train"))
            .when(u < 0.9, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style fluency filter, one model class up from
    unigram_logprob_scores: score each document by the mean
    natural-log conditional bigram probability of its token stream
    under the corpus's own add-alpha-smoothed bigram LM —
    ln((c(w1,w2) + a) / (c(w1,·) + a·V)), a=0.1, V = corpus vocab
    size. Gibberish and boilerplate-shuffled text score low even when
    every individual token is common — the failure mode a unigram
    filter can't see.

    Scale shape: bigrams are built in codegen (transform over the
    token array — no position self-join), counted with one hash
    aggregate keyed on the bigram, and docs join their bigrams back
    on that same key; prefix counts derive FROM the bigram counts
    (one more aggregate on the model-sized frame, never a second
    corpus pass) and V arrives as a broadcast 1-row cross join. The
    model-side join is left to AQE: broadcast at demo scale, shuffle
    join keyed on the bigram at corpus scale."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = spread(t["documents"])  # 1-file scan = 1 task: parallelize the per-row token work
    ts = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = d.select("doc_id", ts.alias("_ts")).filter(F.size("_ts") >= 2)
    pair = F.transform(
        F.sequence(F.lit(1), F.size("_ts") - 1),
        lambda i: F.concat(
            F.element_at(F.col("_ts"), i),
            F.lit(" "),
            F.element_at(F.col("_ts"), i + 1),
        ),
    )
    doc_bg = docs.select("doc_id", F.explode(pair).alias("bg"))
    c12 = doc_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (
        c12.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    vsz = (
        d.select(F.explode(ts).alias("tok"))
        .agg(F.countDistinct("tok").alias("vsz"))
    )
    alpha = 0.1
    scored = (
        doc_bg.join(c12, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c1, "w1")
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            F.log(
                (F.col("c12").cast("double") + F.lit(alpha))
                / (
                    F.col("c1").cast("double")
                    + F.lit(alpha) * F.col("vsz").cast("double")
                )
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            rnd(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def repetition_signals_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, Table A1 class):
    per document, the fraction of characters covered by (a) the MOST
    FREQUENT word 2-gram and 3-gram, and (b) ALL DUPLICATED word
    5-grams — the signals that catch boilerplate loops and
    template-stamped text that per-line dedup misses. Definitions
    (deterministic, documented here as the contract): tokens are the
    whitespace-split lowercase words; an n-gram's char mass is
    occurrences x (sum of its word lengths + n-1 separator chars);
    the denominator is the char length of the space-joined token
    stream; overlapping occurrences each count (the standard cheap
    approximation — exact span coverage needs interval merging).
    Ties on the top gram don't matter: only the max char mass is
    reported, not the gram.

    Scale shape: one explode + hash agg per n, keyed on (doc_id,
    gram) — fully parallel, skew-bounded by per-doc gram counts; the
    three signal frames join back on doc_id. All counts are integers;
    the final divisions are 4dp floor-rounded."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = spread(t["documents"])  # 1-file scan = 1 task: parallelize the per-row token work
    ts = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = d.select(
        "doc_id",
        ts.alias("_ts"),
        F.length(F.array_join(ts, " ")).alias("_chars"),
    ).filter(F.size("_ts") >= 2)

    def gram_stats(n: int, top_alias: str | None, dup_alias: str | None):
        # sequence() guard: size - (n-1) < 1 would build a DESCENDING
        # range and feed slice() an invalid start — short docs get an
        # empty gram array instead (they carry zero signal for this n)
        grams = F.when(
            F.size("_ts") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_ts") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("_ts", i, n)),
            ),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))
        ex = docs.select("doc_id", F.explode(grams).alias("_g"))
        counts = ex.groupBy("doc_id", "_g").agg(
            F.count(F.lit(1)).alias("_c")
        )
        mass = F.col("_c") * F.length("_g")
        aggs = []
        if top_alias is not None:
            aggs.append(F.max(mass).alias(top_alias))
        if dup_alias is not None:
            aggs.append(
                F.sum(F.when(F.col("_c") >= 2, mass).otherwise(0)).alias(
                    dup_alias
                )
            )
        return counts.groupBy("doc_id").agg(*aggs)

    g2 = gram_stats(2, "_top2", None)
    g3 = gram_stats(3, "_top3", None)
    g5 = gram_stats(5, None, "_dup5")
    base = docs.select("doc_id", "_chars")
    out = (
        base.join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
        .join(g5, "doc_id", "left")
    )
    frac = lambda c: rnd(  # noqa: E731
        F.coalesce(c, F.lit(0)).cast("double")
        / F.col("_chars").cast("double"),
        4,
    )
    return out.select(
        "doc_id",
        F.col("_chars").cast("long").alias("n_chars"),
        frac(F.col("_top2")).alias("top_2gram_char_frac"),
        frac(F.col("_top3")).alias("top_3gram_char_frac"),
        frac(F.col("_dup5")).alias("dup_5gram_char_frac"),
    ).orderBy("doc_id")


def temperature_mixture_rates_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-smoothed multilingual sampling rates (the XLM-R /
    mT5 rule: p_i proportional to n_i^alpha) over the documents table's
    language mix — the step that upsamples low-resource languages so a
    multilingual model is not swamped by the head language.

    Engine-exactness: alpha is fixed at 0.25 so n^alpha =
    sqrt(sqrt(n)) — IEEE sqrt is CORRECTLY ROUNDED in both engines,
    unlike libm pow/exp whose last-ulp may differ. Weights are then
    4dp-quantized and SCALED TO INTEGERS before the corpus sum (the
    int-bank discipline), so the denominator is an order-free BIGINT
    and every division runs on identical operands. Output per lang:
    n_docs, the natural share, the temperature-smoothed sampling
    probability, and the boost factor vs natural.

    Scale shape: one hash aggregate (|langs| rows), a 1-row broadcast
    total, scan-free arithmetic after that — the planner runs on
    aggregate statistics, never per-doc data."""
    t = load_tables(spark, sf_dir, ("documents",))
    counts = t["documents"].groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w_int = F.floor(
        F.sqrt(F.sqrt(F.col("n_docs").cast("double"))) * F.lit(10000.0)
        + F.lit(0.5)
    ).cast("bigint")
    weighted = counts.select("lang", "n_docs", w_int.alias("_w"))
    tot = weighted.agg(
        F.sum("_w").alias("_tw"),
        F.sum("n_docs").alias("_tn"),
    )
    out = weighted.crossJoin(F.broadcast(tot))
    p_nat = F.col("n_docs").cast("double") / F.col("_tn").cast("double")
    p_smooth = F.col("_w").cast("double") / F.col("_tw").cast("double")
    return out.select(
        "lang",
        "n_docs",
        rnd(p_nat, 4).alias("p_natural"),
        rnd(p_smooth, 4).alias("p_sampling"),
        rnd(p_smooth / p_nat, 4).alias("boost_vs_natural"),
        # NULLS LAST pinned on both sides: Spark default is nulls
        # first on ASC, DuckDB's is nulls last — a NULL lang would
        # flip an order-sensitive hash even with identical values
    ).orderBy(F.asc_nulls_last("lang"))


def kneser_ney_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    smoothing KenLM/CCNet-class LMs actually use, one model class up
    from the add-alpha bigram above): score each document by its mean
    ln p_KN(w2|w1) under the corpus's own bigram statistics, where

        p_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                      + (D * N1+(w1,.)/c(w1)) * N1+(.,w2)/N1+(.,.)

    with absolute discount D = 0.75 and continuation counts N1+ =
    distinct-neighbor counts. KN's continuation probability fixes the
    add-alpha failure mode: a word frequent only inside one collocation
    ("francisco") stops inflating unseen-context estimates.

    Relational shape, all derived FROM the bigram count table (never a
    second corpus pass): c12 = one hash agg on the bigram; c(w1) and
    N1+(w1,.) = one agg of c12 on w1; N1+(.,w2) = one agg of c12 on
    w2; N1+(.,.) = count(c12) broadcast as a 1-row total (the
    plan-pin-whitelisted corpus-total shape). Every term is an exact
    integer count and D is exactly representable, so both engines
    evaluate the identical IEEE expression tree — the oracle replays
    it verbatim. Self-scoring means every doc bigram exists in c12
    (c12 >= 1), so no OOV branch is needed."""
    t = load_tables(spark, sf_dir, ("documents",))
    # NOT spread: the bigram explode shuffles right after the scan, so
    # a pre-spread exchange only adds a round-robin pass ahead of the
    # c12 exchange (interleaved A/B: spread 4.08/3.07 s vs unspread
    # 2.52/2.20 s warm — a measured regression, reverted r13)
    d = t["documents"]
    ts = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = d.select("doc_id", ts.alias("_ts")).filter(F.size("_ts") >= 2)
    pair = F.transform(
        F.sequence(F.lit(1), F.size("_ts") - 1),
        lambda i: F.concat(
            F.element_at(F.col("_ts"), i),
            F.lit(" "),
            F.element_at(F.col("_ts"), i + 1),
        ),
    )
    doc_bg = docs.select("doc_id", F.explode(pair).alias("bg"))
    c12 = doc_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    by_w1 = c12.groupBy(
        F.substring_index("bg", " ", 1).alias("w1")
    ).agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1p_w1"),
    )
    by_w2 = c12.groupBy(
        F.substring_index("bg", " ", -1).alias("w2")
    ).agg(F.count(F.lit(1)).alias("n1p_w2"))
    n1p_all = c12.agg(F.count(F.lit(1)).alias("n1p_all"))
    disc = 0.75
    scored = (
        doc_bg.join(c12, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(by_w1, "w1")
        .join(by_w2, "w2")
        .crossJoin(F.broadcast(n1p_all))
        .select(
            "doc_id",
            F.log(
                F.greatest(
                    F.col("c12").cast("double") - F.lit(disc), F.lit(0.0)
                )
                / F.col("c1").cast("double")
                + (
                    (F.lit(disc) * F.col("n1p_w1").cast("double"))
                    / F.col("c1").cast("double")
                )
                * (
                    F.col("n1p_w2").cast("double")
                    / F.col("n1p_all").cast("double")
                )
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            rnd(F.avg("lp"), 4).alias("avg_logprob_kn"),
        )
        .orderBy("doc_id")
    )


def spatial_near_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join (1 km) over deterministic per-customer
    coordinates in the Chicago band — the grid-bucketed spatial pair
    finder whose DuckDB twin is the BRUTE-FORCE all-pairs join, so the
    oracle match doubles as an exact-recall proof of the one-ring grid
    cover (operators/spatial.py). Coordinates derive from md5 of the
    customer key (same engine-portable trick as mixture_rebalance)."""
    t = load_tables(spark, sf_dir, ("customer",))
    c = t["customer"]

    def coord(tag: str, base: float, span: float):
        m = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag + ":"), F.col("c_custkey").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return F.lit(base) + (m % 100000).cast("double") / F.lit(
            100000.0
        ) * F.lit(span)

    pts = c.select(
        F.col("c_custkey").alias("id"),
        coord("lat", 41.6, 0.5).alias("lat"),
        coord("lon", -87.9, 0.4).alias("lon"),
    )
    return spatial.spatial_near_pairs(
        pts, radius_km=1.0, band_max_abs_lat=42.1
    ).orderBy("id_a", "id_b")


def overlap_shipment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: pairs of lineitems for the SAME
    (supplier, part) whose shipping windows overlap — concurrent
    shipments of one part from one supplier. The window is
    [l_shipdate, l_shipdate + quantity%20 days] (the testdata schema
    carries no receipt date, so the hold period derives from
    quantity). Bin-bucketed equi-join (operators/rangejoin.py
    overlap_pairs); the DuckDB twin is the brute-force keyed
    theta-join, so parity proves the first-shared-bin dedup counts
    every overlapping pair exactly once."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    iv = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("li_id"),
        "l_suppkey",
        "l_partkey",
        F.col("l_shipdate").cast("date").alias("lo"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            F.col("l_quantity").cast("int") % 20,
        ).alias("hi"),
    )
    return rangejoin.overlap_pairs(
        iv,
        keys=["l_suppkey", "l_partkey"],
        lo_col="lo",
        hi_col="hi",
        id_col="li_id",
        bin_days=30,
    ).orderBy("id_a", "id_b")


def token_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-frequency Shannon entropy (nats) — the
    repetition detector in a quality stack: spam/boilerplate repeats
    tokens, driving entropy far below a natural-language document of
    the same length. Uses H = ln(n) - sum(c·ln c)/n so one grouped
    aggregate per doc computes it (no per-token probability join)."""
    t = load_tables(spark, sf_dir, ("documents",))
    toks = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(TX.tokens(F.lower(F.col("text")))).alias("tok"),
        )
        .filter(F.length("tok") > 0)
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("_slc"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        rnd(
            F.log(F.col("n").cast("double"))
            - F.col("_slc") / F.col("n").cast("double"),
            4,
        ).alias("entropy_nats"),
    ).orderBy("doc_id")


def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE sliding window (vs moving_avg_user_value's ROWS
    frame): per user, the sum/count of event values in the trailing
    hour — the frame is defined by event-time distance, so bursts
    widen the row count instead of the time span. Ordering key is
    epoch micros on both engines, making tie handling identical."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            rnd(F.sum("value").over(w), 4).alias("roll_sum_1h"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
        )
        .orderBy("user_id", "event_id")
    )


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein-1 name matching over customer names via
    symmetric-delete blocking (operators/fuzzy.py) — the DuckDB twin
    is the brute-force all-pairs levenshtein join, so parity doubles
    as an exact-recall proof of the delete-variant cover. Customer
    names ('Customer#000000042') near-collide on single-digit edits,
    a realistic entity-resolution workload."""
    from aws_de_final_project_spark.operators import fuzzy

    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    names = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    return fuzzy.fuzzy_pairs(names).orderBy("id_a", "id_b")


def rollup_incremental_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance == full recompute, as a
    driver-checkable query: split events into 3 arrival deltas
    (event_id mod 3), fold them through partial_aggs / merge_aggs
    (operators/rollup_maint.py), and derive avg at READ time from the
    stored sum/count. The DuckDB twin is the one-shot GROUP BY over
    all events, so parity proves merge(state, partial(delta)) ==
    recompute — the invariant that lets a 100 TB rollup refresh touch
    only the day's delta instead of rescanning history."""
    from aws_de_final_project_spark.operators import rollup_maint as RM

    measures = [
        ("total_value", "value", "sum"),
        ("n_events", "value", "count"),
        ("min_value", "value", "min"),
        ("max_value", "value", "max"),
    ]
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", "user_id", "value"
    )
    state = None
    for i in range(3):
        part = RM.partial_aggs(
            ev.filter(F.col("event_id") % 3 == i), ["user_id"], measures
        )
        state = (
            part
            if state is None
            else RM.merge_aggs(state, part, ["user_id"], measures)
        )
    # avg derives from the ROUNDED total: the merged sum can differ
    # from the one-shot sum in the last ulp (addition order), and a
    # quotient landing exactly on the 4dp boundary would then round
    # apart; dividing bit-identical rounded doubles cannot
    total_r = rnd(F.col("total_value"), 4)
    return state.select(
        "user_id",
        total_r.alias("total_value"),
        "n_events",
        F.col("min_value"),
        F.col("max_value"),
        rnd(
            F.when(F.col("n_events") > 0, total_r / F.col("n_events")),
            4,
        ).alias("avg_value"),
    ).orderBy("user_id")


def rollup_incremental_user_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VERDICT r2 #7: the incremental-rollup algebra extended to the
    second moment — variance derives at READ time from three
    sum-mergeable states (sum, count, sum-of-squares), so a 100 TB
    dashboard's stddev refreshes from the day's delta like any plain
    sum. Same 3-delta fold as rollup_incremental_user_stats; the
    DuckDB twin is the one-shot GROUP BY, so parity proves the moment
    algebra merges exactly. Both engines compute variance from the
    SAME 4dp-rounded moments with the same IEEE op sequence
    (mul, not pow), keeping the quotient deterministic."""
    from aws_de_final_project_spark.operators import rollup_maint as RM

    measures = [
        ("s1", "value", "sum"),
        ("n_events", "value", "count"),
        ("s2", "value", "sumsq"),
    ]
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", "user_id", "value"
    )
    state = None
    for i in range(3):
        part = RM.partial_aggs(
            ev.filter(F.col("event_id") % 3 == i), ["user_id"], measures
        )
        state = (
            part
            if state is None
            else RM.merge_aggs(state, part, ["user_id"], measures)
        )
    s1r = rnd(F.col("s1"), 4)
    s2r = rnd(F.col("s2"), 4)
    n = F.col("n_events")
    mean = s1r / n
    return state.select(
        "user_id",
        s1r.alias("sum_value"),
        "n_events",
        rnd(
            F.when(n > 0, s2r / n - mean * mean),
            4,
        ).alias("var_value"),
    ).orderBy("user_id")


def semi_join_fast_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the EXISTS shape the §2 set-op family lacked
    (anti_join_idle_customers covers NOT EXISTS): parts that shipped
    at quantity >= 45 at least once. Semi join keeps the probe side's
    columns only and short-circuits on first match, so no dedup pass
    and no row blowup however many lineitems match — at 100 TB that
    beats the inner-join+distinct rewrite by the full fan-out factor.
    Oracle: correlated EXISTS."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    big = t["lineitem"].filter(F.col("l_quantity") >= 45)
    p = t["part"]
    return (
        p.join(big, p.p_partkey == big.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")
    )


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): part's numeric columns melted to
    (metric, value) rows — the inverse of pivot_event_matrix, and the
    shape feature stores / metric sinks ingest. Spark's unpivot is a
    zero-shuffle Expand node (each input row emits k output rows in
    the scan stage); the oracle is the UNION ALL rewrite."""
    t = load_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


def repetition_top_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: per document, the fraction of
    all word 2-grams taken by the single most frequent 2-gram (a
    boilerplate/looping-text detector — docs above ~0.18 are
    repetitive junk in the Gopher rules). Bigrams build scan-side
    from the token array (transform over an index sequence — no
    self-join of token positions), then one per-(doc, bigram) count
    and one per-doc max/sum. Shuffle volume is distinct bigrams per
    doc, not tokens squared.

    The token array MUST be materialized in its own projection before
    the HOF touches it: referencing the ``split(...)`` expression
    inside the lambda re-evaluates the split per element access
    (measured 6.5 s -> 1.9 s at sf0.1 for this one change —
    common-subexpression elimination does not reach into interpreted
    HOF lambdas)."""
    t = load_tables(spark, sf_dir, ("documents",))
    toksd = t["documents"].select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.element_at("toks", i + 1),
                              F.element_at("toks", i + 2)),
    )
    per_bg = (
        toksd.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_bg.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_count",
            rnd(
                F.col("top_count").cast("double") / F.col("n_bigrams"),
                4,
            ).alias("top_frac"),
        )
        .orderBy("doc_id")
    )


def pii_redact_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style regex redaction as a scan-stage transform: digit
    runs in c_name replaced with '<NUM>', plus audit counts (runs
    redacted, characters removed). Pure codegen regexp — the pattern
    is deliberately RE2-compatible so the DuckDB oracle runs the
    byte-identical regex; at 100 TB this is a free rider on the
    ingest scan, not a separate pass."""
    t = load_tables(spark, sf_dir, ("customer",))
    name = F.col("c_name")
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.regexp_replace(name, "[0-9]+", "<NUM>").alias("redacted"),
            F.regexp_count(name, F.lit("[0-9]+")).alias("n_runs"),
            (
                F.length(name)
                - F.length(F.regexp_replace(name, "[0-9]", ""))
            ).alias("digits_removed"),
        )
        .orderBy("c_custkey")
    )


def band_join_order_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (band/theta) join done the only way it scales: the
    tiny tier table is broadcast, so the inequality predicate runs as
    a BroadcastNestedLoopJoin — |fact| x |tiers| comparisons streamed
    map-side, zero shuffle of the fact. The same join WITHOUT a
    broadcastable side is the O(n^2) trap the range-join operator
    exists for (operators/rangejoin.py); this entry covers the
    legitimate small-side case. Tiers are half-open [lo, hi) so
    boundary prices land in exactly one tier."""
    t = load_tables(spark, sf_dir, ("orders",))
    tiers = spark.createDataFrame(
        [
            ("bronze", 0.0, 50_000.0),
            ("silver", 50_000.0, 150_000.0),
            ("gold", 150_000.0, 300_000.0),
            ("platinum", 300_000.0, 1e18),
        ],
        "tier string, lo double, hi double",
    )
    o = t["orders"]
    joined = o.join(
        F.broadcast(tiers),
        (o.o_totalprice >= tiers.lo) & (o.o_totalprice < tiers.hi),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("tier")
    )


def order_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank / cume_dist /
    ntile were the §2.9 family's remaining gap): each order's price
    standing within its customer's nation-agnostic history. Both
    functions are rank arithmetic over the same sort — one window, one
    shuffle; deterministic because the ORDER BY is tie-broken by the
    unique key."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            rnd(F.col("o_totalprice"), 2).alias("price"),
            rnd(F.percent_rank().over(w), 4).alias("pct_rank"),
            rnd(F.cume_dist().over(w), 4).alias("cume"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def recursive_org_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.x) — transitive closure
    over a derived hierarchy: parent(c) = c DIV 10 makes every custkey
    a node in a tree rooted at 0, and the recursion walks root-to-leaf
    computing each node's depth. Iterative self-union under the hood
    (same execution family as the components loop, but expressed in
    pure SQL); terminates because parent < child everywhere. DuckDB
    runs the identical recursion (// is its integer division)."""
    t = load_tables(spark, sf_dir, ("customer",))
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE chain(custkey, depth) AS (
            SELECT CAST(c_custkey AS BIGINT), 0
            FROM customer WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, ch.depth + 1
            FROM customer c JOIN chain ch
              ON (c.c_custkey DIV 10) = ch.custkey
            WHERE c.c_custkey > 0
        )
        SELECT custkey, depth FROM chain ORDER BY custkey
        """
    )


def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram per order status — the aggregation shape
    behind every dashboard distribution plot. Binning is plain floor
    arithmetic over a fixed [0, 400k) domain (no width_bucket, no
    percentile pass), so the whole histogram is ONE hash aggregate
    with map-side partials — at 100 TB the shuffle is
    |statuses| x |bins| rows, independent of order count. Out-of-range
    values clamp into the edge bins to keep the bin count fixed."""
    t = load_tables(spark, sf_dir, ("orders",))
    lo, hi, nbins = 0.0, 400_000.0, 20
    w = (hi - lo) / nbins
    b = F.floor((F.col("o_totalprice") - F.lit(lo)) / F.lit(w))
    bin_id = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), b)).cast("int")
    return (
        t["orders"]
        .groupBy("o_orderstatus", bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus", "bin")
    )


def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow 2-D band query over a Z-order-clustered copy of events —
    the query-visible face of :func:`...sources.registry.write_zordered`
    (VERDICT r4 #4: the skipping win was proven only inside
    tests/test_zorder.py; this makes it an oracled entry).

    The entry writes events (event_id, user_id, value) z-ordered on
    (user_id, value), reads it back and answers a tight box predicate
    on BOTH clustered dimensions. Correctness is layout-invariant, so
    the DuckDB twin runs the same filter+agg on the raw table; the
    file-skipping claim is pinned separately in tests/test_zorder.py
    (footer envelopes of THIS dataset vs THIS predicate box) and the
    PushedFilters plan pin in tests/test_plan_shapes.py. At 100 TB
    the clustered write is the one-off layout job (Delta/Iceberg
    OPTIMIZE ZORDER); every band query after it touches the few files
    whose envelopes intersect the box instead of the whole table."""
    import os
    import tempfile

    from aws_de_final_project_spark.sources.registry import write_zordered

    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select("event_id", "user_id", "value")
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_zorder_events_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    write_zordered(ev, path, ["user_id", "value"], n_partitions=16)
    back = spark.read.parquet(path)
    return (
        back.filter(
            (F.col("user_id") >= 10)
            & (F.col("user_id") < 40)
            & (F.col("value") >= 50.0)
            & (F.col("value") < 150.0)
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


def dedup_incremental_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup == one-shot arrival-order dedup, as a
    driver-checkable query: split documents into 3 arrival batches
    (doc_id mod 3), fold them through
    operators/dedup.dedup_against_state with an initially-empty
    fingerprint registry, and return every admitted (doc_id,
    fingerprint). The DuckDB twin ranks all docs per fingerprint by
    (arrival batch, doc_id) and keeps rank 1 — parity proves the fold
    admits exactly the first-arrival copy of every distinct content,
    the invariant that lets a daily 100 TB ingest dedup against
    history by anti-joining a compact registry instead of rescanning
    the corpus."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    state = spark.createDataFrame([], "fp string, keeper_id long")
    kept_all = None
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == i)
        kept, state = dedup.dedup_against_state(batch, state, "text", "doc_id")
        kept_all = kept if kept_all is None else kept_all.unionByName(kept)
    return kept_all.select(
        "doc_id", F.col("fp").alias("fingerprint")
    ).orderBy("doc_id")


def quality_topq_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source median-quality gate (keep each source's top half by
    quality score) via operators/curation.quantile_quality_filter —
    threshold from one exact-percentile aggregate broadcast back, not
    a per-source window (which would funnel each source's whole corpus
    share through one partition). The 4dp score quantization keeps the
    exact percentile a ~10k-distinct-value count-map: map-side
    combinable, independent of corpus size."""
    from aws_de_final_project_spark.operators.curation import (
        quantile_quality_filter,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    return quantile_quality_filter(
        t["documents"], group_col="source", q=0.5
    ).orderBy("doc_id")


def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-status outlier flags on order totals
    (operators/dq.mad_outliers): |x - median| > 3 * 1.4826 * MAD —
    the monitor that doesn't move with the outliers it hunts. Two
    exact-percentile aggregates broadcast back; flag is scan-stage."""
    from aws_de_final_project_spark.operators.dq import mad_outliers

    o = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = mad_outliers(o, "o_totalprice", "o_orderstatus", k=3.0)
    # monitor-shaped summary: one row per group whether or not any
    # value breaches (TPC-H's bounded-uniform prices legitimately
    # have zero 3-MAD outliers — a per-row listing would be empty)
    return (
        out.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
            rnd(F.max("group_median"), 2).alias("group_median"),
            rnd(F.max("mad"), 2).alias("mad"),
            rnd(
                F.max(
                    F.abs(F.col("o_totalprice") - F.col("group_median"))
                    / F.col("mad")
                ),
                4,
            ).alias("max_mad_ratio"),
        )
        .orderBy("o_orderstatus")
    )


def ivm_join_view_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance == one-shot join, as a
    driver-checkable query: orders and customers each arrive in 3
    insert batches (key mod 3); the orders-x-customer view advances
    per round by the three delta-sized joins of operators/ivm.py —
    the full join is never recomputed. The DuckDB twin is the
    one-shot join over everything, so parity proves the delta algebra
    loses and duplicates nothing."""
    from aws_de_final_project_spark.operators import ivm

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    cust = t["customer"].select("c_custkey", "c_name", "c_nationkey")
    o_b = [
        orders.filter(F.col("o_orderkey") % 3 == i).withColumnRenamed(
            "o_custkey", "custkey"
        )
        for i in range(3)
    ]
    c_b = [
        cust.filter(F.col("c_custkey") % 3 == i).withColumnRenamed(
            "c_custkey", "custkey"
        )
        for i in range(3)
    ]
    view = ivm.fold_join_view(o_b, c_b, ["custkey"])
    return view.select(
        "o_orderkey",
        "custkey",
        rnd(F.col("o_totalprice"), 2).alias("total_price"),
        "c_name",
        "c_nationkey",
    ).orderBy("o_orderkey")


def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization of event values into the [p5, p95]
    exact-percentile envelope (operators/dq.winsorize): one tiny
    percentile aggregate broadcast back + a codegen clamp — the
    standard outlier treatment before feature training, with no
    window and no second scan."""
    from aws_de_final_project_spark.operators.dq import winsorize

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", "event_type", "value"
    )
    out = winsorize(ev, "value", "event_type", p_lo=0.05, p_hi=0.95)
    return out.select(
        "event_id",
        "event_type",
        "value",
        rnd(F.col("winsorized"), 4).alias("winsorized"),
        rnd(F.col("lo_bound"), 4).alias("lo_bound"),
        rnd(F.col("hi_bound"), 4).alias("hi_bound"),
    ).orderBy("event_id")


def ann_matryoshka_prefix_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style truncation evaluation: recall@10 of exact
    cosine search over the FIRST 16 dimensions vs the full vector —
    the measurement that decides whether a prefix-truncated (4x
    cheaper) index is good enough. Two exact rankings (one corpus
    scan each, broadcast queries), a left-semi overlap join, one
    per-query count. Deterministic end to end, so fully oracled."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = similarity.cosine_topk(emb, qs, k=10)
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    qs16 = qs.select("query_id", F.slice("embedding", 1, 16).alias("embedding"))
    pre = similarity.cosine_topk(emb16, qs16, k=10)
    overlap = pre.join(
        full.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    hits = overlap.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        qs.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            rnd(
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / F.lit(10.0),
                4,
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


def drift_psi_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators/dq.psi_drift): PSI of
    the value distribution per event type, first half of the month
    (reference) vs second half (current), 32 bins over [0, 640). One
    hash aggregate bins both slices; DATE comparison keeps the split
    session-timezone-independent."""
    from aws_de_final_project_spark.operators.dq import psi_drift

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return psi_drift(
        ev,
        "value",
        F.to_date("ts") >= F.lit("2024-01-16").cast("date"),
        "event_type",
        lo=0.0,
        hi=640.0,
        n_bins=32,
    ).orderBy("event_type")


def shard_docs_by_token_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budget-balanced shard assignment for training export
    (segments.shard_by_token_budget): global exclusive prefix sum of
    token counts computed with the two-phase scan (per-bucket totals
    -> tiny offsets window -> bounded within-bucket windows), never a
    single-partition global window. Integer arithmetic throughout, so
    the DuckDB twin is a plain global cumulative window."""
    from aws_de_final_project_spark.operators.segments import (
        shard_by_token_budget,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select(
        "doc_id", TX.token_count("text").alias("_tok")
    )
    return shard_by_token_budget(
        docs, "doc_id", "_tok", budget=2000, bucket_size=64
    ).orderBy("doc_id")


def dedup_corpus_quality_keepers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end curation composition: near-dup clusters (connected
    components over exact 3-gram-Jaccard edges) + per-cluster KEEPER
    SELECTION BY QUALITY — keep the best-scoring copy, not the
    arbitrary min-id one — the final artifact a dedup pipeline ships.
    Output: (component, keeper_id, n_members, keeper_quality). One
    window over the component key after the clustering; quality is
    the 4dp-deterministic scan-stage score, so the whole composition
    replays in DuckDB (recursive-CTE closure + same window)."""
    from pyspark.sql.window import Window

    from aws_de_final_project_spark.functions.text import quality_score

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, block_col="lang"
    )
    comp = dedup.dedup_components(docs, pairs, "doc_id", impl="auto")
    scored = docs.select("doc_id", quality_score("text").alias("_q"))
    j = comp.join(scored, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("_q"), F.asc("doc_id")
    )
    wc = Window.partitionBy("component")
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keeper_id"),
            "n_members",
            F.col("_q").alias("keeper_quality"),
        )
        .orderBy("component")
    )


def rollup_incremental_value_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental-rollup algebra extended to QUANTILES: a dense
    fixed-bin histogram (64 x 10-wide bins over value) is the stored,
    exactly-mergeable state — integer bin counts sum element-wise, so
    merge(state, partial(delta)) == recompute bit-for-bit — and
    p50/p90 derive at READ time by in-bin linear interpolation
    (rollup_maint.hist_quantile). Same 3-delta fold as the other
    rollup entries; the DuckDB twin recomputes the histogram one-shot
    from the full table, so parity proves both the merge exactness
    and the estimator."""
    from aws_de_final_project_spark.operators import rollup_maint as RM

    kind = "hist:0.0:640.0:64"
    measures = [("vhist", "value", kind)]
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", "event_type", "value"
    )
    state = None
    for i in range(3):
        part = RM.partial_aggs(
            ev.filter(F.col("event_id") % 3 == i), ["event_type"], measures
        )
        state = (
            part
            if state is None
            else RM.merge_aggs(state, part, ["event_type"], measures)
        )
    both = RM.hist_quantiles(
        state, ["event_type"], "vhist", kind, {"_p50": 0.5, "_p90": 0.9}
    )
    return both.select(
        "event_type",
        rnd(F.col("_p50"), 4).alias("p50_value"),
        rnd(F.col("_p90"), 4).alias("p90_value"),
    ).orderBy("event_type")


def pagerank_trade_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-to-nation trade graph
    (operators/graphrank.trade_pagerank): edge derivation is the
    data-sized 4-way join + aggregate; ten fixed rank iterations run
    over the 25-node edge aggregate with uniform dangling-mass
    redistribution. Fixed iteration count makes the program identical
    in DuckDB (unrolled MATERIALIZED CTEs)."""
    from aws_de_final_project_spark.operators import graphrank

    t = load_tables(
        spark, sf_dir,
        ("nation", "customer", "supplier", "orders", "lineitem"),
    )
    return graphrank.trade_pagerank(
        t["nation"], t["customer"], t["supplier"],
        t["orders"], t["lineitem"],
    )


def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage int8-quantized retrieval (similarity.int8_ann_topk):
    quantized-dot prefilter to top-40 per query, exact-cosine re-rank
    to top-10 — same query set as ann_cosine_topk so recall is
    directly comparable. Every quantization step is IEEE-exact, so
    the full two-stage pipeline carries a DuckDB oracle."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.int8_ann_topk(
        emb, qs, k=10, refine_factor=4
    ).orderBy("query_id", "rank")


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample, 10 docs per source, via
    operators/curation.weighted_sample (Efraimidis-Spirakis keys from
    md5 uniforms — reproducible across engines/partitionings, no RNG
    state; inclusion probability proportional to n_chars)."""
    from aws_de_final_project_spark.operators.curation import weighted_sample

    t = load_tables(spark, sf_dir, ("documents",))
    return weighted_sample(
        t["documents"], "n_chars", k=10, stratum_col="source"
    ).orderBy("source", "doc_id")


def hard_negatives_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining over the embeddings table: every 50th
    vector anchors a top-5 search for the most-similar vectors of a
    DIFFERENT label (similarity.hard_negatives_topk — broadcast
    anchors, one corpus scan, no shuffle before the per-anchor
    ranking)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    anchors = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    return similarity.hard_negatives_topk(
        emb, anchors, k=5
    ).orderBy("anchor_id", "rank")


def pca_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-component PCA projection of the embeddings table via
    operators/embedlin.pca_project — covariance as a relation, eight
    unrolled power-iteration matvecs per component (deflation between
    them), projection broadcast back. impl='sql' pinned so the DuckDB
    twin replays the identical arithmetic; the wide-dim default is the
    Arrow partial-Gram kernel (auto-dispatch at dim >= 256)."""
    from aws_de_final_project_spark.operators import embedlin

    t = load_tables(spark, sf_dir, ("embeddings",))
    dim = embedding_dim(sf_dir)
    return embedlin.pca_project(
        t["embeddings"], "embedding", "vec_id", dim,
        n_components=2, n_iter=8, impl="sql",
    ).orderBy("vec_id")


def dedup_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-substring pairs (suffix-array-style substring
    dedup re-expressed relationally): document pairs sharing a
    verbatim run of >= 12 normalized tokens, with the longest run
    length. Catches copied passages that set-similarity dedup
    (jaccard/minhash) under-scores by construction. Fully
    oracle-checkable — anchors are md5, runs are gaps-and-islands
    windows, both engine-portable."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.exact_span_pairs(
        t["documents"], "text", "doc_id", k=8, min_span_tokens=12
    ).orderBy("doc_a", "doc_b")


def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter tokens (count > 0.5% of all token
    occurrences) via the two-pass Misra-Gries scheme in
    ``operators/curation.heavy_hitter_keys`` — stopword discovery
    without a full-vocabulary shuffle. The oracle is the brute-force
    GROUP BY/HAVING; output equality proves the candidate superset
    guarantee + exact recount."""
    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    toks = t["documents"].select(
        F.explode(
            F.split(TX.normalized_text("text"), " ")
        ).alias("token")
    )
    return curation.heavy_hitter_keys(
        toks, "token", support=0.005
    ).orderBy(F.desc("cnt"), "token")


def triangle_parts_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph
    (parts bought together in at least one order), via degree-ordered
    triangle enumeration (operators/graphrank.triangle_counts). The
    orientation bounds wedge volume by m*sqrt(2m) no matter how
    skewed part popularity gets — the hub-part blowup the naive
    wedge join would hit. Oracle: the direct three-way edge join."""
    from aws_de_final_project_spark.operators import graphrank

    t = load_tables(spark, sf_dir, ("lineitem",))
    # pairs are generated INSIDE each order's sorted part array (codegen
    # nested transform over the <=7-item basket) — one hash aggregate
    # instead of an orderkey equi-self-join; basket size bounds the
    # per-row pair fan-out, so there is no skew surface. collect_set
    # dedups (orderkey, partkey) itself, so no pre-distinct shuffle.
    parts = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_ps"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("_ps"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_ps"), i + 2, F.size(F.col("_ps"))
                ),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    edges = (
        parts.select(F.explode(pair_structs).alias("_e"))
        .select("_e.src", "_e.dst")
    )
    return (
        graphrank.triangle_counts(edges, "src", "dst")
        .select(F.col("node").alias("part_id"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "part_id")
    )


def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of documents for a fixed query (Robertson-Sparck
    Jones weighting, Lucene's +1 IDF so weights stay positive;
    k1=1.2, b=0.75). The retrieval-side twin of tfidf_top_terms:
    term frequencies come from ONE scan-side filter (the query terms
    are a literal isin list, so the corpus never shuffles on tokens),
    document frequencies and the average doc length are tiny
    aggregates broadcast back. Score sums <= |query| terms per doc."""
    k1, b = 1.2, 0.75
    terms = ["data", "model", "system"]
    t = load_tables(spark, sf_dir, ("documents",))
    toks = t["documents"].select(
        "doc_id",
        F.explode(
            F.split(TX.normalized_text("text"), " ")
        ).alias("token"),
    )
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_dl"))
    stats = dlen.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    qtoks = toks.where(F.col("token").isin(terms))
    tf = qtoks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("_df")
    )
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.log(
                (F.col("_n") - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5)
                + 1.0
            ).alias("_idf"),
            "_avgdl",
        )
    )
    return (
        tf.join(F.broadcast(idf), "token")
        .join(dlen, "doc_id")
        .select(
            "doc_id",
            (
                F.col("_idf")
                * (F.col("_tf") * (k1 + 1))
                / (
                    F.col("_tf")
                    + k1
                    * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("doc_id")
        .agg(rnd(F.sum("_s"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
    )


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> document frequency + sorted
    posting list of doc ids — the index artifact behind bm25_doc_scores
    and boolean retrieval, materialized as a relation. One explode +
    hash aggregate on the token; postings stay bounded because a
    posting list is by definition the doc-frequency long — the heavy
    hitters (stopwords) that would skew it are exactly what
    heavy_hitter_tokens identifies for a stop list. The posting list
    is serialized to a comma-joined string (numeric sort first, then
    stringify) so the output schema is flat — the driver's pandas
    canonicalizer cannot hash array-typed cells, and the no-array
    output contract is pinned in tests/test_entry_contract.py."""
    t = load_tables(spark, sf_dir, ("documents",))
    toks = t["documents"].select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(TX.normalized_text("text"), " ")
            )
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy("token")
    )


def entity_resolution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: levenshtein-1 name matching
    (delete-variant blocking, operators/fuzzy.py) -> connected
    components (pointer-doubling min-label, operators/dedup.py) ->
    canonical id per cluster (min member id) with an is_canonical
    flag. Matches are blocked on nation (the linkage rule: same
    country AND near-identical name — unblocked, sequential customer
    names chain the whole table into one degenerate cluster). The
    composition a record-linkage pipeline actually ships — each stage
    is individually oracled; this entry pins the whole chain against
    a brute-force-join + recursive-CTE-closure twin."""
    from aws_de_final_project_spark.operators import fuzzy

    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    names = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    nat = c.select(
        F.col("c_custkey").alias("_k"), F.col("c_nationkey").alias("_nk")
    )
    pairs = (
        fuzzy.fuzzy_pairs(names, "id", "name")
        .join(
            nat.select(
                F.col("_k").alias("id_a"), F.col("_nk").alias("_nk_a")
            ),
            "id_a",
        )
        .join(
            nat.select(
                F.col("_k").alias("id_b"), F.col("_nk").alias("_nk_b")
            ),
            "id_b",
        )
        .where(F.col("_nk_a") == F.col("_nk_b"))
    )
    return (
        # auto dispatch: the blocked pair list is aggregation-sized
        # (a few edges per entity regardless of input scale) so the
        # driver union-find runs — its min-label propagation distance
        # at sf0.1 is 26 rounds, 26 shuffle rounds relationally vs
        # microseconds in union-find (same rationale as
        # graphrank.pagerank iter_impl; equivalence pinned in
        # tests/test_dedup.py). If a pathological blocking key ever
        # pushes pairs past the 2M cap, 'auto' falls back to the
        # distributed pointer-doubling path instead of raising.
        dedup.dedup_components(
            names, pairs, "id", "id_a", "id_b", impl="auto"
        )
        .select(
            F.col("id").alias("c_custkey"),
            F.col("component").alias("canonical_id"),
            F.col("is_keeper").alias("is_canonical"),
        )
        .orderBy("c_custkey")
    )


def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ('customer join'): documents containing the
    word sequence, with non-overlapping occurrence counts — computed
    by the codegen length-difference scan in
    functions/text.phrase_occurrences (no explode, no join: the
    filter runs scan-side and would push straight onto a 100 TB scan).
    Complements bm25_doc_scores (bag-of-words) with order-sensitive
    matching."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .select(
            "doc_id",
            TX.phrase_occurrences("text", "customer join").alias(
                "n_occurrences"
            ),
        )
        .where(F.col("n_occurrences") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Count-min sketch + Johnson-Lindenstrauss projection (round 6)
# ---------------------------------------------------------------------------

_CMS_ROWS = 4
_CMS_WIDTH = 512


def _cms_bucket(r: int, tok) -> F.Column:
    """Row-r count-min bucket of a token: first 60 bits of
    md5('cms{r}:' || token) mod width — bit-identical in DuckDB via
    ``('0x' || substr(md5('cms' || r || ':' || token), 1, 15))::BIGINT
    % width`` (same recipe as the portable MinHash family)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{r}:"), tok)), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(_CMS_WIDTH),
    )


def sketch_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) frequency estimates
    for the corpus's 30 most frequent tokens, next to their exact
    counts — the row exhibits the sketch's one-sided error
    (cms_est >= exact_n always; equality when no bucket collision).

    The sketch itself is the scale story: its state is rows x width
    = 4 x 512 counters REGARDLESS of vocabulary size, built by one
    groupBy over (row, bucket) whose map-side partial aggregation
    collapses each task's token stream to <= 2048 cells before the
    shuffle — at 100 TB the shuffle moves ~2048 rows per task, not
    the vocabulary. The exact GROUP BY token twin column exists only
    to exhibit the estimator's error in the output (same pattern as
    sketch_kmv_distinct_portable's exact_users); a production sketch
    drops it and keeps the vocabulary-independent path only.

    Portable md5 hash family -> FULL DuckDB oracle: cell counts, the
    top-30 query set, and every min-over-rows estimate replay
    bit-identically."""
    t = load_tables(spark, sf_dir, ("documents",))
    toks = (
        # 1-file scan = 1 task: parallelize tokenization + bucket hashing
        spread(t["documents"])
        .select(
            F.explode(F.split(TX.normalized_text("text"), " ")).alias("token")
        )
        .where(F.col("token") != "")
    )
    # one occurrence -> _CMS_ROWS (row, bucket) increments; count per
    # cell. Map-side combine bounds the shuffle at rows*width cells
    # per task.
    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_bucket(r, F.col("token")).alias("b"),
                        )
                        for r in range(_CMS_ROWS)
                    ]
                )
            ).alias("rb")
        )
        .select("rb.r", "rb.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # the deliberately-exact twin: top-30 tokens by true count
    # (ties broken by token) — exists to exhibit estimator error.
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(30)
    )
    probes = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(r, F.col("token")).alias("b"),
                    )
                    for r in range(_CMS_ROWS)
                ]
            )
        ).alias("rb"),
    ).select("token", "exact_n", "rb.r", "rb.b")
    return (
        F.broadcast(probes)
        .join(cells, ["r", "b"])
        .groupBy("token", "exact_n")
        .agg(F.min("n").alias("cms_est"))
        .orderBy(F.desc("exact_n"), "token")
    )


_JL_DIM = 64
_JL_OUT = 16


def jl_sign_bank() -> list[list[float]]:
    """Deterministic Rademacher (+1/-1) projection matrix for the
    64->16 JL transform: sign(j, k) = parity of the first hex digit
    of md5('jl:{j}:{k}'). Driver-side literals, so the SAME floats
    interpolate into both the Spark literal bank and the DuckDB twin
    (the hyperplane-bank recipe from operators/similarity.py)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"jl:{j}:{k}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1.0
            for j in range(_JL_DIM)
        ]
        for k in range(_JL_OUT)
    ]


def jl_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection of the embedding
    corpus from 64 to 16 dims with a deterministic Rademacher sign
    matrix, scaled by 1/sqrt(16) (Achlioptas 2003: +-1 entries
    preserve pairwise distances with the same JL guarantee as
    Gaussian ones, and the projection is a pure +-sum — no
    multiplies). Output long-form (vec_id, dim, val 4dp).

    The data-independent counterpart of pca_embedding_projection:
    zero training passes, zero shuffles — the whole transform is 16
    zip_with/aggregate folds in whole-stage codegen applied
    scan-side, so at 100 TB it runs at scan speed with no exchange
    at all (the explode to long form is also narrow). The sign bank
    is built once driver-side as ONE parsed F.expr literal bank
    (similarity._dot_lit_sql — per-plane py4j round trips measured
    to dominate otherwise).

    Fully oracle-checked: DuckDB replays the identical signs
    (list_dot_product on the same float64 literals) and the same
    left-to-right double fold; 4dp rounding absorbs the last-bit
    difference between fold orders (the ann_cosine_topk precedent)."""
    from aws_de_final_project_spark.operators.similarity import _dot_lit_sql

    t = load_tables(spark, sf_dir, ("embeddings",))
    signs = jl_sign_bank()
    scale = 1.0 / float(_JL_OUT) ** 0.5  # 0.25: exact in binary
    proj = F.expr(
        "array("
        + ",".join(
            f"({_dot_lit_sql('embedding', signs[k])}) * {scale!r}D"
            for k in range(_JL_OUT)
        )
        + ")"
    ).alias("_p")
    return (
        t["embeddings"]
        .select("vec_id", proj)
        .select("vec_id", F.posexplode("_p").alias("dim", "_v"))
        .select(
            "vec_id",
            F.col("dim").cast("int").alias("dim"),
            rnd(F.col("_v"), 4).alias("val"),
        )
        .orderBy("vec_id", "dim")
    )


def basket_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    part pair co-purchased in >= 3 orders, exact support counts,
    confidence of the a->b rule, and lift
    (P(ab) / (P(a)·P(b))) — the affinity-analysis capability
    (frequent-itemset mining at the pair level). Output: top-30
    pairs by lift (ties by part ids).

    Scale shape: pairs are generated INSIDE each order's sorted part
    array (the same codegen nested-transform as the co-purchase
    graph — basket size bounds fan-out, no self-join, no skew
    surface); pair support is one hash aggregate, item support
    another, and both attach back via broadcast-sized frames only
    AFTER the min-support filter cuts the pair set to the frequent
    tail. The denominator (order count) is a 1-row broadcast. At
    100 TB nothing here materializes more than (pairs-per-basket ·
    rows) before a map-side-combined aggregate."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    # ONE lineitem aggregate: collect_set dedups (orderkey, partkey)
    # itself, and the denominator + per-item supports both derive
    # from the basket frame — the pre-distinct shuffle, the separate
    # distinct-orderkey scan, and the separate item-support scan all
    # collapse into this aggregate (r13: 3 corpus-width shuffles -> 1).
    baskets = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_ps"))
        .localCheckpoint(eager=False)
    )
    # 1-row denominator frame, broadcast-crossed in lazily (the
    # plan-build .count() alternative makes warm == cold, VERDICT r1):
    # every order has >= 1 part row, so |baskets| == |distinct orders|
    n_orders = F.broadcast(
        baskets.agg(F.count(F.lit(1)).cast("double").alias("_no"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("_ps"),
            lambda x, i: F.transform(
                F.slice(F.col("_ps"), i + 2, F.size(F.col("_ps"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pair_n = (
        baskets.select(F.explode(pair_structs).alias("_e"))
        .select("_e.a", "_e.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    # per-item order support from the SAME basket frame (set-exploded,
    # so each (order, part) counts once — identical to the old
    # distinct-scan aggregate)
    item_n = (
        baskets.select(F.explode("_ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    )
    na = item_n.select(F.col("l_partkey").alias("a"), F.col("n_i").alias("n_a"))
    nb = item_n.select(F.col("l_partkey").alias("b"), F.col("n_i").alias("n_b"))
    return (
        pair_n.join(na, "a")
        .join(nb, "b")
        .crossJoin(n_orders)
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            rnd(F.col("n_ab") / F.col("_no"), 6).alias("support"),
            rnd(F.col("n_ab") / F.col("n_a"), 4).alias("confidence"),
            rnd(
                (F.col("n_ab") * F.col("_no"))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "a", "b")
        .limit(30)
    )


def chunk_text_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: split each document at positions
    where the rolling 8-gram's md5 ≡ 0 (mod 64) — boundaries depend
    only on LOCAL content, so an edit or shift early in a document
    moves at most the chunk it touches while every later chunk keeps
    its identity (the shift-stability fixed-width windows lack, and
    the property that makes chunk-level dedup survive re-crawls;
    pinned in tests/test_segments.py). Avg chunk ~64 chars + the
    8-char gram. Output: (doc_id, chunk_idx, start_pos 1-based,
    chunk_len, chunk_fp md5).

    Scale shape: the ENTIRE operator is scan-side codegen — the
    boundary scan is a HOF filter over a position sequence inside
    the row, chunk extraction a zip/explode of the per-row boundary
    array; there is NO shuffle anywhere except the output ordering.
    At 100 TB it runs at scan speed. A production variant adds
    min/max chunk-size guards (a sequential greedy pass — the
    mapInPandas escape hatch); the pure content-only form here keeps
    the whole operator in codegen and the oracle exact. Portable md5
    family -> FULL DuckDB oracle (boundaries, chunk texts, and
    fingerprints replay bit-identically)."""
    k = 8
    mod = 64
    t = load_tables(spark, sf_dir, ("documents",))

    def is_boundary(i):
        gram = F.col("text").substr(i - F.lit(k - 1), F.lit(k))
        h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        return F.pmod(h, F.lit(mod)) == 0

    n = F.length("text")
    # sequence() auto-steps DOWN when start > stop — guard short docs
    bounds = F.when(
        n >= k,
        F.filter(F.sequence(F.lit(k), n), is_boundary),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(0)), F.col("_b"))
    ends = F.concat(F.col("_b"), F.array(n))
    # Fingerprint each chunk IN-ROW (transform over the pair array)
    # and DROP text before exploding: the naive explode-then-substr
    # carried the full document text on every chunk row — an
    # O(chunks x doc_len) intermediate the x30 probe caught going
    # superlinear (12.6 s vs a ~4.8 s linear expectation at 1.5M
    # docs). In-row extraction keeps the exploded stage at exactly
    # output size.
    chunks = F.transform(
        F.filter(F.col("_se"), lambda p: p.s < p.e),
        lambda p, i: F.struct(
            i.cast("int").alias("idx"),
            (p.s + 1).cast("int").alias("start_pos"),
            (p.e - p.s).cast("int").alias("chunk_len"),
            F.md5(F.col("text").substr(p.s + 1, p.e - p.s)).alias("fp"),
        ),
    )
    from aws_de_final_project_spark.operators.util import spread

    return (
        # the whole operator is scan-side codegen with NO shuffle, so a
        # single-file scan would otherwise run the per-char rolling-
        # hash boundary scan on ONE task (measured 3.8 s serial at
        # sf0.1); spread is a no-op at scale
        spread(t["documents"].select("doc_id", "text"))
        .select("doc_id", "text", bounds.alias("_b"))
        .select(
            "doc_id",
            "text",
            F.arrays_zip(starts.alias("s"), ends.alias("e")).alias("_se"),
        )
        .select("doc_id", F.explode(chunks).alias("_c"))
        .select(
            "doc_id",
            F.col("_c.idx").alias("chunk_idx"),
            F.col("_c.start_pos").alias("start_pos"),
            F.col("_c.chunk_len").alias("chunk_len"),
            F.col("_c.fp").alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs C(a,b) >= 0.9 over word-3-gram
    shingles (operators/dedup.containment_pairs) — the contained-
    document detector (quotes, boilerplate wraps) symmetric Jaccard
    and MinHash structurally miss. Candidates via shingle equi-join,
    exact integer-arithmetic threshold; full DuckDB oracle."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.containment_pairs(
        t["documents"], "text", "doc_id", threshold_pct=90, ngram=3
    ).orderBy("doc_a", "doc_b")


def _messy_url() -> "F.Column":
    """Deterministic synthetic crawl URL per document — the documents
    table has no URL column, so both twins derive the same messy URL
    (mixed-case scheme/host, www. on every 3rd, default :80 port on
    every 5th, trailing slash on every 2nd, unsorted query with
    tracking params, gclid on every 4th, a fragment on all) from
    doc_id/source; the operator under test is the canonicalizer, the
    construction is just the fixture."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTP://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Site"),
        (d % 7).cast("string"),
        # every 11th host sits under a multi-label public suffix and
        # every 13th under a private platform suffix, so the
        # registered-domain PSL path is driver-gate-exercised
        F.when(d % 11 == 0, F.lit(".CO.UK"))
        .when(d % 13 == 0, F.lit(".GitHub.IO"))
        .otherwise(F.lit(".COM")),
        F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        d.cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&b=2&a=1"),
        F.when(d % 4 == 0, F.lit("&gclid=XYZ")).otherwise(F.lit("")),
        F.lit("#frag"),
    )


def url_canonicalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/webcrawl): fragment strip,
    scheme/authority lowercase, default-port drop, www-label strip,
    trailing-slash strip, tracking-param drop + bytewise param sort —
    plus host and registered domain. A pure projection (zero
    shuffles, scan-side codegen at 100 TB); idempotence is
    property-pinned in tests/test_webcrawl.py; FULL DuckDB oracle
    (string ops replay exactly)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", _messy_url().alias("url"))
    return WC.with_canonical_url(d, "url").select(
        "doc_id", "url", "canon_url", "host", "domain"
    ).orderBy("doc_id")


def host_quality_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus stats (operators/webcrawl):
    doc count, mean document size, short-doc share — the host-level
    signals a C4/RefinedWeb-style blocklist pass filters on. One
    map-side-combinable hash aggregate over the derived domain."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select(_messy_url().alias("url"), "n_chars")
    return WC.host_quality_stats(
        d, "url", "n_chars", short_doc_chars=200
    )


def warc_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source end-to-end (sources/warc.read_warc): documents are
    serialized as four WARC/1.0 members (two gzipped) of HTTP-response
    records plus one deliberately CORRUPT member, read back through
    the binaryFile + mapInPandas parser (one task per member, zero
    shuffles), HTTP-split, fed to html_extract_text, and returned per
    doc. The DuckDB oracle computes the same columns straight from the
    documents table — a green row therefore proves (a) the WARC
    write->parse roundtrip is byte-lossless (content_length and body
    re-derived from parsed bytes), (b) the HTTP status/body split
    (status would be NULL on a failed split), and (c) that the corrupt
    member was quarantined, not leaked (a leaked row breaks the hash).

    The fixture build collects (doc_id, text) on the driver — bounded
    test plumbing (~1.5 MB at sf0.1), the operator under test is the
    DISTRIBUTED read path; a real crawl arrives as pre-sharded members
    (~100k x 1 GB per Common-Crawl month = 100k-way parallelism)."""
    import os
    import shutil
    import tempfile

    from aws_de_final_project_spark.operators import webcrawl as WC
    from aws_de_final_project_spark.sources import warc as W

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text").collect()
    tmp = tempfile.mkdtemp(prefix="warc_fix_")
    try:
        shards: dict[int, list] = {i: [] for i in range(4)}
        for r in sorted(docs, key=lambda r: r.doc_id):
            body = (
                f"<html><body><p>{r.text}</p></body></html>"
            ).encode("utf-8")
            shards[r.doc_id % 4].append(
                {
                    "record_id": f"<urn:uuid:doc-{r.doc_id}>",
                    "target_uri": f"https://warc.example/doc/{r.doc_id}",
                    "payload": (
                        b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: text/html\r\n\r\n" + body
                    ),
                }
            )
        for i, recs in shards.items():
            gz = bool(i % 2)
            W.write_warc_member(
                os.path.join(tmp, f"part{i}.warc" + (".gz" if gz else "")),
                iter(recs),
                compress=gz,
            )
        with open(os.path.join(tmp, "junk.warc"), "wb") as fh:
            fh.write(b"this member is not a WARC record\r\n")
        df = W.read_warc(spark, tmp)
        out = (
            df.select(
                F.regexp_extract("target_uri", r"/doc/([0-9]+)$", 1)
                .cast("long")
                .alias("doc_id"),
                F.col("http_status").cast("int").alias("http_status"),
                F.col("content_length").cast("long").alias(
                    "content_length"
                ),
                WC.html_extract_text(F.col("http_body")).alias(
                    "extracted"
                ),
            )
            .withColumn(
                "n_chars_extracted", F.length("extracted").cast("long")
            )
            .orderBy("doc_id")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def host_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level blocklist filtering end-to-end (operators/webcrawl
    .filter_by_host_stats) — the C4/RefinedWeb step that consumes
    host_quality_stats: registered domains with >= 5 docs and a
    short-doc share above 0.5 (chars < 300; the corpus median is
    ~306, so the threshold discriminates) are blocked and their
    documents dropped. Aggregate -> broadcast left-anti join; the
    document side is never shuffled (plan-pinned). FULL DuckDB
    oracle via NOT IN over the replayed aggregate."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select(
        "doc_id", _messy_url().alias("url"), "n_chars"
    )
    kept = WC.filter_by_host_stats(
        d, "url", "n_chars",
        short_doc_chars=300, max_short_share=0.5, min_docs=5,
    )
    return kept.select(
        "doc_id", "domain", F.col("n_chars").cast("long").alias("n_chars")
    ).orderBy("doc_id")


def mixture_plan_rates_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning (operators/curation
    .mixture_plan_rates): per-source whitespace-token supply vs a
    skewed target mixture (weights i/32, deliberately oversubscribing
    the last source) against a 60%-of-corpus budget — the water-
    filling planner caps the short source at its supply and
    redistributes the deficit to the others. Weights are exact binary
    fractions and supplies are integers, so every sum in the plan is
    exact and the DuckDB twin replays bit-identically."""
    from pyspark.sql.window import Window

    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    counts = (
        t["documents"]
        .select("source", F.size(F.split("text", " ")).alias("_ntok"))
        .groupBy("source")
        .agg(F.sum("_ntok").cast("long").alias("avail_tokens"))
    )
    # 20 sources, exact binary-fraction weights summing to 1
    # (src0-11: 2/64, src12-18: 4/64, src19: 12/64) — the 12/64
    # target on a ~1/20 supply forces a cap; exact weights make every
    # window sum order-independent, hence engine-identical
    wt = F.when(F.col("source") == "src19", F.lit(12.0 / 64))
    for i in range(12):
        wt = wt.when(F.col("source") == f"src{i}", F.lit(2.0 / 64))
    for i in range(12, 19):
        wt = wt.when(F.col("source") == f"src{i}", F.lit(4.0 / 64))
    # fail loudly on a source outside src0..src19: the planner's
    # contract requires weights > 0, and a silent 0.0 default would
    # make _ratio NULL (divide-by-zero) and corrupt the plan ordering
    # if the testdata source set ever changes (ADVICE r7)
    counts = counts.select(
        "source", "avail_tokens",
        F.when(wt.isNotNull(), wt).otherwise(
            F.raise_error(F.concat(
                F.lit("mixture_plan_rates_docs: unmatched source "),
                F.col("source"),
            ))
        ).alias("target_weight"),
    )
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    budget = F.floor(
        F.lit(0.6) * F.sum(F.col("avail_tokens").cast("double")).over(whole)
    ).cast("double")
    return curation.mixture_plan_rates(counts, budget)


def streaming_kmv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING KMV distinct-count path (streaming/sketch
    .kmv_distinct_stream, applyInPandasWithState) driven end-to-end
    over a bounded 3-slice replay of the events table — the one
    queries() entry whose value IS a stream-fold result, so the
    driver's oracle gate covers the stateful streaming machinery, not
    just batch plans. Events are split by event_id % 3 into three
    time-ordered files, maxFilesPerTrigger=1 + availableNow makes
    them three micro-batches, and the final per-key state (max
    n_batches) is returned. Because the KMV merge is associative, the
    result equals the batch sketch of the full history — which is
    exactly what the DuckDB oracle computes; the fold order is proven
    irrelevant by the oracle match itself. Result is materialized
    (tiny: one row per event_type) before the temp replay dir is
    removed."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from aws_de_final_project_spark.streaming.sketch import (
        kmv_distinct_stream,
    )

    t = load_tables(spark, sf_dir, ("events",))
    events = t["events"].select("event_type", "user_id", "event_id")
    tmp = tempfile.mkdtemp(prefix="kmv_replay_")
    try:
        # ONE pass for all three slices (slice column + hash-
        # repartition -> one file per slice dir) instead of three
        # filter-writes that each rescan the table
        part_dir = os.path.join(tmp, "_parts")
        (
            events.withColumn(
                "_slice", (F.col("event_id") % 3).cast("int")
            )
            .repartition("_slice")
            .write.mode("overwrite")
            .partitionBy("_slice")
            .parquet(part_dir)
        )
        for i in range(3):
            d = os.path.join(part_dir, f"_slice={i}")
            f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
            dst = os.path.join(tmp, f"f{i}.parquet")
            os.rename(os.path.join(d, f), dst)
            now = time.time()
            os.utime(dst, (now + i * 10, now + i * 10))
        shutil.rmtree(part_dir)
        # the stateful exchange follows the SESSION's shuffle
        # partition count; a driver session at the 200 default spends
        # the whole replay scheduling ~600 empty tasks for a handful
        # of keys. Run the replay on an ISOLATED session (same
        # SparkContext, private SQLConf + catalog) so the small pin
        # can never leak into queries running concurrently on the
        # caller's session (ADVICE r7) — a production stream sizes
        # this to its key cardinality at startup instead.
        iso = spark.newSession()
        iso.conf.set("spark.sql.shuffle.partitions", "2")
        stream = (
            iso.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        qname = f"kmv_replay_{uuid.uuid4().hex[:8]}"
        q = (
            kmv_distinct_stream(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = iso.sql(
            f"""SELECT event_type, n_in_sketch, est_users FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY event_type ORDER BY n_batches DESC
                    ) AS rn FROM {qname}) WHERE rn = 1"""
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema).orderBy(
            "event_type"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (streaming/dedup.dedup_stream:
    watermark + ``dropDuplicatesWithinWatermark``) driven end-to-end
    over a 2-slice replay — the fourth driver-checkable streaming
    entry, covering the re-delivery suppression path the reference's
    ``updated_on > hwm`` refetch loop needs (its Socrata ingest
    re-delivers every updated row; see streaming/dedup.py header).

    Replay construction: every 3rd event is re-delivered in the
    SECOND slice (cross-batch: its key must still be in state when
    the duplicate arrives), every 7th is duplicated within its OWN
    slice (in-batch dedup), originals split at the epoch median so
    slices stay time-ordered. The watermark delay is DERIVED FROM THE
    DATA — whole span (max ts - min ts) plus a 1-day margin, computed
    in the same aggregate as the median — so the "no state expires
    mid-replay" invariant holds at every sf tier by construction (a
    fixed 30-day literal held sf0.1's ~30-day span by 35 minutes and
    was false at sf1's ~300-day span — r9 advice). Contract is exact:
    output == the original events, every planted duplicate
    suppressed. The expiry half of the contract (a
    duplicate AFTER eviction re-emits) is pinned separately in
    tests/test_streaming.py — it is time-dependent by nature and
    belongs to the unit suite, not a value-hash oracle.

    FULL DuckDB oracle: per-type counts + an order-independent 60-bit
    md5 XOR over the event_id set straight off the events table — a
    green row proves every duplicate was dropped AND nothing else
    was (duplicates are identical full rows, so the id set is the
    whole contract). Runs on an isolated newSession; the memory-sink
    aggregate is returned directly (same pattern as the session
    replay)."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from aws_de_final_project_spark.functions.numeric import epoch_us
    from aws_de_final_project_spark.streaming.dedup import dedup_stream

    t = load_tables(spark, sf_dir, ("events",))
    events = t["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    stats = events.select(
        F.percentile(epoch_us("ts"), F.lit(0.5)).alias("m"),
        F.min(epoch_us("ts")).alias("lo"),
        F.max(epoch_us("ts")).alias("hi"),
    ).collect()[0]
    med = stats.m
    # watermark > whole data span + 1 day margin: no state can expire
    # mid-replay regardless of sf tier (span scales with sf)
    wm_seconds = int((stats.hi - stats.lo) // 1_000_000) + 86_400
    e = epoch_us("ts")
    base_slice = F.when(e < F.lit(med), 0).otherwise(1)
    originals = events.withColumn("_slice", base_slice)
    dup3 = events.filter(F.col("event_id") % 3 == 0).withColumn(
        "_slice", F.lit(1)
    )
    dup7 = events.filter(F.col("event_id") % 7 == 0).withColumn(
        "_slice", base_slice
    )
    replay = originals.unionByName(dup3).unionByName(dup7)
    tmp = tempfile.mkdtemp(prefix="dedup_replay_")
    try:
        part_dir = os.path.join(tmp, "_parts")
        (
            replay.repartition("_slice")
            .write.mode("overwrite")
            .partitionBy("_slice")
            .parquet(part_dir)
        )
        for i in range(2):
            d = os.path.join(part_dir, f"_slice={i}")
            f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
            dst = os.path.join(tmp, f"f{i}.parquet")
            os.rename(os.path.join(d, f), dst)
            now = time.time()
            os.utime(dst, (now + i * 10, now + i * 10))
        shutil.rmtree(part_dir)
        iso = spark.newSession()
        iso.conf.set("spark.sql.shuffle.partitions", "2")
        iso.conf.set("spark.sql.session.timeZone", "UTC")
        stream = (
            iso.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        qname = f"dedup_replay_{uuid.uuid4().hex[:8]}"
        q = (
            dedup_stream(
                stream,
                keys=("event_id",),
                watermark=f"{wm_seconds} seconds",
            )
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # integer-keyed checksum only: double->string serialization
        # differs across engines, and identical-row duplicates make
        # the id set the whole contract
        sig = F.conv(
            F.substring(
                F.md5(F.col("event_id").cast("string")), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        return (
            iso.table(qname)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.bit_xor(sig).alias("id_xor"),
            )
            .orderBy("event_type")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed exact dedup (operators/webcrawl.dedup_by_url): a
    coarse messy-URL fixture (path = doc_id % 100, param order
    flipped on odd ids, gclid noise on every 4th) gives many raw-
    distinct URLs per canonical resource; the canonical key collapses
    them and one hash aggregate picks copy counts + min-id keepers.
    FULL DuckDB oracle (same fixture + canon CTEs + group)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    url = F.concat(
        F.lit("HTTP://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Site.COM"),
        F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Page/"),
        (d % 100).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?b=2&a=1")).otherwise(
            F.lit("?a=1&b=2")
        ),
        F.when(d % 4 == 0, F.lit("&gclid=XYZ")).otherwise(F.lit("")),
    )
    docs = t["documents"].select("doc_id", url.alias("url"))
    return WC.dedup_by_url(docs, "url", "doc_id")


def html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML visible-text extraction (operators/webcrawl
    .html_extract_text) over a deterministic HTML wrapping of each
    document (head with script/style noise, comments, block tags, an
    entity-bearing footer on even ids, a numeric-character-reference
    gauntlet on every 4th: decimal, supplementary-plane hex, the
    U+FFFD invalid-codepoint rule for &#0;/surrogates/out-of-range,
    and an over-long 8-digit ref that must stay LITERAL) — the
    fetch->text step of a crawl pipeline, as a pure scan-side codegen
    chain. FULL DuckDB oracle (same construction, same RE2-compatible
    rules, same one-pass entity decode)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d.cast("string"),
        F.lit("</title><SCRIPT type=\"text/javascript\">var x = 1;"
              " // <p>not text</p></SCRIPT>"
              "<style>.c { color: red }</style></head>"
              "<body><!-- boilerplate\ncomment --><p>"),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            d % 2 == 0,
            F.lit("<div class=\"foot\">Q&amp;A &lt;tag&gt;"
                  "&nbsp;&#39;quoted&#39;</div>"),
        ).otherwise(F.lit("")),
        # every 3rd doc carries a VERTICAL TAB (U+000B): Java's \s
        # matches it, RE2's does not — the explicit whitespace class
        # (webcrawl.WS_RE) keeps both twins byte-identical here, and
        # this plant keeps that dialect edge oracle-exercised
        F.when(
            d % 3 == 0, F.lit("<p>vt\x0bsplit</p>")
        ).otherwise(F.lit("")),
        # numeric character references on every 4th doc: decimal,
        # supplementary-plane hex (surrogate-pair path), &#0; /
        # lone-surrogate / out-of-range (all -> U+FFFD), and an
        # 8-digit ref that exceeds the {1,7} bound -> stays literal.
        # &amp;#65; must decode to the LITERAL '&#65;' (one pass)
        F.when(
            d % 4 == 0,
            F.lit("<p>num&#65;dec &#x1F600; z&#0;s&#xD800;"
                  "o&#1114112; lit&#12345678; amp&amp;#65;</p>"),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    docs = t["documents"].select("doc_id", html.alias("html"))
    return docs.select(
        "doc_id",
        WC.html_extract_text("html").alias("extracted"),
    ).select(
        "doc_id",
        "extracted",
        F.length("extracted").cast("long").alias("n_chars_extracted"),
    ).orderBy("doc_id")


#: Held-out sentences (NOT in operators/langid.LANGID_SAMPLES) per
#: document language — the planted-language fixture for the lang-id
#: classifier entry; 3 variants per language picked by doc_id % 3.
LANGID_FIXTURE: dict[str, tuple[str, str, str]] = {
    "en": (
        "there was a storm last night but the morning is calm",
        "we should call them before the meeting starts",
        "the train arrives at the station on time today",
    ),
    "de": (
        "am abend essen wir zusammen und sprechen über den tag",
        "die straßenbahn fährt alle zehn minuten zum hauptbahnhof",
        "ich weiß nicht ob wir heute noch genug zeit dafür haben",
    ),
    "es": (
        "la comida estaba muy rica y el lugar era bonito",
        "la ciudad estaba llena de gente durante las fiestas",
        "el tren llega a la estación a tiempo hoy",
    ),
    "fr": (
        "demain nous irons au marché pour acheter des légumes",
        "il faut que nous partions avant la tombée de la nuit",
        "les enfants regardent les oiseaux dans le jardin chaque matin",
    ),
    "zh": (
        "昨天晚上我们在城市里散步很久",
        "这个问题我们明天开会的时候再说吧",
        "我们明天去市场买菜",
    ),
}


def lang_id_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual language ID (operators/langid.lang_id_scores —
    fastText-style hashed char-1/2/3-gram one-vs-rest linear model,
    14 languages incl. Arabic, Devanagari, Hangul, kana, Cyrillic, Han) over a planted-language
    fixture: each document's text is replaced by a HELD-OUT sentence
    of its own ``lang`` (3 variants by doc_id % 3, a doc_id%100 digit
    suffix for row variety) — the discrimination the 4-language
    stopword heuristic (lang_id_heuristic) cannot do for zh. ONE
    scan-side projection: integer weight banks as literals, exact
    BIGINT folds (accumulation-order-proof — see operators/langid.py),
    greatest + when-chain argmax. FULL DuckDB oracle: the identical
    trained int banks, gram set, fold, and argmax replayed; the
    ``match`` column pins 100%% planted-language accuracy into the
    value hash."""
    from aws_de_final_project_spark.operators import langid as LI
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    t["documents"] = spread(t["documents"])  # 1-file scan = 1 task:
    # the 14-bank gram folds are per-row-heavy, fan out first
    d = F.col("doc_id")
    variant = F.lit(None).cast("string")
    for lang, vs in LANGID_FIXTURE.items():
        pick = (
            F.when(d % 3 == 0, F.lit(vs[0]))
            .when(d % 3 == 1, F.lit(vs[1]))
            .otherwise(F.lit(vs[2]))
        )
        variant = F.when(F.col("lang") == lang, pick).otherwise(variant)
    docs = t["documents"].select(
        "doc_id",
        "lang",
        F.concat(variant, F.lit(" "), (d % 100).cast("string")).alias(
            "_txt"
        ),
    )
    out = LI.lang_id_scores(docs, "_txt", "doc_id", impl="sql")
    return (
        out.join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_grams",
            "lang_pred",
            "lang_score",
            (F.col("lang_pred") == F.col("lang")).cast("int").alias(
                "match"
            ),
        )
        .orderBy("doc_id")
    )


#: Fixed English lead sentence for the main-content fixture: supplies
#: the prose stopword signal for EVERY doc (the synthetic corpus text
#: is word soup with few function words) and plants an entity the
#: final decode must handle. Shared verbatim with the DuckDB oracle.
MAIN_FIXTURE_LEAD = (
    "the quick brown fox and the lazy dog were reading this article "
    "because it was a good day to learn about Q&amp;A . "
)


#: Planted per-language article sentences for the MULTILINGUAL
#: main-content fixture (r10 verdict item 1: non-English article text
#: must SURVIVE boilerplate removal). Vendored literals shared
#: verbatim with the DuckDB oracle; each >= 80 visible chars, carries
#: its language's function words (or, for ja, no bank exists — the
#: script-coverage fallback must carry it); no apostrophes (SQL
#: quoting) and no capital 'İ'/'ẞ' (the only known lower() mapping
#: divergence between engines, normalized elsewhere but kept out of
#: fixtures).
MAIN_ML_LANGS: tuple[str, ...] = ("de", "ru", "ja", "es", "tr", "en")
MAIN_ML_ARTICLES: dict[str, str] = {
    "de": (
        "Die Forscher und die Studenten waren mit den Ergebnissen der "
        "langen Untersuchung in der Stadt sehr zufrieden und das Team "
        "hat die Daten für die nächste Arbeit gesammelt ."
    ),
    "ru": (
        "Исследователи и студенты были довольны результатами долгой "
        "работы в городе и команда собрала данные для следующей "
        "статьи о погоде и природе этого края ."
    ),
    "ja": (
        "研究者たちは長い調査の結果にとても満足しており、チームは次の"
        "論文のためにデータを集めました。東京の天気は晴れで、みんなが"
        "公園をゆっくり歩きながら新しい計画について話しました。"
    ),
    "es": (
        "Los investigadores y los estudiantes estaban muy contentos "
        "con los resultados de la larga investigación en la ciudad y "
        "el equipo ha reunido los datos para el siguiente trabajo ."
    ),
    "tr": (
        "Araştırmacılar ve öğrenciler uzun çalışmanın sonuçlarından "
        "çok memnun kaldı ve ekip bir sonraki makale için şehirdeki "
        "bütün verileri dikkatle topladı ."
    ),
    "en": (
        "The researchers and the students were very happy with the "
        "results of the long study in the city and the team has "
        "collected the data for the next paper about the weather ."
    ),
}


def main_content_multilingual_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LANGUAGE-AWARE main-content extraction (operators/webcrawl
    .html_main_content with a per-row ``lang`` column — r10 verdict
    item 1): each document becomes a page whose ARTICLE paragraph is
    in one of six languages (de/ru/ja/es/tr/en by doc_id % 6, vendored
    sentences above) wrapped in the same English boilerplate classes
    as the sibling entry — nav link row, cookie banner on evens,
    6-anchor link farm on every 4th doc, footer. The planted article
    must SURVIVE (via its language's stopword bank for de/ru/es/tr/en;
    via the script-coverage fallback for ja, which has no bank) and
    every boilerplate block must VANISH (nav/cookie/footer by the
    length floor, the link farm by link density — the gates that need
    no language knowledge). Pure scan-side codegen: the bank is a
    literal CASE chain, script counts are three constant-pattern
    regex tallies, zero joins, zero shuffles before the output sort.
    FULL DuckDB oracle: same page construction, same interpolated
    banks/classes/thresholds, same nested keep rule."""
    from aws_de_final_project_spark.operators import webcrawl as WC
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    t["documents"] = spread(t["documents"])
    d = F.col("doc_id")
    lang = F.element_at(
        F.array(*[F.lit(c) for c in MAIN_ML_LANGS]),
        (d % len(MAIN_ML_LANGS) + 1).cast("int"),
    )
    article = F.element_at(
        F.array(*[F.lit(MAIN_ML_ARTICLES[c]) for c in MAIN_ML_LANGS]),
        (d % len(MAIN_ML_LANGS) + 1).cast("int"),
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d.cast("string"),
        F.lit("</title><style>.nav { color: red }</style></head>"
              "<body><nav><a href=\"/home\">Home</a> "
              "<a href=\"/about\">About</a> "
              "<a href=\"/contact\">Contact</a></nav>"),
        F.when(
            d % 2 == 0,
            F.lit("<div class=\"cookie\">We use cookies to improve "
                  "your experience <a href=\"#\">Accept</a> "
                  "<a href=\"#\">Decline</a></div>"),
        ).otherwise(F.lit("")),
        F.lit("<p>"),
        article,
        F.lit("</p>"),
        F.when(
            d % 4 == 0,
            F.lit("<div class=\"more\"><a href=\"/1\">read more here "
                  "now</a> <a href=\"/2\">read more here now</a> "
                  "<a href=\"/3\">read more here now</a> "
                  "<a href=\"/4\">read more here now</a> "
                  "<a href=\"/5\">read more here now</a> "
                  "<a href=\"/6\">read more here now</a></div>"),
        ).otherwise(F.lit("")),
        F.lit("<footer>&copy; 2026 <a href=\"/privacy\">Privacy</a> "
              "<a href=\"/terms\">Terms</a></footer></body></html>"),
    )
    docs = t["documents"].select(
        "doc_id", lang.alias("lang"), html.alias("html")
    )
    return docs.select(
        "doc_id",
        "lang",
        WC.html_main_content("html", lang=F.col("lang")).alias(
            "main_content"
        ),
    ).select(
        "doc_id",
        "lang",
        "main_content",
        F.length("main_content").cast("long").alias("n_chars_main"),
    ).orderBy("doc_id")


def dedup_image_exact_groups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-duplicate image groups (operators/multimodal
    .image_exact_groups): full-64-bit dHash identity over the same
    synthetic grid fixture as :func:`dedup_image_phash` — within each
    planted 4-image group the two clean members share one signature
    and the two bumped members share another (a size-2 group each),
    EXCEPT where the single-cell bump happens not to cross any
    neighbor comparison (it flips 0..2 bits by construction): there
    all four members share one signature and the group has size 4 —
    deterministic either way, identical on both engines. One hash
    aggregate, no joins. FULL DuckDB oracle replays grid -> bands ->
    GROUP BY signature."""
    from aws_de_final_project_spark.operators import multimodal as MM

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    anchor = F.when(d % 100 < 4, d - d % 4).otherwise(d)
    noisy = (d % 2 == 1) & (d % 100 < 4)
    a197 = anchor % 197
    a89 = anchor % 89
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(71)),
        lambda i: (
            ((a89 + 3) * (a197 + i + 1) * (i + 2)) % 197
            + F.when(noisy & (i == 40), F.lit(29)).otherwise(F.lit(0))
        ).cast("int"),
    )
    imgs = t["documents"].select("doc_id", grid.alias("grid"))
    return MM.image_exact_groups(imgs, "doc_id", "grid")


def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs (operators/multimodal:
    dhash_bands + image_phash_pairs — r10 verdict item 3) over a
    deterministic synthetic gray-grid fixture: every doc carries a
    9x8 dHash grid computed in closed form from doc_id; docs with
    doc_id % 100 < 4 form 4-image groups sharing one base pattern,
    where the odd members get a single-cell +29 bump (the re-encoded/
    lightly-edited copy shape) that flips at most 2 of the 64
    difference bits — so all 6 in-group pairs land within
    hamming <= 3 and MUST be caught. The hash is integer end-to-end;
    candidates come from four 16-bit pigeonhole band joins (no
    cartesian — plan-pinned in tests/test_multimodal.py), verified by
    exact popcount. The REAL decode composition (JPEG bytes -> luma
    -> box-mean grid -> same hash) is pinned by the planted
    re-encode/resize tests in tests/test_multimodal.py; the entry
    synthesizes grids arithmetically so the FULL oracle replays hash,
    bands and verify verbatim."""
    from aws_de_final_project_spark.operators import multimodal as MM

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    anchor = F.when(d % 100 < 4, d - d % 4).otherwise(d)
    noisy = (d % 2 == 1) & (d % 100 < 4)
    # The base pattern is a triple PRODUCT mod 197 over two
    # incommensurate anchor residues (197, 89 — lcm 17,533): earlier
    # additive forms were shift-invariant under dHash (bits compare
    # CONSECUTIVE cells, so a constant or common-slope offset flips
    # bits only at mod-197 wrap points), which made accidental
    # near-dup families grow quadratically with the corpus — caught
    # at the sf0.1 sweep (370 pairs at sf0.01 -> 23k). The product
    # form scrambles the comparison pattern per anchor: measured 301
    # pairs at 5000 docs (the 300 planted + 1 accidental), max band
    # bucket 18.
    a197 = anchor % 197
    a89 = anchor % 89
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(71)),
        lambda i: (
            ((a89 + 3) * (a197 + i + 1) * (i + 2)) % 197
            + F.when(noisy & (i == 40), F.lit(29)).otherwise(F.lit(0))
        ).cast("int"),
    )
    imgs = t["documents"].select("doc_id", grid.alias("grid"))
    # max_band_freq=None: the DuckDB oracle replays the band join
    # UNCAPPED, so the entry must too (the cap itself is pinned by the
    # planted hot-band unit test; this fixture's max bucket is 18)
    return MM.image_phash_pairs(
        imgs, "doc_id", "grid", max_hamming=3, max_band_freq=None
    ).orderBy("img_a", "img_b")


def html_main_content_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content / boilerplate extraction (operators/webcrawl
    .html_main_content — jusText-shaped block text-density
    classification) over a deterministic page wrapping of each
    document that plants every boilerplate class a real crawl page
    carries: nav link row + cookie banner (short and/or link-dense —
    must vanish), a long link-farm div on every 4th doc (>= 80 chars
    but link density ~1 — must vanish BY DENSITY), a long
    zero-stopword keyword-stuffing div on every 5th (must vanish by
    prose score), a footer with entity + links (must vanish), and one
    or two ARTICLE paragraphs (lead sentence + the document text —
    must survive). The step every C4/RefinedWeb-shaped pipeline runs
    between WARC parse and quality filtering. Pure scan-side codegen
    (split / nested HOF filter / join / one-pass entity decode), zero
    shuffles before the output sort. FULL DuckDB oracle: same
    construction, same interpolated block/anchor regexes, same
    multiply-form density rule."""
    from aws_de_final_project_spark.operators import webcrawl as WC
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    # 1-file scan = 1 task: the block-split/score/decode HOFs are the
    # heaviest scan-side expressions in the repo — fan out first
    t["documents"] = spread(t["documents"])
    d = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d.cast("string"),
        F.lit("</title><script>var x = 1; // <p>not text</p></script>"
              "<style>.nav { color: red }</style></head><body>"
              "<nav><a href=\"/home\">Home</a> <a href=\"/about\">About"
              "</a> <a href=\"/contact\">Contact</a></nav>"),
        F.when(
            d % 2 == 0,
            F.lit("<div class=\"cookie\">We use cookies to improve "
                  "your experience <a href=\"#\">Accept</a> "
                  "<a href=\"#\">Decline</a></div>"),
        ).otherwise(F.lit("")),
        F.lit("<p>" + MAIN_FIXTURE_LEAD),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("<h2>related</h2><p>and then it was written "
                      "that the "),
                F.col("text"),
                F.lit(" was all about the data in the end .</p>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.lit("<div class=\"more\"><a href=\"/1\">read more here "
                  "now</a> <a href=\"/2\">read more here now</a> "
                  "<a href=\"/3\">read more here now</a> "
                  "<a href=\"/4\">read more here now</a> "
                  "<a href=\"/5\">read more here now</a> "
                  "<a href=\"/6\">read more here now</a></div>"),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.lit("<div class=\"kw\">lorem ipsum dolor sit amet "
                  "consectetur adipiscing elit sed eiusmod tempor "
                  "incididunt labore magna aliqua veniam quis "
                  "nostrud exercitation ullamco</div>"),
        ).otherwise(F.lit("")),
        F.lit("<footer>&copy; 2026 <a href=\"/privacy\">Privacy</a> "
              "<a href=\"/terms\">Terms</a></footer></body></html>"),
    )
    docs = t["documents"].select("doc_id", html.alias("html"))
    return docs.select(
        "doc_id",
        WC.html_main_content("html").alias("main_content"),
    ).select(
        "doc_id",
        "main_content",
        F.length("main_content").cast("long").alias("n_chars_main"),
    ).orderBy("doc_id")


def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-grade PII redaction (operators/webcrawl.scrub_pii):
    emails/IPv6/IPv4/phones replaced with typed placeholders over a
    deterministic PII-injected fixture (documents carry none, so both
    twins append the same synthetic contact block per doc — every 3rd
    doc an email, every 4th an IPv4, every 5th a bare phone, every
    6th a parenthesized phone, every 7th an IPv6, every 11th a +1
    phone; every 8th gets a version string + ISO date that must
    SURVIVE the scrub, so false-positive behavior is itself
    oracle-pinned). Output keeps audit counts so the row exhibits
    what was removed. Pure scan-side regexp codegen, RE2-replayed
    (the oracle interpolates the module's pattern constants, so the
    dialects cannot drift); FULL DuckDB oracle."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@mail"),
                (d % 5).cast("string"),
                F.lit(".com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" from 10."),
                (d % 256).cast("string"),
                F.lit(".0."),
                (d % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" call 555-01"),
                F.lpad((d % 100).cast("string"), 2, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit(" office (312) 555-01"),
                F.lpad((d % 100).cast("string"), 2, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" via 2001:db8::"),
                (d % 9999).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 8 == 0,
            F.lit(" running v1.2.3.4 since 2026-08-15"),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0,
            F.concat(
                F.lit(" cell +1 312-555-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    docs = t["documents"].select("doc_id", text.alias("_t"))
    counts = WC.pii_counts(F.col("_t"))
    return docs.select(
        "doc_id",
        WC.scrub_pii(F.col("_t")).alias("scrubbed"),
        counts["n_emails"].cast("long").alias("n_emails"),
        counts["n_ipv6"].cast("long").alias("n_ipv6"),
        counts["n_ips"].cast("long").alias("n_ips"),
        counts["n_phones"].cast("long").alias("n_phones"),
    ).orderBy("doc_id")


def jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink (sources/jsonl) proven through the driver
    gate: documents are written as gzipped JSONL shards, read back
    with an explicit schema, and aggregated per lang — the oracle
    computes the same aggregate over the parquet original, so a green
    row proves the roundtrip lossless (the interchange contract every
    public text corpus relies on). Result is materialized before the
    temp dir is removed."""
    import shutil
    import tempfile

    from aws_de_final_project_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    tmp = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        write_jsonl(
            t["documents"].select("doc_id", "text", "lang", "n_chars"),
            tmp,
            n_shards=4,
        )
        back = read_jsonl(
            spark,
            tmp,
            schema="doc_id bigint, text string, lang string,"
            " n_chars bigint",
        )
        out = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
                F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            )
            .orderBy("lang")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("lang")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def unicode_nfc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (functions/text.nfc_normalize — the
    Arrow-vectorized pandas UDF, Spark's one missing text built-in)
    over a deterministic denormalization fixture: every 2nd doc gets a
    decomposed 'cafe\\u0301' suffix (NFC -> composed U+00E9), every
    3rd the Angstrom sign U+212B (NFC -> U+00C5). The DuckDB twin is
    the built-in nfc_normalize — both sides implement Unicode-standard
    NFC, so the driver hash-checks the vectorized-UDF path itself."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(d % 2 == 0, F.lit(" café")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit(" Ångström")).otherwise(
            F.lit("")
        ),
    )
    docs = t["documents"].select("doc_id", raw.alias("_raw"))
    norm = TX.nfc_normalize(F.col("_raw"))
    return docs.select(
        "doc_id",
        norm.alias("normalized"),
        (F.length("_raw") - F.length(norm)).cast("long").alias(
            "codepoints_composed"
        ),
    ).orderBy("doc_id")


def quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (operators/classifier): a
    fastText/CCNet-style LINEAR classifier over hashed bag-of-words
    features, scored per document as a pure scan-side projection —
    array higher-order functions gather literal weights by md5-bucket
    and mean-pool them, so a 100 TB corpus is scored at IO speed with
    zero shuffles and zero UDFs. Weights are the vendored
    deterministic stand-in (training is offline; inference is the
    at-scale contract); impl='sql' is PINNED so DuckDB parity never
    depends on the auto-dispatch heuristic — deployment widths
    (D >= 256) auto-route to the Arrow broadcast-weights path
    (classifier._scores_arrow, agreement-tested at D=64 and probed
    flat at D=2^16). FULL DuckDB oracle: the identical model — same
    md5 buckets, same literal weights, same left-fold sum, same
    interpolated whitespace class — replays bit-for-bit."""
    from aws_de_final_project_spark.operators import classifier as CLF

    t = load_tables(spark, sf_dir, ("documents",))
    return CLF.linear_text_scores(
        t["documents"], "text", "doc_id", impl="sql"
    ).orderBy("doc_id")


def host_link_graph_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain link graph (operators/webcrawl
    .host_link_graph) over a deterministic HTML fixture: every doc
    links out to a mixed-case absolute URL in an UNQUOTED href (the
    HTML5 unquoted-value profile), every 2nd adds a
    www/:443/tracking-param href in a SINGLE-QUOTED one
    (canonicalization exercised on the href path), every 3rd a
    relative link and every 5th a mailto: (both double-quoted, both
    dropped — no host edge), every 7th a self-link (dropped by
    drop_self when the suffix matches) — all three HTML quoting
    styles land on the extraction regex. The page's own URL is CLEAN
    lowercase by construction, so src_domain == the constructed host
    verbatim — the oracle derives src directly while the Spark side
    still runs the full canonicalize->host->registered_domain chain
    (the identity on this fixture is what makes the simplification
    sound). Link extraction + canonicalization are scan-side; the one
    shuffle is the map-side-combinable (src,dst) count."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    pages = _host_fixture_pages(spark, sf_dir)
    return WC.host_link_graph(pages, "url", "html").orderBy(
        "src_domain", "dst_domain"
    )


def _host_fixture_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The host-graph HTML fixture (see host_link_graph_docs's
    docstring for the plant inventory) — shared by the link-graph and
    host-PageRank entries so both replay the identical corpus."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    suffix = F.when(d % 11 == 0, F.lit(".co.uk")).otherwise(F.lit(".com"))
    src_host = F.concat(
        F.col("source"), F.lit("-"), (d % 7).cast("string"), suffix
    )
    url = F.concat(F.lit("http://"), src_host, F.lit("/d/"), d.cast("string"))
    html = F.concat(
        F.lit("<html><body>"),
        F.lit('<a href=http://Site'),
        ((d * 3 + 1) % 7).cast("string"),
        F.lit('.COM/p/'),
        d.cast("string"),
        F.lit('>x</a>'),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("<a class=\"l\" href='HTTPS://WWW.site"),
                ((d + 2) % 7).cast("string"),
                F.lit(".co.uk:443/x?utm_source=z&b=1'>y</a>"),
            ),
        ).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit('<a href="/about">rel</a>')).otherwise(
            F.lit("")
        ),
        F.when(
            d % 5 == 0, F.lit('<a href="mailto:u@example.com">m</a>')
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit('<a href="http://'), src_host, F.lit('/self">s</a>')
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return t["documents"].select(url.alias("url"), html.alias("html"))


def pagerank_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-authority composition (operators/graphrank.host_pagerank
    over operators/webcrawl.host_link_graph — VERDICT r12 "missing"
    item 4): the registered-domain link graph from the shared host
    fixture feeds ten fixed weighted-PageRank iterations; domains
    with only in-links are dangling nodes whose mass redistributes
    uniformly. The edge aggregate is domain-keyed (schema-bounded),
    so the rank iteration collapses to the bounded driver program
    after the data-sized graph build. FULL DuckDB oracle: the
    host_link_graph CTE chain feeding the same unrolled fixed
    iterations (the pagerank_trade_nations precedent)."""
    from aws_de_final_project_spark.operators import graphrank
    from aws_de_final_project_spark.operators import webcrawl as WC

    pages = _host_fixture_pages(spark, sf_dir)
    edges = WC.host_link_graph(pages, "url", "html")
    return graphrank.host_pagerank(edges)


def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink through the driver gate: documents are written
    as zstd ORC (Spark's bundled native reader/writer — the other
    big-data columnar interchange format besides parquet), read back,
    and aggregated per lang with an order-independent 60-bit md5
    content XOR — the oracle computes the same aggregate over the
    parquet ORIGINAL, so a green row proves the write->read roundtrip
    byte-lossless including full text content (the checksum covers
    every row's text, not just lengths). Result is materialized
    before the temp dir is removed. Scale posture: columnar +
    splittable + predicate-pushdown-capable, same partitioned-sink
    discipline as etl.write_partitioned."""
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir, ("documents",))
    tmp = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        (
            t["documents"]
            .select("doc_id", "text", "lang", "n_chars")
            .repartition(4)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .orc(tmp)
        )
        back = spark.read.orc(tmp)
        chk = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast(
            "bigint"
        )
        out = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
                F.bit_xor(chk).alias("text_checksum_xor"),
            )
            .orderBy("lang")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("lang")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def mojibake_repair_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair (functions/text.repair_mojibake — the
    ftfy-style UTF-8-read-as-cp1252 fix) over a deterministic plant:
    every 2nd doc gets a mojibake'd French/typographic suffix, every
    3rd a dash/ellipsis/umlaut one, every 7th an ALREADY-CLEAN
    accented suffix that must survive untouched (false-positive pin).
    The planted suffixes are GENERATED by the same `_mojibake_form`
    the pair table derives from, and the DuckDB oracle interpolates
    the same generated pairs — three artifacts, one source of truth.
    Pure chained-replace codegen: zero shuffles, scan-side at
    100 TB."""
    from aws_de_final_project_spark.functions.text import (
        _mojibake_form,
        mojibake_chars_recovered,
        repair_mojibake,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(
            d % 2 == 0, F.lit(_mojibake_form(" café “quoted”"))
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0, F.lit(_mojibake_form(" don’t — dashes… über"))
        ).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(" naïve déjà-vu")).otherwise(F.lit("")),
    )
    docs = t["documents"].select("doc_id", raw.alias("_raw"))
    return docs.select(
        "doc_id",
        repair_mojibake(F.col("_raw")).alias("repaired"),
        mojibake_chars_recovered(F.col("_raw")).alias("chars_recovered"),
    ).orderBy("doc_id")


#: robots.txt-style agent-* rules (host, prefix, allow) for the
#: shared messy-URL fixture's canonical hosts (src{k}.site{doc_id%7}
#: .{com|co.uk|github.io}): even sources Disallow the '/Docs/1'
#: prefix on one of their .com hosts (blocks ids 1, 10-19, 100-199,
#: ...), src1's site1.com gets a blanket Disallow '/' with a LONGER
#: Allow '/Docs/1' carving ids back out (RFC 9309 longest-match), and
#: src2.site2.com gets an Allow at the SAME length as its Disallow
#: (the least-restrictive tie rule) — one source of truth,
#: interpolated into the DuckDB twin as VALUES rows.
ROBOTS_RULES: tuple[tuple[str, str, bool], ...] = tuple(
    (f"src{k}.site{k % 7}.com", "/Docs/1", False)
    for k in range(0, 20, 2)
) + (
    ("src1.site1.com", "/", False),
    ("src1.site1.com", "/Docs/1", True),
    ("src2.site2.com", "/Docs/1", True),
)

#: (host, prefix, allow, agent) — the RFC 9309 wildcard + user-agent-
#: group fixture (r9 verdict items 3 + 6). Canonical path+query for
#: every fixture URL is '/Docs/{d}?a=1&b=2', so: src0 exercises
#: wildcard PRECEDENCE (the longer '/Docs/1*' Allow beats '/Docs/*');
#: src1 the classic 'Disallow: /*?' (every URL has a query ->
#: everything blocked); src2 a '$'-anchored rule the query tail stops
#: from ever matching; src3 a wildcard+'$' rule that matches the
#: query tail itself; src4 an agent-specific group OVERRIDING a
#: blanket '*' Disallow; src5 a '*'-only host (fallback applies);
#: src6 an agent-specific wildcard Disallow.
ROBOTS_WILDCARD_RULES: tuple[tuple[str, str, bool, str], ...] = (
    ("src0.site0.com", "/Docs/*", False, "*"),
    ("src0.site0.com", "/Docs/1*", True, "*"),
    ("src1.site1.com", "/*?", False, "*"),
    ("src2.site2.com", "/Docs/2$", False, "*"),
    ("src3.site3.com", "/*&b=2$", False, "*"),
    ("src4.site4.com", "/", False, "*"),
    ("src4.site4.com", "/Docs/*", True, "samplebot"),
    ("src5.site5.com", "/", False, "*"),
    ("src6.site6.com", "/Docs/1*", False, "samplebot"),
)


def lexicon_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style word-list filtering (functions/text.lexicon_hits)
    over a deterministic plant: every 6th doc gains two lexicon words,
    every 10th one more, every 15th a NEAR-miss ("scamper",
    "spammy") that must NOT count — whole-token matching only.
    Output: (doc_id, n_lexicon_hits, flagged). Pure scan-side HOF
    codegen; the DuckDB twin interpolates the same lexicon tuple."""
    from aws_de_final_project_spark.functions.text import lexicon_hits

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(d % 6 == 0, F.lit(" jackpot casino night")).otherwise(
            F.lit("")
        ),
        F.when(d % 10 == 0, F.lit(" FREE giveaway!")).otherwise(
            F.lit("")
        ),
        F.when(d % 15 == 0, F.lit(" scamper spammy")).otherwise(
            F.lit("")
        ),
    )
    docs = t["documents"].select("doc_id", raw.alias("_raw"))
    hits = lexicon_hits(F.col("_raw"))
    return docs.select(
        "doc_id",
        hits.alias("n_lexicon_hits"),
        (hits > 0).alias("flagged"),
    ).orderBy("doc_id")


def cap_docs_per_host_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (operators/webcrawl
    .cap_docs_per_host) over the shared messy-URL fixture: keep the
    5 lowest-id docs per registered domain. The window shuffles only
    (id, domain) pairs — document bodies never move. FULL oracle
    (same canon CTEs, QUALIFY row_number)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", _messy_url().alias("url"))
    return WC.cap_docs_per_host(docs, "url", "doc_id", 5).orderBy(
        "domain", "rank_in_host"
    )


def bloom_incremental_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-benchmark-registry contract for Bloom
    decontamination: masks built on two DISJOINT benchmark slices
    (doc_id % 178 == 0 and == 89) and OR-ed byte-wise must equal the
    mask of their union — so a new eval set folds into the registry
    without rebuilding history (the same fold == one-shot claim the
    KMV/rollup/registry-dedup entries prove for their structures).
    The DuckDB oracle computes positions from the UNION slice
    (doc_id % 89 == 0) directly; a green row proves the OR-fold
    end-to-end through the probe verdicts, false positives included."""
    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    half_a = docs.filter(F.col("doc_id") % 178 == 0)
    half_b = docs.filter(F.col("doc_id") % 178 == 89)
    rest = docs.filter(F.col("doc_id") % 89 != 0)
    import numpy as np

    ma = curation.bloom_build_mask(half_a, ngram=5)
    mb = curation.bloom_build_mask(half_b, ngram=5)
    merged = (
        np.frombuffer(ma, np.uint8) | np.frombuffer(mb, np.uint8)
    ).tobytes()
    return curation.bloom_decontaminate(rest, merged, ngram=5).orderBy(
        "doc_id"
    )


def streaming_drift_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING drift monitor (streaming/dq.drift_monitor_stream:
    frozen reference histogram + per-micro-batch PSI via foreachBatch)
    driven end-to-end — the third driver-checkable streaming entry,
    covering the foreachBatch metrics-sink path (KMV covers
    applyInPandasWithState folds, session replay covers watermark
    state; this one proves the sink wiring and per-batch isolation).

    Replay: days 1-10 of events freeze the reference histogram
    (32 bins over [0, 640), the batch drift entry's geometry); days
    11-20 and 21+ become two micro-batch files. Each batch's
    (grp, n_ref, n_cur, psi) row lands in a per-batch metrics dir.
    DATE slicing (not percentiles) keeps the split trivially
    tz-independent and lets the DuckDB oracle recompute BOTH batches'
    PSI exactly — a green row proves the streamed metric equals the
    batch formula per micro-batch, eps floors included."""
    import os
    import shutil
    import tempfile
    import time

    from aws_de_final_project_spark.streaming.dq import (
        drift_monitor_stream,
        reference_histogram,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_type", "value", F.to_date("ts").alias("_d")
    )
    c1 = F.lit("2024-01-11").cast("date")
    c2 = F.lit("2024-01-21").cast("date")
    tmp = tempfile.mkdtemp(prefix="drift_replay_")
    try:
        ref_path = os.path.join(tmp, "ref")
        reference_histogram(
            ev.filter(F.col("_d") < c1).select("event_type", "value"),
            "value",
            "event_type",
            0.0,
            640.0,
            32,
            ref_path,
        )
        src = os.path.join(tmp, "src")
        slices = [
            ev.filter((F.col("_d") >= c1) & (F.col("_d") < c2)),
            ev.filter(F.col("_d") >= c2),
        ]
        for i, sl in enumerate(slices):
            d = os.path.join(src, f"b{i}")
            sl.select("event_type", "value").coalesce(1).write.parquet(d)
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    now = time.time()
                    os.utime(
                        os.path.join(d, f), (now + i * 10, now + i * 10)
                    )
        iso = spark.newSession()
        iso.conf.set("spark.sql.shuffle.partitions", "2")
        iso.conf.set("spark.sql.session.timeZone", "UTC")
        q = drift_monitor_stream(
            iso,
            src + "/*",
            "event_type string, value double",
            ref_path,
            os.path.join(tmp, "metrics"),
            os.path.join(tmp, "chk"),
            "value",
            "event_type",
            0.0,
            640.0,
            32,
        )
        q.awaitTermination()
        m = spark.read.parquet(os.path.join(tmp, "metrics")).select(
            F.col("batch_id").cast("int").alias("batch_id"),
            "grp",
            "n_ref",
            "n_cur",
            "psi",
        )
        rows = m.collect()
        return spark.createDataFrame(rows, m.schema).orderBy(
            "batch_id", "grp"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus token distribution: OLS of
    ln(freq) on ln(rank) for the top-1000 tokens — the standard
    corpus-health diagnostic (natural text sits near slope -1;
    template/boilerplate corpora flatten, spam steepens).

    Scale shape: ONE vocabulary aggregate (the same 100 TB->|vocab|
    collapse as BPE counting), a TakeOrdered top-1000 (no full sort),
    and a 1000-row window + regression aggregate — everything after
    the vocab aggregate is constant-size. Ties broken (freq desc,
    token asc) so ranks are total-ordered on both engines; the
    engine-built regr_slope/intercept/r2 aggregates agree at the
    floor-form 4dp."""
    t = load_tables(spark, sf_dir, ("documents",))
    from pyspark.sql.window import Window

    vocab = (
        t["documents"]
        .select(
            F.explode(
                F.split(TX.normalized_text("text"), " ")
            ).alias("token")
        )
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(1000)
    )
    ranked = vocab.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("freq"), "token")
        ),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        rnd(F.regr_slope("y", "x"), 4).alias("zipf_slope"),
        rnd(F.regr_intercept("y", "x"), 4).alias("zipf_intercept"),
        rnd(F.regr_r2("y", "x"), 4).alias("zipf_r2"),
    )


def robots_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots Allow/Disallow filtering with RFC 9309 precedence
    (operators/webcrawl.robots_disallow_filter) over the shared
    messy-URL fixture: rules broadcast as ONE length-sorted rule-array
    row per host, verdicts from a scan-side first-match filter — the
    URL side is never shuffled or row-multiplied. Blocked share is
    host-dependent by construction (prefix Disallow on even sources,
    blanket '/' on src1 overridden by a LONGER Allow, an equal-length
    Allow/Disallow tie on src2 that Allow wins, no rules elsewhere);
    the DuckDB twin replays the same VALUES rules and the same
    longest-match/Allow-tie order through the shared canon CTEs."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", _messy_url().alias("url"))
    rules = spark.createDataFrame(
        list(ROBOTS_RULES), ["host", "prefix", "allow"]
    )
    out = WC.robots_disallow_filter(docs, rules, "url")
    return out.select(
        "doc_id",
        F.col("_canon").alias("canon_url"),
        "host",
        "blocked",
    ).orderBy("doc_id")


def robots_wildcard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 wildcard matching + user-agent group selection
    (operators/webcrawl.robots_disallow_filter with agent=
    'SampleBot') over the shared messy-URL fixture and the
    ROBOTS_WILDCARD_RULES bank: '*' any-sequence rules, trailing-'$'
    end anchors matched against PATH+QUERY (the 'Disallow: /*?'
    real-world profile), longest-rule-text precedence with Allow
    ties, and §2.2.1 group selection (a host's agent-specific group
    REPLACES its '*' group; hosts without one fall back). Same
    broadcast one-rule-array-per-host shape as robots_filter_docs —
    wildcard-free rules still match with plain startswith, wildcard
    rules with a once-per-rule compiled anchored regex. FULL DuckDB
    oracle: interpolates the rule bank WITH the Python-twin-compiled
    patterns (py_robots_rule_pattern, pinned equal to the Spark
    compile in tests/test_webcrawl.py) and replays group selection +
    precedence + match order."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", _messy_url().alias("url"))
    rules = spark.createDataFrame(
        list(ROBOTS_WILDCARD_RULES), ["host", "prefix", "allow", "agent"]
    )
    out = WC.robots_disallow_filter(docs, rules, "url", agent="SampleBot")
    return out.select(
        "doc_id",
        F.col("_canon").alias("canon_url"),
        "host",
        "blocked",
    ).orderBy("doc_id")


def sentence_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats (functions/text.sentences /
    sentence_stats) over documents, with a planted multi-sentence
    suffix on every 4th doc (exclamation/question terminators and a
    trailing period exercising the empty-tail filter). Mean words per
    sentence — the Gopher gate input — is derived with the
    engine-portable floor-form. Pure scan-side HOF codegen, zero
    shuffles before the output sort."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(
            d % 4 == 0,
            F.lit(" Is this a question? Yes! It ends now."),
        ).otherwise(F.lit("")),
    )
    from aws_de_final_project_spark.functions.text import sentence_stats

    st = sentence_stats(F.col("_raw"))
    docs = t["documents"].select("doc_id", raw.alias("_raw"))
    out = docs.select("doc_id", st.alias("_s")).select(
        "doc_id",
        F.col("_s.n_sentences").alias("n_sentences"),
        F.col("_s.total_words").alias("total_words"),
        rnd(
            F.col("_s.total_words")
            / F.nullif(F.col("_s.n_sentences"), F.lit(0)).cast(
                "double"
            ),
            4,
        ).alias("mean_words_per_sentence"),
        F.col("_s.max_chars").alias("max_sentence_chars"),
    )
    return out.orderBy("doc_id")


def anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-domain anchor-text term counts (operators/webcrawl
    .anchor_term_stats) over a deterministic HTML fixture: every doc
    carries an absolute-URL anchor with a multi-word label in an
    UNQUOTED href, every 2nd a second mixed-case/tracking-param href
    in a SINGLE-QUOTED one (canonicalization exercised on the
    target), every 3rd a relative link and every 5th a SELF link
    (both double-quoted) with a distinctive label — both excluded (no
    cross-host signal), which the oracle pins by their labels' terms
    never appearing; all three HTML quoting styles land on the
    extraction regex. Top-100 by count with a total-order tie-break.
    The page URL is clean lowercase so src_domain == constructed host
    (same simplification as the link-graph fixture)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    suffix = F.when(d % 11 == 0, F.lit(".co.uk")).otherwise(F.lit(".com"))
    src_host = F.concat(
        F.col("source"), F.lit("-"), (d % 7).cast("string"), suffix
    )
    url = F.concat(
        F.lit("http://"), src_host, F.lit("/d/"), d.cast("string")
    )
    html = F.concat(
        F.lit("<html><body>"),
        F.lit('<a href=http://Site'),
        ((d * 3 + 1) % 7).cast("string"),
        F.lit('.COM/p/'),
        d.cast("string"),
        F.lit('>Visit site '),
        ((d * 3 + 1) % 7).cast("string"),
        F.lit(" now</a>"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("<a class=\"l\" href='HTTPS://WWW.site"),
                ((d + 2) % 7).cast("string"),
                F.lit(".co.uk:443/x?utm_source=z&b=1'>Great Resource"),
                F.lit(" Hub</a>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0, F.lit('<a href="/about">Relative Only</a>')
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit('<a href="http://'),
                src_host,
                F.lit('/self">Selfish Label</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = t["documents"].select(
        url.alias("url"), html.alias("html")
    )
    return (
        WC.anchor_term_stats(pages, "url", "html")
        .orderBy(F.desc("n"), "dst_domain", "term")
        .limit(100)
    )


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of one BPE tokenizer-training iteration: the
    corpus-weighted frequency of every adjacent character pair, top-50
    (the pair a BPE trainer would merge next, plus runners-up).

    Classic two-phase shape, both phases map-side-combinable: (1) the
    word-frequency VOCABULARY aggregate — the corpus's 100 TB of text
    collapses to |vocab| rows before any per-character work happens,
    which is why BPE training over a web corpus is tractable at all;
    (2) adjacent pairs exploded from each vocab word weighted by its
    count — bounded by charset^2 (~1.3k rows here), so the second
    shuffle is constant-size. No UDFs: pairs come from a
    sequence+substr higher-order transform in codegen. FULL DuckDB
    oracle (same normalization, same comprehension, deterministic
    freq-then-pair ordering)."""
    t = load_tables(spark, sf_dir, ("documents",))
    words = (
        t["documents"]
        .select(
            F.explode(
                F.split(TX.normalized_text("text"), " ")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("freq"))
        .orderBy(F.desc("freq"), "pair")
        .limit(50)
    )


def registered_domain_psl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full public-suffix-algorithm domain extraction (operators/
    webcrawl.registered_domain_psl) over a deterministic host fixture
    that lands on every rule branch: 3-level exact (nsw.edu.au),
    4-level exact (pvt.k12.ma.us), 2-level IN-set (co.uk), wildcard
    (*.ck), exception (!www.ck), and the implicit * default (.zz).
    Output: (domain, n_docs) — grouped so the suffix separation is
    what the hash checks. FULL DuckDB oracle: the identical
    longest-match algorithm replayed with the same three interpolated
    rule arrays. The codegen path is the oracled one; the ~9k-rule
    deployment file runs through registered_domain_psl_arrow
    (agreement-tested in tests/test_webcrawl.py)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    k = (d % 7).cast("string")
    host = (
        F.when(d % 6 == 0, F.concat(F.lit("www.site"), k, F.lit(".nsw.edu.au")))
        .when(d % 6 == 1, F.concat(F.lit("sub.site"), k, F.lit(".co.uk")))
        .when(d % 6 == 2, F.concat(F.lit("a.site"), k, F.lit(".ck")))
        .when(d % 6 == 3, F.lit("sub.www.ck"))
        .when(d % 6 == 4, F.concat(F.lit("host"), k, F.lit(".example.zz")))
        .otherwise(
            F.concat(F.lit("www.school"), k, F.lit(".pvt.k12.ma.us"))
        )
    )
    docs = t["documents"].select(host.alias("host"))
    return (
        docs.select(WC.registered_domain_psl(F.col("host")).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("domain")
    )


def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL BPE tokenizer training (functions/text.bpe_train_merges):
    16 iterations of count-pairs / merge-argmax / greedy-rewrite over
    the corpus word-frequency vocabulary — the ordered merge table a
    GPT-2-style trainer ships, not just one iteration's candidates
    (which :func:`bpe_merge_candidates` keeps covering). The corpus
    is aggregated ONCE and materialized; training then runs on
    vocab-sized data with one argmax row per step crossing to the
    driver. FULL DuckDB oracle: the identical 16 iterations unrolled
    as chained CTEs with the identical boundary-encoded substring
    replace and the identical (freq DESC, lhs, rhs) tie-break."""
    from aws_de_final_project_spark.functions.text import (
        bpe_train_merges,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    vocab = (
        t["documents"]
        .select(
            F.explode(
                F.split(TX.normalized_text("text"), " ")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return bpe_train_merges(vocab, 16).orderBy("step")


def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer TRAINING
    (functions/text.unigram_train — r10 verdict item 6, the other
    mainstream tokenizer family next to BPE): seed piece bank from
    corpus-weighted substring counts (all single chars + top-48
    multi-char), then 2 EM rounds — E-step Viterbi segmentation of
    every vocabulary word under integer-quantized piece log-probs
    (RUNTIME HOF folds, constant expression size; ties take the
    smallest backpointer), M-step add-one re-count over the fixed
    bank. Runs on the same materialized |vocab| word aggregate as
    bpe_merge_table, and unlike BPE is fully relational: one
    broadcast join + one aggregate per round, no driver argmax.
    FULL DuckDB oracle: the identical seed/EM rounds unrolled as
    chained CTEs with the DP positions as lateral column aliases and
    the identical (floor(1e4*ln+0.5)) BIGINT quantization; Python
    from-the-definition ground truth in tests/test_curation.py."""
    from aws_de_final_project_spark.functions.text import unigram_train

    t = load_tables(spark, sf_dir, ("documents",))
    vocab = (
        t["documents"]
        .select(
            F.explode(
                F.split(TX.normalized_text("text"), " ")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return unigram_train(vocab)


def unigram_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale ENCODING with the trained unigram model
    (functions/text.unigram_word_stats): train on the word vocabulary
    (same seed + 2 EM rounds as :func:`unigram_lm_vocab`),
    Viterbi-segment every vocabulary word ONCE under the final
    scores, then encode documents by JOINING the |vocab|-row per-word
    stats table (broadcast) instead of re-running the DP per word
    occurrence — the shape a 100 TB encode pass wants. Per doc:
    word count, total piece count, mean 4dp piece log-prob over the
    doc's len>=2 normalized words. FULL DuckDB oracle: the same
    trained model plus one more unrolled Viterbi pass under the final
    scores and the same doc join."""
    from aws_de_final_project_spark.functions.text import (
        unigram_word_stats,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    words_per_doc = t["documents"].select(
        "doc_id",
        F.explode(F.split(TX.normalized_text("text"), " ")).alias("w"),
    ).filter(F.length("w") >= 2)
    vocab = words_per_doc.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    wstats = unigram_word_stats(vocab)
    docw = words_per_doc.select(
        "doc_id", F.substring("w", 1, 10).alias("w10")
    )
    joined = docw.join(F.broadcast(wstats), "w10")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            rnd(
                (F.sum("sum_s").cast("double") / F.lit(10000.0))
                / F.sum("n_pieces").cast("double"),
                4,
            ).alias("avg_piece_logp"),
        )
        .orderBy("doc_id")
    )


def script_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script-mix detection (functions/text.script_counts /
    dominant_script) over a fixture planting Cyrillic (every 5th
    doc), CJK+kana+hangul (every 7th), Greek (every 11th) and Arabic
    (every 13th) suffixes on the Latin base text — the routing signal
    multilingual curation uses (keep target script, flag confusable
    mixes). All BMP, so Java UTF-16 counts == DuckDB codepoint
    counts; pure regexp_count codegen, zero shuffles. FULL DuckDB
    oracle via the same interpolated \\x{{hhhh}} classes."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(d % 5 == 0, F.lit(" привет мир")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(" 日本語テスト 한국")).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit(" ελληνικά")).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(" مرحبا")).otherwise(F.lit("")),
    )
    base = t["documents"].select("doc_id", raw.alias("_raw"))
    counts = TX.script_counts(F.col("_raw"))
    return base.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        TX.dominant_script(F.col("_raw")).alias("script"),
    ).orderBy("doc_id")


def pii_card_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated payment-card scrubbing (operators/webcrawl
    .scrub_card_numbers): 13-19-digit candidates are Luhn-checked in
    a codegen fold and only VALID PANs become <CARD> — the detection
    rule regex alone cannot express, and the reason order ids and
    tracking numbers survive the scrub. Fixture plants a valid Visa
    (every 5th doc), a checksum-broken twin (every 7th), a valid Amex
    (every 11th), an invalid 13-digit run (every 13th) and a
    too-short run (every 3rd; never a candidate). Split/judge/rebuild
    — same pattern as the entity decoder: scan-side, zero shuffles.
    FULL DuckDB oracle: identical candidate pattern, identical Luhn
    fold, identical rebuild."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(d % 5 == 0, F.lit(" pay 4532015112830366 ok")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(" ref 4532015112830367 id")).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit(" amex 378282246310005 end")).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(" num 1234567890123 x")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit(" order 123456 short")).otherwise(F.lit("")),
    )
    counts = WC.card_number_counts(F.col("_raw"))
    return (
        t["documents"]
        .select("doc_id", raw.alias("_raw"))
        .select(
            "doc_id",
            counts["n_card_candidates"].alias("n_card_candidates"),
            counts["n_cards_valid"].alias("n_cards_valid"),
            WC.scrub_card_numbers(F.col("_raw")).alias("scrubbed"),
        )
        .orderBy("doc_id")
    )


def dsir_importance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring (operators/dsir.dsir_importance —
    Xie et al. 2023): every 13th document stands in for the
    high-quality TARGET seed corpus; the rest is the RAW pool to
    select from. Hashed-unigram (md5 mod 64) Laplace-smoothed
    log-ratio weights, summed per raw document. Both bucket-count
    aggregates collapse map-side to <= D rows per task; the weight
    table broadcasts; the per-doc sum is the one narrow keyed
    shuffle. FULL DuckDB oracle: identical buckets (md5 family),
    identical integer counts, identical smoothed ratios through the
    same libm ln, floor-rounded at 4dp. ``selected`` = importance > 0
    (more target-like than raw-like)."""
    from aws_de_final_project_spark.operators import dsir

    t = load_tables(spark, sf_dir, ("documents",))
    # 1-file scan = 1 task: parallelize the per-row bucket hashing
    # (both derived corpora share the ONE spread exchange via reuse)
    docs = spread(t["documents"])
    target = docs.filter(F.col("doc_id") % 13 == 0)
    raw = docs.filter(F.col("doc_id") % 13 != 0)
    out = dsir.dsir_importance(target, raw, "text", "doc_id")
    return out.select(
        "doc_id",
        "n_tokens",
        F.col("importance"),
        (F.col("importance") > 0).cast("int").alias("selected"),
    ).orderBy("doc_id")


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING at corpus scale (functions/text
    .bpe_encode_symbol_count): per-document symbol counts under the
    vendored 16-merge table — the inference side of BPE (training is
    bpe_merge_table), and the token count packing/sharding/budget
    stages key on. ONE codegen projection, zero shuffles before the
    output sort: boundary-encode, 16 ordered substring replaces,
    count. FULL DuckDB oracle: the identical replace chain with the
    identical interpolated pairs. compression = symbols/chars, the
    fertility signal tokenizer evaluations report."""
    from aws_de_final_project_spark.functions.numeric import (
        round_half_up as rnd,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    norm_len = F.length(TX.normalized_text("text") )
    syms = TX.bpe_encode_symbol_count("text")
    return (
        t["documents"]
        .select(
            "doc_id",
            norm_len.cast("long").alias("n_chars_norm"),
            syms.alias("n_bpe_symbols"),
            F.when(
                norm_len > 0,
                rnd(
                    syms.cast("double") / norm_len.cast("double"), 4
                ),
            ).alias("compression"),
        )
        .orderBy("doc_id")
    )


def bloom_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (operators/curation
    .bloom_build_mask / bloom_decontaminate): every 97th document
    stands in for the eval set, its 5-gram shingles are folded into a
    1 MiB / 2^23-bit / k=3 Bloom mask, and the remaining corpus is
    probed scan-side (JVM shingle+position codegen, numpy bit-test
    Arrow kernel, zero joins/shuffles of the doc side). The md5
    position family replays bit-identically in DuckDB, where "bit
    set" is checked as membership in the distinct-position set — the
    oracle therefore verifies the Bloom VERDICTS exactly, false
    positives included."""
    from aws_de_final_project_spark.operators import curation

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    rest = docs.filter(F.col("doc_id") % 97 != 0)
    mask = curation.bloom_build_mask(bench, ngram=5)
    return curation.bloom_decontaminate(rest, mask, ngram=5).orderBy(
        "doc_id"
    )


def streaming_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SESSIONIZATION under Structured Streaming
    (streaming/windows.session_stats_stream: watermark +
    ``session_window``, append mode) driven end-to-end over a bounded
    file replay — the second driver-checkable streaming entry, and the
    one that exercises watermark-driven session CLOSE + cross-batch
    session MERGE state, which the KMV replay (fold-only state) does
    not.

    Replay construction: events are split into two files at the exact
    epoch-time median (strictly time-ordered slices, so with a
    0-second watermark nothing is ever late-dropped and the stream
    must equal batch), plus two far-future SENTINEL slices for a
    synthetic user -1 (max ts + 2 h / + 4 h). maxFilesPerTrigger=1 +
    availableNow makes four micro-batches; TWO sentinels because the
    watermark a batch uses comes from the data seen through the
    PREVIOUS batch — the first raises event-time max, the second runs
    with the advanced watermark and emits every real session exactly
    once in append mode (the sentinel's own still-open session is
    filtered out). Sessions whose events straddle the median boundary
    arrive in different micro-batches and must merge in the state
    store before closing — the cross-batch merge one boundary
    exercises as well as two did, at one micro-batch less fixed cost
    (VERDICT r8 item 8).

    FULL DuckDB oracle: the same gaps-and-islands rewrite that checks
    the batch ``user_sessions`` twin — a green row proves
    stream == batch including merge order, not just that the plan ran.
    Runs on an isolated ``newSession`` (pinned UTC + small shuffle
    count, no leak into concurrent queries on the shared context); the
    memory-sink table is returned DIRECTLY (sessions share the JVM —
    re-collecting ~100k rows through the driver just to re-create the
    frame on the main session was the dominant fixed cost)."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from aws_de_final_project_spark.functions.numeric import epoch_us
    from aws_de_final_project_spark.streaming.windows import (
        session_stats_stream,
    )

    t = load_tables(spark, sf_dir, ("events",))
    events = t["events"].select("user_id", "ts")
    cuts = events.select(
        F.percentile(epoch_us("ts"), F.lit(0.5)).alias("c1"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    e = epoch_us("ts")
    import datetime as _dt

    tmp = tempfile.mkdtemp(prefix="sess_replay_")
    try:
        # ONE pass over events for both real slices (a slice column +
        # hash-repartition on it -> one file per slice dir), instead
        # of per-slice filter-writes that each rescan the table
        part_dir = os.path.join(tmp, "_parts")
        (
            events.withColumn(
                "_slice",
                F.when(e < F.lit(cuts.c1), 0).otherwise(1),
            )
            .repartition("_slice")
            .write.mode("overwrite")
            .partitionBy("_slice")
            .parquet(part_dir)
        )
        slice_files = []
        for i in range(2):
            d = os.path.join(part_dir, f"_slice={i}")
            f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
            slice_files.append(os.path.join(d, f))
        # sentinel members are single rows — write them straight from
        # the driver with pyarrow (zero Spark jobs; schema matches the
        # stream's explicit schema: int64 + timestamp[us] == NTZ)
        import pyarrow as pa
        import pyarrow.parquet as pq

        for off in (2, 4):
            p = os.path.join(tmp, f"sent{off}.parquet")
            pq.write_table(
                pa.table(
                    {
                        "user_id": pa.array([-1], pa.int64()),
                        "ts": pa.array(
                            [cuts.mx + _dt.timedelta(hours=off)],
                            pa.timestamp("us"),
                        ),
                    }
                ),
                p,
            )
            slice_files.append(p)
        for i, src in enumerate(slice_files):
            dst = os.path.join(tmp, f"f{i}.parquet")
            os.rename(src, dst)
            now = time.time()
            os.utime(dst, (now + i * 10, now + i * 10))
        shutil.rmtree(part_dir)
        iso = spark.newSession()
        # 2 state partitions: plenty for the fixture's key count; a
        # production stream sizes this to its key cardinality at
        # startup (per-batch state-commit cost scales with partitions)
        iso.conf.set("spark.sql.shuffle.partitions", "2")
        iso.conf.set("spark.sql.session.timeZone", "UTC")
        stream = (
            iso.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        qname = f"sess_replay_{uuid.uuid4().hex[:8]}"
        q = (
            session_stats_stream(stream, gap="30 minutes")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # the memory-sink table lives in the shared JVM and survives
        # the query; returning it directly skips a full driver
        # roundtrip of the result set (collect + re-create was ~40%
        # of this entry's fixed cost at sf0.1)
        return (
            iso.table(qname)
            .filter(F.col("user_id") >= 0)
            .orderBy("user_id", "session_start")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def html_table_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured HTML table extraction (operators/webcrawl
    .html_table_rows — r11 verdict item 9): each document becomes a
    page with a 3-row data table (header row with an entity + an
    inline tag in a cell), an UNCLOSED <tr> on every 3rd doc (the
    row must end at the next open tag), a NESTED table on every 4th
    (the outer capture truncates at the inner's first </table> and
    the outer's trailing row drops — the documented rule), and an
    all-caps <TABLE> on every 5th (case-insensitive tags). One row
    per CELL: (doc_id, table_idx, row_idx, col_idx, is_header,
    cell_text). Three posexplodes over scan-side regex work, zero
    joins, zero shuffles before the output sort. FULL DuckDB oracle
    replays the same split/extract pipeline (shared Java/RE2
    regexes, limit -1 splits, slice-off-first-fragment)."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    html = F.concat(
        F.lit("<html><body><p>"),
        F.col("text"),
        F.lit("</p><table class=\"t1\"><tr><th>field</th>"
              "<th>value &amp; &#x42;</th></tr>"
              "<tr><td>doc<b>id</b></td><td>"),
        d.cast("string"),
        F.lit("</td></tr>"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("<tr><td>open row "),
                (d % 7).cast("string"),
                F.lit("</td><td>x</td>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("<tr><td>n_chars</td><td>"),
        F.length("text").cast("string"),
        F.lit("</td></tr></table>"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("<table><tr><td>outer<table><tr><td>inner "),
                (d % 5).cast("string"),
                F.lit("</td></tr></table></td></tr>"
                      "<tr><td>lost</td></tr></table>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("<TABLE><TR><TD>caps "),
                (d % 11).cast("string"),
                F.lit("</TD></TR></TABLE>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    docs = t["documents"].select("doc_id", html.alias("html"))
    return WC.html_table_rows(docs, "html", "doc_id").orderBy(
        "doc_id", "table_idx", "row_idx", "col_idx"
    )


def tokenizer_roundtrip_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer ROUND-TRIP audit (r11 verdict item 5) — the
    decode(encode(x)) == x identity for BOTH trained families, per
    document: the BPE leg boundary-encodes the normalized text under
    the vendored merge table and strips the boundaries back
    (functions/text.bpe_boundary_encode/decode — merges only ever
    concatenate symbol contents, so the strip must recover the
    normalized text exactly); the unigram leg trains on the word
    vocabulary, Viterbi-segments every vocab word ONCE under the
    final scores (functions/text.unigram_word_pieces), checks
    array_join(reverse(pieces)) == w10 per word, and documents
    broadcast-join the |vocab|-row verdicts — the 100 TB audit shape
    (no per-occurrence DP). Output per doc: n_words (len>=2
    normalized words), n_pieces, bpe_roundtrip, unigram_roundtrip.
    FULL DuckDB oracle: the same replace-chain encode/strip and the
    same trained model + one more unrolled Viterbi pass with the
    piece reassembly compared in SQL."""
    from aws_de_final_project_spark.functions.text import (
        bpe_boundary_decode,
        bpe_boundary_encode,
        unigram_word_pieces,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    words_per_doc = t["documents"].select(
        "doc_id",
        F.explode(F.split(TX.normalized_text("text"), " ")).alias("w"),
    ).filter(F.length("w") >= 2)
    vocab = words_per_doc.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = unigram_word_pieces(vocab).select(
        "w10",
        F.size("pieces").cast("long").alias("n_pieces"),
        (
            F.array_join(F.reverse("pieces"), "") == F.col("w10")
        ).alias("_ok"),
    )
    docw = words_per_doc.select(
        "doc_id", F.substring("w", 1, 10).alias("w10")
    )
    uni = (
        docw.join(F.broadcast(wp), "w10")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.bool_and("_ok").alias("unigram_roundtrip"),
        )
    )
    bpe = t["documents"].select(
        "doc_id",
        (
            bpe_boundary_decode(bpe_boundary_encode("text"))
            == TX.normalized_text("text")
        ).alias("bpe_roundtrip"),
    )
    return (
        uni.join(bpe, "doc_id")
        .select(
            "doc_id", "n_words", "n_pieces", "bpe_roundtrip",
            "unigram_roundtrip",
        )
        .orderBy("doc_id")
    )


def tokenizer_export_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer model EXPORT with integrity manifest (r11 verdict
    item 5 — the SentencePiece model-file contract): train both
    families on the corpus word vocabulary, write the loadable
    artifacts (bpe_merges + unigram_vocab parquet) under a temp model
    dir with ``_manifest.json`` alongside
    (functions/text.export_tokenizer_model, the write_token_shards
    precedent), and return the manifest rows — (artifact, n_rows,
    checksum_xor) with the order-insensitive md5-XOR content
    checksum. FULL DuckDB oracle: replays BOTH trainings (the
    existing generated unrolled-CTE oracles as subqueries) and the
    same integer-field rendering + XOR, so a green row proves the
    EXPORTED artifact content, not just the write."""
    import shutil
    import tempfile

    from aws_de_final_project_spark.functions.text import (
        export_tokenizer_model,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    vocab = (
        t["documents"]
        .select(
            F.explode(
                F.split(TX.normalized_text("text"), " ")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # per-run mkdtemp (a fixed path would race concurrent driver +
    # builder runs); the manifest rows are materialized before cleanup
    out_dir = tempfile.mkdtemp(prefix="tokenizer_model_")
    try:
        manifest = export_tokenizer_model(vocab, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(
        [
            (a["artifact"], a["n_rows"], a["checksum_xor"])
            for a in manifest["artifacts"]
        ],
        "artifact string, n_rows long, checksum_xor long",
    ).orderBy("artifact")


def dedup_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup by sampled-frame perceptual hash (operators/
    multimodal: _parse_y4m_frames -> decode_video_to_frame_grids ->
    video_near_pairs — r11 verdict item 3), THROUGH THE REAL
    CONTAINER DECODER: every doc becomes a 6-frame 18x16 YUV4MPEG2
    stream whose luma is a 2x-upscaled 9x8 block grid in closed form
    from doc_id — box-mean decode recovers each block value EXACTLY,
    so the FULL DuckDB oracle replays the pipeline from the same
    arithmetic (grid -> dHash bands -> cross-video frame band join ->
    popcount verify -> per-video-pair count) without ever seeing the
    bytes. Docs with doc_id % 100 < 3 form 3-video groups sharing one
    base stream; the third member's EVEN frames carry a single-cell
    +29 bump (<= 2 flipped bits — the re-encode shape), so all 3
    in-group pairs must match on every sampled frame (f = 0, 2, 4)
    and clear min_matching_frames = 2. Output: (vid_a, vid_b,
    n_matching_frames). The guarded band join (exact collapse +
    hot-band cap) is the same machinery as dedup_image_phash."""
    import numpy as np

    from aws_de_final_project_spark.operators import multimodal as MM
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    # 1-file scan = 1 task: the Python Y4M generate + decode chain is
    # per-row-heavy — fan out first (a no-op at real scale)
    docs = spread(t["documents"].select("doc_id"))

    def gen(it):
        for pdf in it:
            ids, kinds, payloads = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                # aligned group anchor: the first 3 docs of each
                # 100-block share the block start (d - d % 3 would
                # misalign at d = 100k and collide with ungrouped
                # neighbors)
                anchor = d - d % 100 if d % 100 < 3 else d
                noisy = d % 100 == 2
                a197, a89 = anchor % 197, anchor % 89
                frames = []
                for f in range(6):
                    grid = [
                        ((a89 + 3) * (a197 + i + 1) * (i + 2)
                         * (f + 7)) % 197
                        + (29 if noisy and i == 40 and f % 2 == 0
                           else 0)
                        for i in range(72)
                    ]
                    y = np.repeat(
                        np.repeat(
                            np.array(grid, dtype=np.uint8).reshape(8, 9),
                            2, 0,
                        ),
                        2, 1,
                    )
                    frames.append(
                        b"FRAME\n" + y.tobytes() + bytes([128]) * 144
                    )
                payloads.append(
                    b"YUV4MPEG2 W18 H16 F25:1 Ip A1:1 C420jpeg\n"
                    + b"".join(frames)
                )
                ids.append(d)
                kinds.append("video")
            import pandas as pd

            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    media = docs.mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    grids = MM.decode_video_to_frame_grids(media, every_n=2)
    # max_band_freq=None: oracle replays the band join uncapped
    return MM.video_near_pairs(
        grids, "media_id", "frame_idx", "grid",
        max_hamming=3, min_matching_frames=2, max_band_freq=None,
    ).orderBy("vid_a", "vid_b")


def dedup_audio_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio near-dup by band-energy sign fingerprint (operators/
    multimodal: audio_energy_grid -> audio_fingerprint_pairs — r11
    verdict item 4): the entry synthesizes each doc's 9x8 quantized
    log-energy grid ARITHMETICALLY in closed form (the
    dedup_image_phash discipline — the REAL WAV -> rFFT -> grid
    composition is pinned by the planted amplitude-re-encode and
    white-noise tests in tests/test_multimodal.py, which drive the
    same hash from real PCM bytes), so the FULL DuckDB oracle replays
    hash, banding and verify verbatim. Docs with doc_id % 100 in
    [4, 8) form 4-audio groups sharing one energy pattern; odd
    members get a single-cell +17 bump (<= 2 flipped bits — the
    re-encode/transcode shape). Same guarded pigeonhole join as
    images (exact collapse + hot-band cap)."""
    from aws_de_final_project_spark.operators import multimodal as MM

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    grouped = (d % 100 >= 4) & (d % 100 < 8)
    anchor = F.when(grouped, d - d % 4).otherwise(d)
    noisy = grouped & (d % 2 == 1)
    a193 = anchor % 193
    a83 = anchor % 83
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(71)),
        lambda i: (
            ((a83 + 5) * (a193 + i + 2) * (i + 3)) % 193
            + F.when(noisy & (i == 31), F.lit(17)).otherwise(F.lit(0))
        ).cast("int"),
    )
    auds = t["documents"].select("doc_id", grid.alias("grid"))
    # max_band_freq=None: oracle replays the band join uncapped
    return MM.audio_fingerprint_pairs(
        auds, "doc_id", "grid", max_hamming=3, max_band_freq=None
    ).orderBy("audio_a", "audio_b")


def avro_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File source/sink (sources/avro_ocf —
    r11 verdict "missing" item 4, the Kafka-ecosystem row format):
    documents are written as deflate-codec OCF files (one per
    partition, executor-side — the sandbox lacks the spark-avro
    datasource module, so the container format is implemented
    directly under the restricted-profile stdlib-codec discipline;
    spec compliance vs the BUNDLED JVM avro jar is pinned in
    tests/test_avro.py), read back via a distributed binaryFile scan
    + Arrow-batched parse, and aggregated per lang with the
    order-independent 60-bit md5 content XOR — the oracle computes
    the same aggregate over the parquet ORIGINAL, so a green row
    proves the write->read roundtrip byte-lossless including full
    text content."""
    import shutil
    import tempfile

    from aws_de_final_project_spark.sources.avro_ocf import (
        read_avro_dir,
        write_avro_dir,
    )

    t = load_tables(spark, sf_dir, ("documents",))
    tmp = tempfile.mkdtemp(prefix="avro_rt_")
    try:
        write_avro_dir(
            t["documents"]
            .select("doc_id", "text", "lang", "n_chars")
            .repartition(4),
            tmp,
            codec="deflate",
        )
        back = read_avro_dir(
            spark, tmp,
            "doc_id long, text string, lang string, n_chars long",
        )
        chk = F.conv(
            F.substring(F.md5(F.col("text")), 1, 15), 16, 10
        ).cast("bigint")
        out = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
                F.bit_xor(chk).alias("text_checksum_xor"),
            )
            .orderBy("lang")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("lang")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def html_table_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-keyed table records (operators/webcrawl
    .html_table_records) over the SAME planted-table page as
    :func:`html_table_rows`: the first table's all-<th> first row
    keys its columns ('field'/'value & B'), the unclosed-<tr> and
    nested variants flow through the pinned extraction rules, and the
    caps table (no <th> row) falls back to positional col_<idx> keys.
    One hash aggregate for the all-th test + two narrow keyed joins
    on (doc, table[, col]) after the scan-side extraction. FULL
    DuckDB oracle: the shared cell-extraction CTE chain + the same
    header-selection and fallback SQL."""
    from aws_de_final_project_spark.operators import webcrawl as WC

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    html = F.concat(
        F.lit("<html><body><p>"),
        F.col("text"),
        F.lit("</p><table class=\"t1\"><tr><th>field</th>"
              "<th>value &amp; &#x42;</th></tr>"
              "<tr><td>doc<b>id</b></td><td>"),
        d.cast("string"),
        F.lit("</td></tr>"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("<tr><td>open row "),
                (d % 7).cast("string"),
                F.lit("</td><td>x</td>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("<tr><td>n_chars</td><td>"),
        F.length("text").cast("string"),
        F.lit("</td></tr></table>"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("<table><tr><td>outer<table><tr><td>inner "),
                (d % 5).cast("string"),
                F.lit("</td></tr></table></td></tr>"
                      "<tr><td>lost</td></tr></table>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("<TABLE><TR><TD>caps "),
                (d % 11).cast("string"),
                F.lit("</TD></TR></TABLE>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    docs = t["documents"].select("doc_id", html.alias("html"))
    return WC.html_table_records(docs, "html", "doc_id").orderBy(
        "doc_id", "table_idx", "row_idx", "col_idx"
    )


def video_scene_cut_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scene-change keyframe detection (operators/multimodal
    .video_scene_cuts) THROUGH the real Y4M decoder: every doc
    becomes a 6-frame video with TWO SCENES — frames 0-2 and 3-5
    share closed-form base patterns that differ by a scene term, and
    each frame adds a single-cell +1 jitter (<= 4 flipped bits
    between consecutive same-scene frames, far below the threshold),
    so the lag-window detector must fire exactly at frame 0 (first)
    and frame 3 (the scene change) wherever the scene delta clears
    min_hamming (the product form makes it ~32 bits for almost every
    anchor; the handful that land lower replay identically in the
    oracle). Output: (doc_id, frame_idx, hamming_prev, is_cut) for
    all six decoded frames. One narrow video-keyed lag window after
    the distributed decode; FULL DuckDB oracle replays grid -> bands
    -> lag -> threshold from the same arithmetic."""
    import numpy as np

    from aws_de_final_project_spark.operators import multimodal as MM
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    docs = spread(t["documents"].select("doc_id"))

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                a197, a89 = d % 197, d % 89
                frames = []
                for f in range(6):
                    scene = 0 if f < 3 else 1
                    grid = [
                        ((a89 + 3 + scene * 7) * (a197 + i + 1)
                         * (i + 2)) % 197
                        + (1 if i == 17 + f else 0)
                        for i in range(72)
                    ]
                    y = np.repeat(
                        np.repeat(
                            np.array(grid, dtype=np.uint8).reshape(8, 9),
                            2, 0,
                        ),
                        2, 1,
                    )
                    frames.append(
                        b"FRAME\n" + y.tobytes() + bytes([128]) * 144
                    )
                payloads.append(
                    b"YUV4MPEG2 W18 H16 F25:1 Ip A1:1 C420jpeg\n"
                    + b"".join(frames)
                )
                ids.append(d)
                kinds.append("video")
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    media = docs.mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    grids = MM.decode_video_to_frame_grids(media, every_n=1)
    return MM.video_scene_cuts(
        grids, "media_id", "frame_idx", "grid", min_hamming=8
    ).orderBy("media_id", "frame_idx")


def media_header_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only media metadata sniff (operators/multimodal
    .sniff_media_header / media_header_meta): every doc becomes one
    of four REAL container headers with closed-form fields — PNG
    (IHDR + CRC), header-only JPEG (SOI + APP0 + COM + SOF0, gray or
    3-component), GIF89a (logical screen descriptor), PCM WAV (RIFF +
    fmt + data sizing) — and the sniffer reads format/dims/depth/
    channels/rate WITHOUT decoding any pixel or sample data: the
    pre-decode filter pass a 100 TB multimodal pipeline runs first.
    FULL DuckDB oracle replays the field arithmetic per doc_id."""
    import struct
    import zlib

    from aws_de_final_project_spark.operators import multimodal as MM
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    docs = spread(t["documents"].select("doc_id"))

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                kind = d % 4
                if kind == 0:
                    w, h = (d % 13) + 3, (d % 7) + 2
                    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
                    p = (
                        b"\x89PNG\r\n\x1a\n"
                        + struct.pack(">I", 13) + b"IHDR" + ihdr
                        + struct.pack(
                            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
                        )
                        + struct.pack(">I", 0) + b"IEND"
                        + struct.pack(
                            ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
                        )
                    )
                elif kind == 1:
                    w, h = (d % 11) + 1, (d % 9) + 1
                    ncomp = 1 if d % 2 == 1 else 3
                    comp = b"".join(
                        struct.pack(">BBB", i + 1, 0x11, 0)
                        for i in range(ncomp)
                    )
                    sof = struct.pack(">BHHB", 8, h, w, ncomp) + comp
                    p = (
                        b"\xff\xd8"
                        + b"\xff\xe0" + struct.pack(">H", 7) + b"probe"
                        + b"\xff\xfe" + struct.pack(">H", 4) + b"hi"
                        + b"\xff\xc0"
                        + struct.pack(">H", 2 + len(sof)) + sof
                        + b"\xff\xd9"
                    )
                elif kind == 2:
                    w, h = (d % 300) + 1, (d % 200) + 1
                    p = (
                        b"GIF89a"
                        + struct.pack("<HH", w, h)
                        + bytes([d % 8]) + b"\x00\x00"
                    )
                else:
                    nch = 1 + (d % 2)
                    rate = 8000 * (1 + (d % 3))
                    n = (d % 50) + 10
                    dlen = n * nch * 2
                    p = (
                        b"RIFF" + struct.pack("<I", 36 + dlen) + b"WAVE"
                        + b"fmt " + struct.pack("<I", 16)
                        + struct.pack("<HHIIHH", 1, nch, rate,
                                      rate * nch * 2, nch * 2, 16)
                        + b"data" + struct.pack("<I", dlen)
                        + bytes(dlen)
                    )
                ids.append(d)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.media_header_meta(media).orderBy("media_id")


def dedup_image_quality_keepers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image exact-dup groups with QUALITY keeper selection
    (operators/multimodal.image_quality_keepers — the multimodal twin
    of dedup_corpus_quality_keepers): same closed-form grid fixture
    as dedup_image_exact_groups, with each image's owning document
    scored by the 4dp-deterministic quality_score; within each
    full-signature group the best-scoring copy survives (ties ->
    smallest id) — which copy survives matters when copies differ in
    caption/context quality. One window over the signature partition.
    FULL DuckDB oracle replays grid -> bands -> signature window ->
    quality rank."""
    from aws_de_final_project_spark.functions.text import quality_score
    from aws_de_final_project_spark.operators import multimodal as MM

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    anchor = F.when(d % 100 < 4, d - d % 4).otherwise(d)
    noisy = (d % 2 == 1) & (d % 100 < 4)
    a197 = anchor % 197
    a89 = anchor % 89
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(71)),
        lambda i: (
            ((a89 + 3) * (a197 + i + 1) * (i + 2)) % 197
            + F.when(noisy & (i == 40), F.lit(29)).otherwise(F.lit(0))
        ).cast("int"),
    )
    imgs = t["documents"].select(
        "doc_id", grid.alias("grid"),
        quality_score("text").alias("q"),
    )
    return MM.image_quality_keepers(
        imgs, "doc_id", "grid", "q"
    ).orderBy("keeper_id")


def _fixture_pdf_payload(d: int) -> bytes:
    """Closed-form PDF bytes for doc ``d`` (round-13 pdf_extract_stats
    fixture): 1 + d%3 pages, each page's content stream exercising
    literal strings WITH escaped parens, the T* newline operator, a
    kerned TJ array, and a hex string; pages alternate FlateDecode /
    raw; 3-page docs route page 2 through a NESTED /Pages node so the
    tree walk is exercised. d % 17 == 13 -> truncated payload,
    d % 17 == 5 -> /Encrypt in the trailer (both quarantine). The
    builder is independent of sources/pdf.py (encoder/parser pinned
    against each other, the media_header_stats discipline)."""
    import zlib as _zlib

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

    n_pages = 1 + d % 3
    contents = []
    for p in range(n_pages):
        line1 = f"Doc {d} page {p} (q{(7 * d + p) % 93})"
        line2 = f"tok{(d + p) % 11} #{d % 5}"
        hx = f"!x{(3 * d + p) % 29}".encode("latin-1").hex().encode()
        content = (
            b"BT /F1 12 Tf (" + esc(line1) + b") Tj T* ("
            + esc(line2) + b") Tj [(alpha) -120 ( beta "
            + str(p).encode() + b")] TJ <" + hx + b"> Tj ET"
        )
        contents.append(content)
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
    }
    page_obj = []
    for p, content in enumerate(contents):
        po, co = 3 + 2 * p, 4 + 2 * p
        data = _zlib.compress(content) if (d + p) % 2 == 0 else content
        filt = (b"/Filter /FlateDecode " if (d + p) % 2 == 0 else b"")
        objs[po] = (b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>"
                    % co)
        objs[co] = (b"<< /Length %d " % len(data) + filt
                    + b">>\nstream\n" + data + b"\nendstream")
        page_obj.append(po)
    if n_pages == 3:
        # nested tree: root kids = [page0, Pages[page1, page2]]
        objs[9] = (b"<< /Type /Pages /Parent 2 0 R /Kids [%d 0 R %d 0 R]"
                   b" /Count 2 >>" % (page_obj[1], page_obj[2]))
        kids = b"[%d 0 R 9 0 R]" % page_obj[0]
    else:
        kids = b"[" + b" ".join(b"%d 0 R" % po for po in page_obj) + b"]"
    objs[2] = (b"<< /Type /Pages /Kids " + kids
               + b" /Count %d >>" % n_pages)
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    maxn = max(objs)
    out += b"xref\n0 %d\n" % (maxn + 1) + b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        out += (b"%010d 00000 n \n" % offsets[num] if num in offsets
                else b"0000000000 65535 f \n")
    enc = b"/Encrypt 99 0 R " if d % 17 == 5 else b""
    out += (b"trailer\n<< /Size %d /Root 1 0 R " % (maxn + 1) + enc
            + b">>\nstartxref\n%d\n%%%%EOF" % xref_at)
    payload = bytes(out)
    return payload[:40] if d % 17 == 13 else payload


def pdf_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction (sources/pdf — VERDICT r12 "missing" item
    1, the top post-HTML corpus format) THROUGH THE REAL PARSER:
    every doc becomes a closed-form 1-3 page PDF (classic xref table,
    FlateDecode + raw streams, escaped-paren literals, T* newlines,
    kerned TJ arrays, hex strings, one NESTED page-tree level on
    3-page docs) built by an encoder independent of the parser; the
    parser walks xref -> catalog -> page tree -> content streams and
    extracts per-page text. Truncated (d%17==13) and encrypted
    (d%17==5) plants quarantine as (doc_id, NULL, NULL) rows — never
    fail the job. Output: (doc_id, page_idx, text, n_chars). The
    FULL DuckDB oracle reconstructs the expected text arithmetically
    from doc_id, so a green row proves builder -> parser -> text
    end-to-end byte-exact."""
    from aws_de_final_project_spark.operators.util import spread
    from aws_de_final_project_spark.sources import pdf as PDF

    t = load_tables(spark, sf_dir, ("documents",))
    # 1-file scan = 1 task: the per-row build+parse chain is Python-
    # heavy — fan out first (a no-op at real scale)
    docs = spread(t["documents"].select("doc_id"))

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = [int(x) for x in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_fixture_pdf_payload(d) for d in ids],
                }
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    pages = PDF.pdf_extract_pages(payloads, "doc_id", "payload")
    return pages.select(
        "doc_id", "page_idx", "text",
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id", "page_idx")


def _fixture_exif_jpeg(d: int) -> bytes:
    """Closed-form JPEG-with-EXIF bytes for doc ``d`` (round-13
    media_exif_stats / scrub_exif_gps_docs fixtures): alternating
    byte orders (II even / MM odd), orientation 1 + d%8, a zero-padded
    capture timestamp, GPS rational triples on d%5 < 2 (centisecond
    denominators -> exact milli-arcsecond arithmetic), a corrupt
    byte-order-mark plant on d%23 == 7 and a no-EXIF plant on
    d%23 == 15. Independent of the parser under test."""
    import struct as _s

    if d % 23 == 15:
        tiff = None
    else:
        e = "<" if d % 2 == 0 else ">"
        gps = (d % 5 < 2) or (d % 23 == 7)
        n0 = 3 if gps else 2
        ifd0_size = 2 + 12 * n0 + 4
        gps_at = 8 + ifd0_size
        gps_size = 54 if gps else 0
        data_at = 8 + ifd0_size + gps_size
        data = bytearray()

        def defer(b: bytes) -> int:
            off = data_at + len(data)
            data.extend(b)
            return off

        dt = (f"2024:{1 + d % 12:02d}:{1 + d % 28:02d} "
              f"{d % 24:02d}:{d % 60:02d}:{(3 * d) % 60:02d}")
        raw_dt = dt.encode() + b"\x00"
        ents = [
            _s.pack(e + "HHI", 0x0112, 3, 1)
            + _s.pack(e + "H", 1 + d % 8) + b"\x00\x00",
        ]
        dt_off = defer(raw_dt)
        ents.append(_s.pack(e + "HHII", 0x0132, 2, len(raw_dt), dt_off))
        gps_ifd = b""
        if gps:
            ents.append(_s.pack(e + "HHII", 0x8825, 4, 1, gps_at))
            lat = ((d % 90, 1), ((3 * d) % 60, 1), ((7 * d) % 6000, 100))
            lon = (((11 * d) % 180, 1), ((13 * d) % 60, 1),
                   ((17 * d) % 6000, 100))
            lat_off = defer(b"".join(
                _s.pack(e + "II", n, dn) for n, dn in lat))
            lon_off = defer(b"".join(
                _s.pack(e + "II", n, dn) for n, dn in lon))
            lat_ref = b"N\x00" if d % 4 < 2 else b"S\x00"
            lon_ref = b"E\x00" if d % 3 == 0 else b"W\x00"
            gents = [
                _s.pack(e + "HHI", 0x0001, 2, 2) + lat_ref + b"\x00\x00",
                _s.pack(e + "HHII", 0x0002, 5, 3, lat_off),
                _s.pack(e + "HHI", 0x0003, 2, 2) + lon_ref + b"\x00\x00",
                _s.pack(e + "HHII", 0x0004, 5, 3, lon_off),
            ]
            gps_ifd = (_s.pack(e + "H", 4) + b"".join(gents)
                       + _s.pack(e + "I", 0))
        ifd0 = _s.pack(e + "H", n0) + b"".join(ents) + _s.pack(e + "I", 0)
        bom = (b"XX" if d % 23 == 7
               else (b"II" if e == "<" else b"MM"))
        tiff = bom + _s.pack(e + "HI", 42, 8) + ifd0 + gps_ifd + bytes(data)
    sof = (b"\xff\xc0" + _s.pack(">H", 11)
           + _s.pack(">BHHB", 8, 16, 16, 1) + b"\x01\x11\x00")
    app1 = b""
    if tiff is not None:
        app1 = (b"\xff\xe1" + _s.pack(">H", 8 + len(tiff))
                + b"Exif\x00\x00" + tiff)
    return b"\xff\xd8" + app1 + sof + b"\xff\xd9"


def _exif_fixture_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    docs = spread(t["documents"].select("doc_id"))

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = [int(x) for x in pdf["doc_id"]]
            yield pd.DataFrame(
                {"media_id": ids,
                 "payload": [_fixture_exif_jpeg(d) for d in ids]}
            )

    return docs.mapInPandas(gen, "media_id long, payload binary")


def media_exif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction (operators/multimodal:
    parse_jpeg_exif — VERDICT r12 "missing" item 3) THROUGH THE REAL
    APP1/TIFF IFD WALKER over closed-form JPEG fixtures: both byte
    orders (II/MM alternating by doc parity — the endianness pin),
    orientation, zero-padded capture timestamp, and GPS rational
    triples on d%5 < 2 converted to signed integer milli-arcseconds
    (exact — centisecond denominators, no float drift). Corrupt
    byte-order plants (d%23==7) quarantine as NULL-has_exif rows;
    no-EXIF plants (d%23==15) report has_exif = false. FULL DuckDB
    oracle reconstructs every field arithmetically from doc_id."""
    from aws_de_final_project_spark.operators import multimodal as MM

    media = _exif_fixture_media(spark, sf_dir)
    return (
        MM.media_exif_meta(media)
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    )


def scrub_exif_gps_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS PII scrub (operators/multimodal: strip_jpeg_exif_gps —
    the image-corpus privacy analogue of pii_scrub_docs): GPS-bearing
    JPEGs have their whole Exif APP1 segment spliced out losslessly;
    non-GPS payloads pass through byte-identical; corrupt payloads
    quarantine with the payload preserved. The audit columns
    (clean_len, bytes_removed) are fully determined by the fixture's
    closed-form segment layout, so the DuckDB oracle pins the splice
    byte-exactly; the Spark-side agreement test additionally re-walks
    the cleaned payload (has_exif must flip to false)."""
    from aws_de_final_project_spark.operators import multimodal as MM

    media = _exif_fixture_media(spark, sf_dir)
    return (
        MM.scrub_exif_gps(media)
        .select(
            F.col("media_id").alias("doc_id"),
            "had_gps", "clean_len", "bytes_removed",
        )
        .orderBy("doc_id")
    )


def image_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair mining (operators/webcrawl:
    image_caption_candidates + best_caption_per_image — VERDICT r12
    "missing" item 2, the CLIP-style multimodal pairing step) over a
    deterministic page wrapping of each document that plants every
    pairing class: a SHARED image (one URL per 10-doc block — the
    dedup-group shape) captioned by alt in alternating quote styles
    (double-quoted with an &amp; entity on even docs, single-quoted
    on odd, unquoted src on d%5==0), a per-doc <figure> image whose
    caption comes from <figcaption> (no alt — the fallback channel),
    plus three MUST-VANISH plants: a relative src, a self-referencing
    src (the page URL), and an alt-less/figure-less image. Extraction,
    entity decode, canonicalization and the figcaption lookup are all
    scan-side; the single shuffle is the img_url-keyed best-caption
    window. FULL DuckDB oracle replays candidates + window
    arithmetically from doc_id."""
    from aws_de_final_project_spark.operators import webcrawl as WC
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    docs = spread(t["documents"].select("doc_id"))
    d = F.col("doc_id")
    ds = d.cast("string")
    page_url = F.concat(
        F.lit("http://site"), (d % 20).cast("string"),
        F.lit(".example.com/p/"), ds,
    )
    shared_src = F.concat(
        F.lit("http://images.example.com/shared/"),
        (d - d % 10).cast("string"), F.lit(".jpg"),
    )
    alt_txt = F.when(
        d % 2 == 0,
        F.concat(F.lit("Alt "), ds, F.lit(" &amp; stuff")),
    ).otherwise(F.concat(F.lit("Alt "), ds, F.lit(" plain")))
    shared_img = F.when(
        d % 5 == 0,
        F.concat(F.lit("<img src="), shared_src,
                 F.lit(' alt="'), alt_txt, F.lit('">')),
    ).when(
        d % 2 == 0,
        F.concat(F.lit('<img src="'), shared_src,
                 F.lit('" alt="'), alt_txt, F.lit('">')),
    ).otherwise(
        F.concat(F.lit("<img src='"), shared_src,
                 F.lit("' alt='"), alt_txt, F.lit("'>")),
    )
    fig_src = F.concat(
        F.lit("http://cdn"), (d % 7).cast("string"),
        F.lit(".example.org/f/"), ds, F.lit(".gif"),
    )
    fig_block = F.concat(
        F.lit('<figure class="x"><img src="'), fig_src,
        F.lit('"><figcaption>Fig '), ((d * 3) % 13).cast("string"),
        F.lit(" of doc "), ds, F.lit("</figcaption></figure>"),
    )
    html = F.concat(
        F.lit("<html><body><h1>Doc "), ds, F.lit("</h1>"),
        shared_img,
        F.lit('<img src="/rel/'), ds, F.lit('.png" alt="rel">'),
        F.lit('<img src="'), page_url, F.lit('" alt="self">'),
        F.lit('<img src="http://images.example.com/noalt/'), ds,
        F.lit('.jpg">'),
        fig_block,
        F.lit("</body></html>"),
    )
    pages = docs.select("doc_id", page_url.alias("url"),
                        html.alias("html"))
    cands = WC.image_caption_candidates(pages, "doc_id", "url", "html")
    return WC.best_caption_per_image(cands).orderBy("img_url")


def _chat_fixture_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form JSONL chat lines from doc_id (round-13 chat
    entries): optional leading system turn (d%4==0), 1-2 user/
    assistant pairs, prompt text with case/whitespace noise on odd
    docs (normalization must fold it), and one planted violation
    class per d%13 residue — 0: opens with assistant, 1: non-leading
    system, 3: duplicated user turn, 5: 70-token prompt (budget),
    7: whitespace-only last assistant, 9: unknown role 'bot',
    11: trailing user turn. d%17==2 is a malformed-JSON plant. Each
    class violates EXACTLY one suite check (the protocol checks run
    on the user/assistant subsequence, so foreign/system turns don't
    cascade into alternation failures)."""
    from aws_de_final_project_spark.operators.util import spread

    t = load_tables(spark, sf_dir, ("documents",))
    docs = spread(t["documents"].select("doc_id"))

    def gen(it):
        import json as _json

        import pandas as pd

        for pdf in it:
            ids, lines = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                ids.append(d)
                if d % 17 == 2:
                    lines.append("{broken json line")
                    continue
                k = d % 25
                if d % 13 == 5:
                    prompt = "w " * 69 + "w"
                elif d % 2 == 1:
                    prompt = (f"QUESTION  {k} ON  TOPIC {k % 5}"
                              f"  PLEASE")
                else:
                    prompt = f"Question {k} on topic {k % 5} please"
                msgs = []
                if d % 4 == 0:
                    msgs.append(("system", "be helpful"))
                if d % 13 == 0:
                    msgs.append(("assistant", f"intro {d}"))
                msgs.append(("user", prompt))
                if d % 13 == 3:
                    msgs.append(("user", prompt))
                if d % 13 == 1:
                    msgs.append(("system", "late note"))
                msgs.append(("assistant", f"answer {d} part 0"))
                if d % 2 == 1:
                    msgs.append(("user", f"follow up {d}"))
                    msgs.append(("assistant", f"answer {d} part 1"))
                if d % 13 == 7:
                    msgs[-1] = ("assistant", "   ")
                if d % 13 == 9:
                    msgs.append(("bot", "beep"))
                if d % 13 == 11:
                    msgs.append(("user", f"bye {d}"))
                lines.append(_json.dumps({"messages": [
                    {"role": r, "content": c} for r, c in msgs
                ]}))
            yield pd.DataFrame({"conv_id": ids, "line": lines})

    return docs.mapInPandas(gen, "conv_id long, line string")


def chat_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat/SFT record validation (operators/chat.chat_check_suite —
    VERDICT r12 "missing" item 5): JSONL chat lines parse through
    from_json with the explicit schema (malformed lines -> NULL,
    counted, never dropped silently), then EIGHT role-protocol /
    content checks run in ONE scan + one hash aggregate
    (operators/dq.check_suite underneath). The fixture plants exactly
    one violation class per d%13 residue, so the FULL DuckDB oracle
    states each check's violation count arithmetically."""
    from aws_de_final_project_spark.operators import chat as CH

    convs = CH.parse_chat_lines(
        _chat_fixture_lines(spark, sf_dir), "line"
    )
    return CH.chat_check_suite(convs)


def chat_prompt_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-level dedup across conversations (operators/chat
    .chat_prompt_dedup_against_registry -> operators/dedup
    .dedup_against_state — the incremental fingerprint-registry path:
    history is NEVER rescanned, shuffle volume is batch-sized). The
    history batch (conv_id%100 < 20) seeds the registry with prompts
    q0..q19 (+ the budget-plant mega-prompt); the new batch's
    survivors are the first arrivals of the five never-seen prompts
    q20..q24 — case/whitespace noise on odd docs MUST fold into the
    same fingerprint for the counts to match. FULL DuckDB oracle
    replays normalization + md5 fingerprints + the registry
    anti-join."""
    from aws_de_final_project_spark.operators import chat as CH
    from aws_de_final_project_spark.operators import dedup as DD

    convs = CH.parse_chat_lines(
        _chat_fixture_lines(spark, sf_dir), "line"
    )
    hist = convs.filter(F.col("conv_id") % 100 < 20)
    batch = convs.filter(F.col("conv_id") % 100 >= 20)
    registry = (
        hist.select(
            "conv_id", CH.normalized_prompt().alias("_prompt")
        )
        .filter(F.col("_prompt").isNotNull())
        .select(
            DD.fingerprint("_prompt").alias("fp"), F.col("conv_id")
        )
        .groupBy("fp")
        .agg(F.min("conv_id").alias("keeper_id"))
    )
    kept, _new_state = CH.chat_prompt_dedup_against_registry(
        batch, registry
    )
    return kept.orderBy("conv_id")


def chat_prompt_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate prompt pairs across conversations: the portable
    MinHash+LSH pipeline (operators/dedup.minhash_lsh_pairs_portable)
    applied to the normalized first-user-turn prompt — the rephrase
    channel exact fingerprints cannot catch. Fixture: docs with
    d%100 < 4 form 4-prompt groups per 100-block (two verbatim
    copies, a 'three'->'five' rewrite at J=0.647, a 'review'->
    'standup' rewrite at J=0.867 — group size FIXED at 4, so pair
    volume stays linear in corpus size); other docs carry unique
    prompts whose pairwise word-3-gram Jaccard is <= 3/17 (must be
    verify-rejected even when a band collides). FULL DuckDB oracle: the
    parameterized minhash twin runs over the identical closed-form
    prompt expression — banding recall at mid-J is a deterministic
    property of the md5 family, replayed exactly, never assumed."""
    from aws_de_final_project_spark.operators import chat as CH
    from aws_de_final_project_spark.operators import dedup as DD

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    anchor = (d - d % 100).cast("string")
    # block-anchor tokens at FOUR spread positions: cross-block pairs
    # share only 4 of 16 word-3-gram shingles (J=0.14 — band-collision
    # probability ~4e-4, so grouped docs never pair across blocks and
    # pair volume stays linear); within-block rewrites sit at
    # J=0.68/0.88/0.60, all above the 0.5 verify threshold
    a1 = (d - d % 100 + 1).cast("string")
    a2 = (d - d % 100 + 2).cast("string")
    a3 = (d - d % 100 + 3).cast("string")
    prompt = F.when(
        d % 100 < 4,
        F.concat(
            F.lit("please summarize document "), anchor,
            F.lit(" about "), a1,
            F.lit(" spark shuffles "), a2,
            F.lit(" partitions in "),
            F.when(d % 100 == 2, F.lit("five")).otherwise(F.lit("three")),
            F.lit(" short bullet "), a3,
            F.lit(" points for "),
            F.when(d % 100 == 3, F.lit("standup"))
            .otherwise(F.lit("review")),
        ),
    ).otherwise(
        # a d-dependent token every <=2 words: no two distinct docs
        # share 3 consecutive words, so the word-3-gram Jaccard
        # between any two unique prompts is <= 3/17 — far below the
        # 0.5 verify threshold (an earlier tail with a 6-word shared
        # run verified same-residue pairs at J=0.54 and went
        # QUADRATIC in the residue group size; caught at sf0.01)
        F.concat(
            F.lit("unique ask "), d.cast("string"),
            F.lit(" q "), (d % 7).cast("string"),
            F.lit(" prompt "), (d * 3).cast("string"),
            F.lit(" about "), ((d * 7) % 13).cast("string"),
            F.lit(" topic "), (d % 11).cast("string"),
            F.lit(" end"),
        )
    )
    msgs = F.array(
        F.struct(F.lit("user").alias("role"), prompt.alias("content")),
        F.struct(
            F.lit("assistant").alias("role"),
            F.concat(F.lit("answer "), d.cast("string")).alias("content"),
        ),
    )
    convs = t["documents"].select(
        d.alias("conv_id"), msgs.alias("messages")
    )
    prompts = convs.select(
        "conv_id", CH.normalized_prompt().alias("prompt")
    )
    return (
        DD.minhash_lsh_pairs_portable(
            prompts, "prompt", "conv_id", threshold=0.5
        )
        .select(
            F.col("doc_a").alias("conv_a"),
            F.col("doc_b").alias("conv_b"),
            "jaccard",
        )
        .orderBy("conv_a", "conv_b")
    )


def chat_loss_mask_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask token accounting (operators/chat
    .chat_loss_mask_stats): only assistant tokens receive loss, so
    the budgeting numbers a post-training pipeline reports are
    total / trainable / masked token counts and the trainable ratio
    per conversation. Runs over the shared chat fixture — every
    turn's whitespace token count is closed-form in doc_id (the d%13
    violation classes shift the sums in known ways: the budget plant
    adds 64 masked tokens, the empty-content plant collapses the
    last assistant turn to 1, the duplicate-user plant doubles the
    prompt's masked mass), so the FULL DuckDB oracle states all four
    columns arithmetically. Pure HOF projection, zero shuffles."""
    from aws_de_final_project_spark.operators import chat as CH

    convs = CH.parse_chat_lines(
        _chat_fixture_lines(spark, sf_dir), "line"
    )
    return CH.chat_loss_mask_stats(convs).orderBy("conv_id")


def chat_prompt_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free conversation split (operators/chat
    .chat_prompt_split): the hash-range 80/10/10 split keyed by the
    NORMALIZED PROMPT fingerprint instead of the conversation id —
    re-asks of one prompt always land in the same split, so eval
    prompts cannot leak into training as the corpus grows (the
    split_train_val_test_docs stability contract, lifted to the
    prompt level; the leakage property itself is pinned in
    tests/test_chat.py). Pure projection, zero shuffles. FULL DuckDB
    oracle replays the md5-derived uniform on the closed-form
    prompt."""
    from aws_de_final_project_spark.operators import chat as CH

    convs = CH.parse_chat_lines(
        _chat_fixture_lines(spark, sf_dir), "line"
    )
    return CH.chat_prompt_split(convs).orderBy("conv_id")


def image_caption_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-aware image dedup keepers (operators/multimodal
    .image_caption_keepers — the composition VERDICT r12 item 3
    described: phash groups decide which pixels survive, captions
    decide which copy's text survives with them). Fixture: the
    product-form grid family WITHOUT the noise bump, so each
    d%100 < 4 block's four images share one exact 64-bit signature;
    captions are closed-form with odd members carrying a longer
    variant — the keeper must be the smallest odd member, carrying
    its caption. One signature-partition window, no joins. FULL
    DuckDB oracle replays grid -> dHash bands -> signature window ->
    caption ordering."""
    from aws_de_final_project_spark.operators import multimodal as MM

    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    anchor = F.when(d % 100 < 4, d - d % 4).otherwise(d)
    a197 = anchor % 197
    a89 = anchor % 89
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(71)),
        lambda i: (
            ((a89 + 3) * (a197 + i + 1) * (i + 2)) % 197
        ).cast("int"),
    )
    caption = F.concat(
        F.lit("caption "), d.cast("string"),
        F.lit(" for block "), (d - d % 100).cast("string"),
        F.when(d % 2 == 1, F.lit(" with extra rich detail"))
        .otherwise(F.lit("")),
    )
    imgs = t["documents"].select(
        "doc_id", grid.alias("grid"), caption.alias("caption")
    )
    return MM.image_caption_keepers(
        imgs, "doc_id", "grid", "caption"
    ).orderBy("keeper_id")


def chat_render_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChatML rendering (operators/chat.render_chat_template) over
    the shared chat fixture: every conversation serializes to the
    exact training text an SFT trainer consumes, byte-deterministic.
    The FULL DuckDB oracle re-assembles the rendered string from the
    same closed-form message list (every d%13 violation class, the
    case/whitespace prompt noise VERBATIM — double spaces included —
    and the d%4 system turns), so a green row pins the template
    serialization end-to-end, not just its lengths."""
    from aws_de_final_project_spark.operators import chat as CH

    convs = CH.parse_chat_lines(
        _chat_fixture_lines(spark, sf_dir), "line"
    )
    return CH.render_chat_template(convs).orderBy("conv_id")


def chat_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT sequence packing (operators/segments.pack_sequences over
    rendered conversations): each conversation serializes to a
    space-clean token stream (``<|im_start|>role`` marker token,
    whitespace-normalized content tokens, ``<|im_end|>`` token per
    turn — empty contents contribute just the two markers), then the
    concat-and-chunk packer lays conversations end-to-end per shard
    and cuts every 128 tokens; a conversation crossing a cut belongs
    to every sequence it overlaps with (begin_tok, end_tok) spans.
    The step between ChatML rendering and the trainer's data loader.
    Per-shard window only (never a global window); one shuffle. FULL
    DuckDB oracle: per-conversation token counts are closed-form in
    doc_id (2 + content tokens per turn), and the pack math replays
    with the same per-shard cumulative-sum window."""
    from aws_de_final_project_spark.operators import chat as CH
    from aws_de_final_project_spark.operators import segments as SEG

    convs = CH.parse_chat_lines(
        _chat_fixture_lines(spark, sf_dir), "line"
    )
    m = F.col("messages")
    stream = F.aggregate(
        m,
        F.lit(""),
        lambda acc, s: F.concat(
            acc,
            F.when(acc == F.lit(""), F.lit("")).otherwise(F.lit(" ")),
            F.lit("<|im_start|>"), s["role"],
            F.when(
                F.trim(s["content"]) == F.lit(""), F.lit("")
            ).otherwise(
                F.concat(
                    F.lit(" "),
                    F.regexp_replace(F.trim(s["content"]), r"\s+", " "),
                )
            ),
            F.lit(" <|im_end|>"),
        ),
    )
    base = convs.filter(m.isNotNull()).select(
        "conv_id", stream.alias("text")
    )
    return SEG.pack_sequences(
        base, text_col="text", id_col="conv_id", budget=128, n_shards=4
    ).orderBy("conv_id", "shard", "seq_id")


def streaming_chat_validation_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING chat validation (operators/chat
    .chat_violation_counts_stream) driven end-to-end over a bounded
    3-slice replay of the chat JSONL fixture — the fifth
    driver-checkable streaming entry: protocol/content violation
    counts fold across micro-batches in one complete-mode global
    aggregate (state = eight longs), and because each conversation
    arrives exactly once the final fold must equal the BATCH suite
    over the full corpus — which is exactly what the shared
    chat_validation_suite oracle computes, so the oracle match proves
    stream == batch. Replay mechanics are the streaming_kmv_replay
    harness (slice parquet + maxFilesPerTrigger=1 + availableNow +
    isolated small-shuffle session)."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from aws_de_final_project_spark.operators import chat as CH

    lines = _chat_fixture_lines(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="chatval_replay_")
    try:
        part_dir = os.path.join(tmp, "_parts")
        (
            lines.withColumn(
                "_slice", (F.col("conv_id") % 3).cast("int")
            )
            .repartition("_slice")
            .write.mode("overwrite")
            .partitionBy("_slice")
            .parquet(part_dir)
        )
        for i in range(3):
            d = os.path.join(part_dir, f"_slice={i}")
            f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
            dst = os.path.join(tmp, f"f{i}.parquet")
            os.rename(os.path.join(d, f), dst)
            now = time.time()
            os.utime(dst, (now + i * 10, now + i * 10))
        shutil.rmtree(part_dir)
        iso = spark.newSession()
        iso.conf.set("spark.sql.shuffle.partitions", "2")
        stream = (
            iso.readStream.schema("conv_id long, line string")
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        convs = CH.parse_chat_lines(stream, "line")
        qname = f"chatval_replay_{uuid.uuid4().hex[:8]}"
        q = (
            CH.chat_violation_counts_stream(convs)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = iso.sql(f"SELECT * FROM {qname}").collect()
        assert len(final) == 1
        row = final[0].asDict()
        return spark.createDataFrame(
            [(k, int(v), int(v) == 0) for k, v in sorted(row.items())],
            "check_name string, violations long, passed boolean",
        ).orderBy("check_name")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
