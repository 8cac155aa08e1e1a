"""Segment-level corpus operators: re-lineation, C4-style line dedup,
RAG chunking with overlap, and concat-and-chunk sequence packing.

These operate BELOW document granularity — the unit a pretraining
pipeline actually trains on (reference scope: AWS_DE_Final_Project
processes whole records end-to-end, `Glue Script/process_crime_data.py`;
these extend the engine's documents table to the segment level):

* :func:`relineate` — deterministic positional explode of a document
  into lines. Corpora with real newlines split on them; this synthetic
  corpus is single-line, so ``words_per_line`` groups whitespace words
  into fixed-width pseudo-lines, making the operator (and its dedup
  consumer) exercise real multi-line shapes.
* :func:`line_dedup` — C4's "discard duplicate lines across the whole
  corpus, keep the first occurrence" rule, with document reassembly.
* :func:`chunk_text` — fixed-size sliding character windows (RAG
  chunking), tail-covering, with (begin, end) offsets.
* :func:`pack_sequences` — concat-and-chunk packing of token streams
  into fixed-budget training sequences (the GPT-style "concatenate all
  docs, cut every N tokens" step), sharded so no global-order window
  exists anywhere in the plan.

Scale notes: every shuffle here is on a key with corpus-proportional
cardinality (line hash, doc id, shard) — nothing collapses to a single
partition. ``pack_sequences`` deliberately packs per shard: a global
``Window.orderBy`` with no partition key would serialize 100 TB through
one task, so sequence ids are (shard, seq) pairs, which is exactly how
distributed tokenizer-packers shard their output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_de_final_project_spark.operators.util import spread


def relineate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """Positional explode of ``text_col`` into pseudo-lines of
    ``words_per_line`` whitespace words: (id_col, pos, line).

    Pure narrow transform (split + transform + posexplode) — no
    shuffle; the explode multiplies rows scan-side where Spark can
    spill per-partition.
    """
    k = int(words_per_line)
    lines = F.expr(
        f"transform(sequence(0, cast(ceil(size(split({text_col}, ' ')) / {k}.0) "
        f"as int) - 1), k -> concat_ws(' ', slice(split({text_col}, ' '), "
        f"k * {k} + 1, {k})))"
    )
    return df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """C4-style corpus-global line dedup: a line (as produced by
    :func:`relineate`) is kept only at its first occurrence —
    smallest (id, pos) over the WHOLE corpus — and every document is
    reassembled from its surviving lines in original order.

    Output: (id_col, n_lines, n_kept, text_dedup) — one row per input
    document; a fully-duplicated document survives with an empty
    string (the caller filters, same contract as the reference's
    empty-response guard keeping the pipeline total-row-preserving).

    Scale shape: one shuffle keyed on the line fingerprint (md5 —
    portable, and uniform so no skew even on boilerplate lines), one
    shuffle keyed on id for reassembly. First-occurrence is a
    min(struct(id, pos)) aggregate — map-side partial, no window over
    an unpartitioned ordering. 100 TB: both keys have corpus-scale
    cardinality; nothing funnels to one task.
    """
    lines = relineate(spread(df), text_col, id_col, words_per_line)
    fp = lines.select(
        F.col(id_col), "pos", "line", F.md5("line").alias("_fp")
    )
    first = fp.groupBy("_fp").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    kept = (
        fp.join(first, "_fp")
        .filter(
            (F.col(id_col) == F.col("_first")[id_col])
            & (F.col("pos") == F.col("_first.pos"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("text_dedup"),
        )
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(kept, id_col, "left").select(
        F.col(id_col),
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 120,
    stride: int = 80,
) -> DataFrame:
    """Sliding-window character chunking (RAG ingestion): chunk ``k``
    covers characters [k*stride+1, k*stride+size], 1-based inclusive;
    windows overlap by ``size - stride`` chars and the last window is
    the first one whose end reaches the text end (tail-covering, no
    degenerate empty chunk). Short texts yield exactly one chunk.

    Output: (id_col, chunk_id, begin_char, end_char, chunk).

    Narrow transform only — sequence + posexplode + substring; chunk
    count per row is data-dependent but bounded by len/stride, and the
    explode happens scan-side (no shuffle at all).
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError(
            f"need 0 < stride <= size, got size={size} stride={stride}"
        )
    out = df.select(
        F.col(id_col),
        F.length(text_col).alias("_len"),
        F.posexplode(F.expr(
            f"transform(sequence(0, greatest(0, cast(ceil((length({text_col})"
            f" - {size}) / {stride}.0) as int))), "
            f"k -> substring({text_col}, k * {stride} + 1, {size}))"
        )).alias("chunk_id", "chunk"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_id"),
        (F.col("chunk_id") * stride + 1).alias("begin_char"),
        F.least(
            F.col("chunk_id") * stride + size, F.col("_len")
        ).alias("end_char"),
        "chunk",
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard, documents
    are laid end-to-end in id order as one token stream, then cut
    every ``budget`` tokens (whitespace tokens here; swap the counter
    for a BPE count without touching the layout math). A document
    whose token span crosses a cut belongs to every sequence it
    overlaps, with (begin_tok, end_tok) giving the half-open slice of
    the document's own tokens that lands in that sequence.

    Output: (id_col, shard, seq_id, n_tok, begin_tok, end_tok) — one
    row per (document x overlapped sequence), exploded.

    Scale shape: the running offset is a window over
    (shard = id % n_shards) ordered by id — NEVER an unpartitioned
    global window (that would serialize the corpus through one task).
    Sequences are (shard, seq_id) pairs; shards pack independently,
    which is how a 1000-executor packer actually shards its output
    files. One shuffle total (the per-shard sort); the explode is
    narrow.
    """
    ntok = F.size(F.split(F.col(text_col), " "))
    shard = (F.col(id_col) % n_shards).cast("int")
    base = df.select(
        F.col(id_col), shard.alias("shard"), ntok.alias("n_tok")
    )
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = base.select(
        id_col,
        "shard",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("_start"),
    )
    first_c = F.floor(F.col("_start") / budget)
    last_c = F.floor((F.col("_start") + F.col("n_tok") - 1) / budget)
    return (
        offs.select(
            id_col,
            "shard",
            "n_tok",
            "_start",
            F.explode(F.sequence(first_c, last_c)).alias("seq_id"),
        )
        .select(
            F.col(id_col),
            "shard",
            "seq_id",
            "n_tok",
            F.greatest(
                F.col("seq_id") * budget - F.col("_start"), F.lit(0)
            ).alias("begin_tok"),
            (
                F.least(
                    (F.col("seq_id") + 1) * budget,
                    F.col("_start") + F.col("n_tok"),
                )
                - F.col("_start")
            ).alias("end_tok"),
        )
    )


def shard_by_token_budget(
    df: DataFrame,
    id_col: str,
    tokens_col,
    budget: int,
    bucket_size: int = 1024,
) -> DataFrame:
    """Assign every document a training-shard number so each shard
    holds ~``budget`` tokens of consecutive (by ``id_col``) documents:
    shard = floor(exclusive-prefix-sum(tokens) / budget) — the export
    layout step before writing balanced training shards.

    The prefix sum is GLOBAL but computed without a global window
    (which would funnel the corpus through one partition): the classic
    two-phase scan —

      1. deterministic range bucket = id DIV ``bucket_size``;
         per-bucket token totals in one hash aggregate;
      2. bucket totals are bucket-count-bounded (not data-bounded), so
         their running offsets come from one tiny window over the
         bucket table (a few thousand rows at 100 TB — broadcast
         back);
      3. within each bucket, an ordered window adds the local running
         sum to the bucket's offset. Each window partition holds
         ``bucket_size`` rows — bounded state, full parallelism.

    All arithmetic is integer (token counts), so the assignment is
    exact and engine-portable: the oracle is a plain global cumulative
    window in DuckDB.
    """
    if budget <= 0 or bucket_size <= 0:
        raise ValueError("budget and bucket_size must be positive")
    toks = (
        tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
    )
    base = spread(df).select(
        F.col(id_col).alias("_id"),
        toks.cast("long").alias("_t"),
        (F.col(id_col) / F.lit(bucket_size)).cast("long").alias("_bkt"),
    )
    bucket_tot = base.groupBy("_bkt").agg(F.sum("_t").alias("_bt"))
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_tot.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0))
    ).select("_bkt", "_off")
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_local", F.coalesce(F.sum("_t").over(w_local), F.lit(0))
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_t").alias("n_tokens"),
            (
                (F.col("_off") + F.col("_local")) / F.lit(budget)
            ).cast("long").alias("shard"),
        )
    )


def write_token_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str,
    budget: int,
    bucket_size: int = 1024,
) -> dict:
    """Materialize token-budget-balanced training shards: assign
    shards with :func:`shard_by_token_budget` (whitespace token
    count), write hive-partitioned ``shard=N`` parquet (each shard's
    rows land in its own directory — a WebDataset/TFRecord-style
    export layout with parquet as the container), and return the
    manifest: per-shard row/token totals plus an order-insensitive
    content checksum, written alongside as ``_manifest.json`` (the underscore
    prefix keeps it invisible to Spark's file index, like _SUCCESS).

    The manifest aggregate is one hash aggregate over the assigned
    frame; determinism (same data -> same shards, same checksums,
    any partitioning) is what makes re-exports diffable.
    """
    import json
    import os

    from aws_de_final_project_spark.functions.text import token_count

    assigned = shard_by_token_budget(
        df.select(F.col(id_col), token_count(F.col(text_col)).alias("_tok")),
        id_col,
        "_tok",
        budget,
        bucket_size,
    )
    rows = df.join(assigned.select(id_col, "shard"), id_col)
    rows.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    manifest_rows = (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.bit_xor(F.xxhash64(F.col(id_col))).alias("id_checksum"),
        )
        .orderBy("shard")
        .collect()  # shard-count-bounded (corpus_tokens / budget rows)
    )
    manifest = {
        "budget_tokens": budget,
        "n_shards": len(manifest_rows),
        "shards": [
            {
                "shard": r.shard,
                "n_docs": r.n_docs,
                "n_tokens": r.n_tokens,
                "id_checksum": r.id_checksum,
            }
            for r in manifest_rows
        ],
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
