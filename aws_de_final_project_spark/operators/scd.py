"""Slowly-changing-dimension (type 2) builder.

The reference's raw zone accumulates re-sent versions of the same row
whenever Socrata bumps ``updated_on`` (``Additional_Data_Function/
get_data_api.py:10-13``) and never reconciles them; its views always
read the latest state. SCD2 is the standard warehouse answer the
reference skipped: turn a change log into validity intervals so any
point-in-time state is queryable (the batch complement of
``streaming/upsert.py``'s last-writer-wins MERGE).

Scale design: two ranking windows per key partition (lag to collapse
no-op updates, lead to close intervals) — shuffle once on the entity
key, everything else stays within the partition. No global windows,
no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Change log -> SCD2 dimension rows.

    Each input row is an observation ``(key, attrs, ts)``. Output is
    one row per *state run*: consecutive observations (in ``(ts,
    tie)`` order per key) with identical ``attr_cols`` collapse into
    one interval ``[valid_from, valid_to)``; the open interval has
    ``valid_to IS NULL`` and ``is_current = true``.

    ``tie_col`` makes the ordering total when timestamps collide
    (re-delivered batches share timestamps routinely), so the output
    is deterministic across engines and partitionings. Attribute
    comparison is null-safe: NULL -> NULL is *no change*, NULL -> x
    and x -> NULL are changes.
    """
    attrs = list(attr_cols)
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    cur = F.struct(*[F.col(c) for c in attrs])
    changed = (
        df.withColumn("_prev", F.lag(cur).over(w))
        .where(F.col("_prev").isNull() | ~cur.eqNullSafe(F.col("_prev")))
        .select(
            key_col,
            *attrs,
            F.col(ts_col).alias("valid_from"),
            F.col(tie_col).alias("_tie"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "_tie")
    return changed.select(
        key_col,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def scd2_point_in_time(dim: DataFrame, ts) -> DataFrame:
    """State of an SCD2 dimension as of instant ``ts``: the rows whose
    interval covers it (``valid_from <= ts < coalesce(valid_to, inf)``).
    A plain filter — partition pruning applies if the dimension is
    written partitioned on a ``valid_from`` date derivative."""
    t = F.lit(ts)
    return dim.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def cdc_apply(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tie_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Batch CDC fold: apply an ordered change stream of upserts and
    deletes and return the FINAL table state — the newest operation
    per key wins; keys whose newest operation is ``delete_op`` are
    absent from the output. The batch complement of
    ``streaming/upsert.py``'s per-micro-batch MERGE (which handles
    upserts but not tombstones).

    One ranking window per key partition — a single shuffle on the
    key, no state accumulation, no driver involvement. ``tie_col``
    totalizes same-timestamp deliveries so replays are deterministic.
    Returns all non-operation columns of the newest surviving row.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.desc(ts_col), F.desc(tie_col)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        # eqNullSafe: a NULL op (malformed CDC record) is NOT a
        # delete — it falls through as an upsert instead of silently
        # vanishing the key the way `op != delete_op` (NULL) would
        .where(
            (F.col("_rn") == 1)
            & ~F.col(op_col).eqNullSafe(F.lit(delete_op))
        )
        .drop("_rn", op_col)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    cmp_cols: Sequence[str],
) -> DataFrame:
    """Keyed diff of two table states: one row per key that was
    ``added`` (new only), ``removed`` (old only), or ``changed``
    (present in both with any ``cmp_cols`` difference, null-safely);
    unchanged keys are omitted. The audit primitive over snapshot
    generations (``sources/snapshots.py``) or any two point-in-time
    states — one full outer join on the key, no driver state.

    Output: key columns + ``change_type``; comparison columns are
    returned as ``old_<c>`` / ``new_<c>`` pairs so the diff is
    self-describing.
    """
    keys = list(key_cols)
    cmps = list(cmp_cols)
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cmps],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cmps],
    )
    changed = F.lit(False)
    for c in cmps:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(
            F.col(f"new_{c}")
        )
    return (
        o.join(n, keys, "full_outer")
        .select(
            *keys,
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(changed, F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
            *[F.col(f"old_{c}") for c in cmps],
            *[F.col(f"new_{c}") for c in cmps],
        )
        .where(F.col("change_type") != "unchanged")
    )
