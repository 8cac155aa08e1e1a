"""Snapshot (time-travel) table layout: generation directories plus
an atomically-replaced pointer file.

The staged-swap writers (operators/rollup_maint.py, the streaming
registry sink) keep exactly ONE reader-consistent version. This layer
keeps history: every write lands in a fresh ``gen-N`` directory, then
a one-line ``_current`` pointer file is atomically replaced
(``os.replace`` — POSIX rename; an object store wants the same
structure with a manifest commit). That buys, with plain parquet:

* readers never see a partial write (the pointer flips only after the
  gen directory is fully written);
* time travel — read any retained generation by number;
* instant rollback — a pointer move, no data rewrite;
* vacuum — drop old generations, never the current one.

This is the snapshot skeleton of Delta/Iceberg without the formats:
enough for state tables (dedup registries, rollups, reference
histograms) whose history must be auditable and revertible.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_GEN_RE = re.compile(r"^gen-(\d+)$")


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_current")


def list_generations(table_dir: str) -> list[int]:
    """Existing generation numbers, ascending (empty if none)."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _GEN_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_generation(table_dir: str) -> int | None:
    p = _pointer_path(table_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next generation and flip the pointer.
    Returns the new generation number. Crash before the pointer flip
    leaves an orphan gen dir (cleaned by vacuum) and readers on the
    previous version — never a torn table."""
    os.makedirs(table_dir, exist_ok=True)
    gens = list_generations(table_dir)
    gen = (gens[-1] + 1) if gens else 0
    gen_dir = os.path.join(table_dir, f"gen-{gen}")
    df.write.mode("errorifexists").parquet(gen_dir)
    tmp = _pointer_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(gen))
    os.replace(tmp, _pointer_path(table_dir))
    return gen


def read_snapshot(
    spark: SparkSession, table_dir: str, generation: int | None = None
) -> DataFrame:
    """Read the current (default) or a specific retained generation."""
    gen = current_generation(table_dir) if generation is None else generation
    if gen is None:
        raise FileNotFoundError(f"no current snapshot in {table_dir}")
    gen_dir = os.path.join(table_dir, f"gen-{gen}")
    if not os.path.isdir(gen_dir):
        raise FileNotFoundError(
            f"generation {gen} not found in {table_dir} "
            f"(have {list_generations(table_dir)})"
        )
    return spark.read.parquet(gen_dir)


def rollback(table_dir: str, generation: int) -> None:
    """Point the table back at a retained generation — a pointer
    move, no data rewrite. The abandoned newer generations stay on
    disk (auditable) until vacuumed; a subsequent write_snapshot
    allocates PAST them, so history never collides."""
    if generation not in list_generations(table_dir):
        raise FileNotFoundError(
            f"generation {generation} not found in {table_dir}"
        )
    tmp = _pointer_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(generation))
    os.replace(tmp, _pointer_path(table_dir))


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` generations; the current
    generation is always retained regardless of age. Returns the
    dropped generation numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    gens = list_generations(table_dir)
    cur = current_generation(table_dir)
    keep = set(gens[-keep_last:])
    if cur is not None:
        keep.add(cur)
    dropped = []
    for g in gens:
        if g not in keep:
            shutil.rmtree(os.path.join(table_dir, f"gen-{g}"))
            dropped.append(g)
    return dropped
