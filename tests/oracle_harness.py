"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For a query name: run the Spark callable, run the oracle SQL in
DuckDB (tables pre-registered as views over the same parquet), then
compare row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from aws_de_final_project_spark.sources.registry import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, int):
        return int(v)
    return v


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def canon_duck_type(t: str) -> str:
    """Canonical tag for a DuckDB type string, comparable with
    :func:`canon_spark_type`. HUGEINT intentionally maps to 'i128'
    (no Spark equivalent) so an uncast integer SUM in an oracle fails
    loudly here instead of only in the driver's type-sensitive hash
    (VERDICT r5 item 1)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"list<{canon_duck_type(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        # tz flavor stays distinct so LTZ-vs-NTZ drift fails the gate
        # (LTZ output localizes through the PROCESS tz at collect() —
        # the driver-tz bomb pinned plan-side by
        # test_no_ltz_output_columns_anywhere): DuckDB's
        # TIMESTAMP WITH TIME ZONE pairs with Spark 'timestamp' (LTZ),
        # naive TIMESTAMP/TIMESTAMP_NS with Spark 'timestamp_ntz'
        return "ts_ltz" if "WITH TIME ZONE" in t or t == "TIMESTAMPTZ" else "ts_ntz"
    if t.startswith("STRUCT"):
        return "struct"
    m = {
        # int widths <=64 bits collapse to one tag: they serialize
        # identically at the value level, so the driver hash is
        # width-insensitive (proven by green driver rows with Spark
        # INT vs oracle BIGINT). int128 stays distinct — pandas/Arrow
        # convert HUGEINT to float64/object, which IS hash-visible.
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "INT": "int",
        "BIGINT": "int", "HUGEINT": "i128", "UTINYINT": "int",
        "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
        "UHUGEINT": "i128", "FLOAT": "f32", "REAL": "f32", "DOUBLE": "f64",
        "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "bin",
    }
    return m.get(t, t.lower())


def canon_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{canon_spark_type(t[6:-1])}>"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        # see canon_duck_type: the tz dimension is part of the contract
        return "ts_ntz" if t.startswith("timestamp_ntz") else "ts_ltz"
    if t.startswith("struct"):
        return "struct"
    m = {
        "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
        "bigint": "int", "long": "int", "float": "f32", "double": "f64",
        "string": "str", "boolean": "bool", "date": "date", "binary": "bin",
    }
    return m.get(t, t)


def assert_types_match(name: str, spark_dtypes, d_cols, d_types):
    """Strict column-type pin: the driver hashes results type-tagged,
    so equal values in different physical types (BIGINT vs HUGEINT)
    still mismatch there. Enforce canonical type equality per column
    name so the local gate can never be green while the driver is red
    for a type-level reason."""
    s_map = {c: canon_spark_type(t) for c, t in spark_dtypes}
    d_map = {c: canon_duck_type(str(t)) for c, t in zip(d_cols, d_types)}
    diffs = {
        c: (s_map.get(c), d_map.get(c))
        for c in set(s_map) | set(d_map)
        if s_map.get(c) != d_map.get(c)
    }
    assert not diffs, f"{name}: column type mismatch (spark, duckdb): {diffs}"


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = list(rel.types)
    d_rows = [tuple(r) for r in rel.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert_types_match(name, spark_df.dtypes, d_cols, d_types)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize(s_cols, s_rows)
    dn = normalize(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
        f" (cols sorted: {sorted(s_cols)})"
    )
