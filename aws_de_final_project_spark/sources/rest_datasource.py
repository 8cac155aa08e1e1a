"""Spark 4 Python Data Source for REST/SoQL CSV endpoints.

``sources/rest_source.py`` reproduces the reference Lambda exactly
(driver-side fetch, land to files). This module is the Spark-FIRST
form of the same capability (SURVEY.md §2 S1's "custom
``pyspark.sql.datasource``" option): a registered source where

* the high-water-mark predicate is passed server-side (``$where=
  updated_on > "<hwm>"`` — operator P9: the filter never reaches the
  cluster, mirroring ``get_data_api.py:13``);
* reads are PARTITIONED and UNBOUNDED: task ``i`` pulls pages ``i,
  i+P, i+2P, ...`` (strided SoQL paging) until a short or empty page,
  so a backfill parallelizes across executors AND an endpoint larger
  than ``num_partitions * page_size`` is drained completely instead
  of silently truncated (ADVICE r1);
* rows are typed against the declared schema on the way in (the
  "crawler" step collapses into the source).

Offline testability: ``file://`` URLs serve the same contract — the
"server" is a local CSV and the where/offset/limit are evaluated
locally; an ``http(s)://`` URL takes the ``requests`` path unchanged.

Usage:
    spark.dataSource.register(RestCsvDataSource)
    df = (spark.read.format("rest_csv")
          .schema("id BIGINT, updated_on STRING, v DOUBLE")
          .option("url", "https://host/resource/ijzp-q8t2.csv")
          .option("where", 'updated_on > "2024-01-01"')
          .option("num_partitions", "8")
          .option("page_size", "50000")
          .load())
"""

from __future__ import annotations

import csv
import io

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructType,
)


class _Stride(InputPartition):
    """Task-owned page sequence: pages ``first, first+stride,
    first+2*stride, ...`` of ``page_size`` rows each."""

    def __init__(self, first_page: int, stride: int, page_size: int):
        self.first_page = first_page
        self.stride = stride
        self.page_size = page_size


def _fetch_page(url: str, where: str | None, offset: int, limit: int) -> str:
    """One page of CSV text. ``file://`` simulates the server locally
    (filter+slice); anything else is a real HTTP GET with SoQL params.
    """
    if url.startswith("file://"):
        path = url[len("file://") :]
        with open(path, newline="") as f:
            rows = list(csv.DictReader(f))
        if where:
            # the only predicate shape the reference pushes:
            #   <col> > "<literal>"        (get_data_api.py:13)
            col, lit = where.split(">", 1)
            col = col.strip()
            lit = lit.strip().strip('"')
            rows = [r for r in rows if (r.get(col) or "") > lit]
        rows = rows[offset : offset + limit]
        if not rows:
            return ""
        buf = io.StringIO()
        w = csv.DictWriter(buf, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
        return buf.getvalue()
    import requests  # pragma: no cover — no network in CI container

    params = {"$offset": offset, "$limit": limit}
    if where:
        params["$where"] = where
    resp = requests.get(url, params=params, timeout=180)
    # a 4xx/5xx body must not parse as an empty CSV page — a failed
    # fetch and end-of-data would otherwise be indistinguishable
    resp.raise_for_status()
    return resp.text


def _coerce(value: str | None, dtype):
    if value is None or value == "":
        return None
    if isinstance(dtype, (LongType, IntegerType)):
        return int(value)
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(value)
    if isinstance(dtype, BooleanType):
        return value.strip().lower() in ("true", "1", "t", "yes")
    return value


class _RestCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options["url"]
        self.where = options.get("where")
        self.num_partitions = int(options.get("num_partitions", "1"))
        self.page_size = int(options.get("page_size", "100000"))

    def partitions(self):
        return [
            _Stride(i, self.num_partitions, self.page_size)
            for i in range(self.num_partitions)
        ]

    def read(self, partition: _Stride):
        """Drain this task's page stride until the endpoint is
        exhausted (empty or short page) — an unknown-size endpoint is
        never silently truncated; ``num_partitions`` tunes
        parallelism, not coverage."""
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        page = partition.first_page
        while True:
            body = _fetch_page(
                self.url,
                self.where,
                page * partition.page_size,
                partition.page_size,
            )
            if not body.strip():
                return
            n_rows = 0
            for row in csv.DictReader(io.StringIO(body)):
                n_rows += 1
                yield tuple(_coerce(row.get(name), dt) for name, dt in fields)
            if n_rows < partition.page_size:
                return
            page += partition.stride


class RestCsvDataSource(DataSource):
    """``spark.read.format("rest_csv")`` — partitioned, predicate-
    pushing REST CSV source."""

    @classmethod
    def name(cls) -> str:
        return "rest_csv"

    def schema(self):
        raise NotImplementedError(
            "rest_csv requires an explicit .schema(...) — remote "
            "inference would cost an extra full fetch"
        )

    def reader(self, schema: StructType) -> _RestCsvReader:
        return _RestCsvReader(schema, self.options)
