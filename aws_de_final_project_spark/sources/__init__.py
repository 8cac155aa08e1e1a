"""Sources & sinks: table registry, CSV/parquet IO, REST ingest."""

from aws_de_final_project_spark.sources.registry import TABLES, load_tables  # noqa: F401
