"""Scalar-function layer: dialect shims, text features, vector math."""

from aws_de_final_project_spark.functions.dialect import (  # noqa: F401
    iso_day_of_week,
    presto_date_format,
    presto_date_parse,
    translate_presto_datetime_pattern,
)
