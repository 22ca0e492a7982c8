"""JSON definitions tables (S9/S10) — `metrics.json` / `slas.json` written as
JSON arrays and read back with an explicit schema (the OpenX
``strip.outer.array`` analog is ``multiLine`` JSON —
ref:cdk_constructs/glue_catalog_construct.py:281-292,368-378)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import METRIC_DEFS_SCHEMA, SLA_DEFS_SCHEMA


def read_metric_defs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("multiLine", True).schema(METRIC_DEFS_SCHEMA).json(path)


def read_sla_defs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("multiLine", True).schema(SLA_DEFS_SCHEMA).json(path)
