"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (statistic engine over the
events table at sf0.001). ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions; see ``aws_dataset_ingestion_metrics_collection_framework_spark/plans/queries.py`` for the
implementations and the numeric-determinism rules that make the DuckDB
oracle hash-match exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full statistic-engine pass —
    windowed multi-stat aggregation + enrichment join over the events table."""
    return QUERIES["metrics_day"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every declared query is oracled:
    exact SQL where expressible, semantic contracts (equality vs exact
    baselines, recall/error gates) for sketch/LSH internals.

    ``compression_signals`` is generated lazily here: its oracle is an
    independent driver-local zlib computation over the gate's parquet
    (DEFLATE is not SQL-expressible), embedded as a VALUES literal."""
    d = dict(ORACLES)
    try:
        from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import (
            _compression_signals_oracle,
        )

        d["compression_signals"] = _compression_signals_oracle()
    except Exception:
        pass  # parquet unavailable: fall back to the rows-only contract
    return d
