"""PySpark-native analytics engine with the query & data-processing
capabilities of awslabs/aws-dataset-ingestion-metrics-collection-framework.

The reference (at /root/reference, cited throughout as ``ref:<file>:<line>``)
is an AWS CDK app that composes managed services (CloudWatch GetMetricData,
Kinesis/Firehose, Glue Spark, CloudWatch Alarms). This package re-provides
those *capabilities* natively in PySpark:

- ``dsl``        — the declarative definition DSL (Dataset / Metric /
                   BusinessMetric / SLA / sets / loader), API-compatible with
                   the reference's ``dataquality`` + ``definitions`` packages.
- ``functions``  — reusable Column builders: derived keys, statistic→aggregate
                   resolution, comparison-operator→predicate resolution,
                   time helpers.
- ``operators``  — the engine: windowed statistic computation, enrichment
                   joins, SLA evaluation (gap-fill, m-of-n, state machine),
                   business-metric runner, dedup / similarity / text-analysis
                   operators for large-scale training-data pipelines.
- ``sources``    — readers/writers: partitioned Parquet lake, JSON defs.
- ``streaming``  — Structured Streaming variants of the ingest pipeline and
                   a stateful alarm evaluator.

Everything is DataFrame-first: logical plans are declared via the DataFrame /
SQL API and Catalyst chooses the physical strategy. Python UDFs are avoided in
hot paths; the few unavoidable ones are Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import register_tables, TESTDATA_TABLES  # noqa: F401
