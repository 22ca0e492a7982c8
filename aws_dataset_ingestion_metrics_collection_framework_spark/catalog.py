"""Engine catalog: fixed table schemas + test-table registration.

The reference's schema system is *fixed and external* — Glue Catalog CfnTable
definitions are the single source of truth with no inference anywhere
(ref:cdk_constructs/glue_catalog_construct.py:41-382). We mirror that with
explicit ``StructType`` schemas for every engine table (SURVEY §1.3) and
register the driver's parquet test tables as temp views for SQL access
(replacing Glue-catalog scans, ref:glue/business_metrics.py:16-19,39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# ref:cdk_constructs/glue_catalog_construct.py:41-122 (metrics_{minute,hour,day})
# Partition keys (region/year/month/day/hour) are modeled as ordinary columns;
# the writer partitions by them (sources/parquet_lake.py).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("collectiontime", T.StringType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("period", T.IntegerType()),
        T.StructField("frequency", T.StringType()),
        T.StructField("statistic", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("dimensions", T.StringType()),
        T.StructField("accountid", T.StringType()),
        T.StructField("metrictimestamp", T.StringType()),
        T.StructField("metricvalue", T.FloatType()),
        T.StructField("id", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("year", T.ShortType()),
        T.StructField("month", T.ShortType()),
        T.StructField("day", T.ShortType()),
        T.StructField("hour", T.ShortType()),
    ]
)

# ref:cdk_constructs/glue_catalog_construct.py:124-211 (slas)
SLAS_SCHEMA = T.StructType(
    [
        T.StructField("collectiontime", T.StringType()),
        T.StructField("alarmarn", T.StringType()),
        T.StructField("alarmname", T.StringType()),
        T.StructField("metricnamespace", T.StringType()),
        T.StructField("metricname", T.StringType()),
        T.StructField("metricperiod", T.IntegerType()),
        T.StructField("metricfrequency", T.StringType()),
        T.StructField("metricstatistic", T.StringType()),
        T.StructField("threshold", T.FloatType()),
        T.StructField("comparisonOperator", T.StringType()),
        T.StructField("treatmissingdata", T.StringType()),
        T.StructField("statevalue", T.StringType()),
        T.StructField("statereason", T.StringType()),
        T.StructField("accountid", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("year", T.ShortType()),
        T.StructField("month", T.ShortType()),
        T.StructField("day", T.ShortType()),
        T.StructField("hour", T.ShortType()),
    ]
)

# ref:cdk_constructs/glue_catalog_construct.py:213-295 (metric_defs)
METRIC_DEFS_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("frequency", T.StringType()),
        T.StructField("period", T.IntegerType()),
        T.StructField("statistic", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("dimensions", T.StringType()),
        T.StructField("metric_set", T.StringType()),
        T.StructField("sla_set", T.StringType()),
        T.StructField("dashboard", T.StringType()),
        T.StructField("account", T.StringType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("reference_datasets", T.StringType()),
        T.StructField("query", T.StringType()),
    ]
)

# ref:cdk_constructs/glue_catalog_construct.py:297-382 (sla_defs)
SLA_DEFS_SCHEMA = T.StructType(
    [
        T.StructField("ticket", T.StringType()),
        T.StructField("threshold", T.IntegerType()),
        T.StructField("comparison_operator", T.StringType()),
        T.StructField("datapoints_to_alarm", T.IntegerType()),
        T.StructField("evaluation_periods", T.IntegerType()),
        T.StructField("treat_missing_data", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("short_description", T.StringType()),
        T.StructField("details", T.StringType()),
        T.StructField("metric_namespace", T.StringType()),
        T.StructField("metric_name", T.StringType()),
        T.StructField("metric_set", T.StringType()),
        T.StructField("metric_metadata", T.StringType()),
        T.StructField("metric_dimensions", T.StringType()),
        T.StructField("account", T.StringType()),
    ]
)

# Engine-native input table (FIXTURES.md §1): the replacement for CloudWatch's
# ingested datapoints — what the statistic engine aggregates (SURVEY §2.4 A1).
RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("dimensions", T.StringType()),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# Engine-native output of the business-metric runner
# (replaces CloudWatch put_metric_data, ref:glue/business_metrics.py:46-57).
METRIC_DATAPOINTS_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("dimensions", T.StringType()),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType()),
    ]
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# Tables whose parquet files carry TIMESTAMP(NANOS) columns, which Spark's
# vectorized reader rejects by default. We read them as LONG nanos
# (spark.sql.legacy.parquet.nanosAsLong) and floor-convert to microsecond
# timestamps — the same nanos→micros truncation DuckDB applies, so oracle
# comparisons agree.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst handles column pruning + predicate
    pushdown so callers just declare filters/projections."""
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        # runtime SQLConf — safe to set on any session, incl. the driver's
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # integer division — double division would lose precision above
            # 2^53 ns (~mid-1970!) and drift timestamps by ±1µs
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# (application_id, tables) → (sf_dir, DataFrames). Registration costs ~1 s of
# driver-side parquet footer reads for the 10 test tables; queries call
# register_tables freely, so memoize. Keyed WITHOUT sf_dir: views are global
# per session, so switching directories must re-register (not hit a stale
# entry for a directory whose views were since overwritten).
_REGISTERED: dict[tuple[str, tuple[str, ...]], tuple[str, dict[str, DataFrame]]] = {}


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    *,
    force: bool = False,
) -> dict[str, DataFrame]:
    """Register the driver's test tables as temp views (SQL-reachable).

    Equivalent of the reference registering Glue tables for ``spark.sql``
    over BusinessMetric reference_datasets (ref:glue/business_metrics.py:34-39).
    Memoized per (session, sf_dir); ``force=True`` re-reads (e.g. after
    overwriting the parquet files).
    """
    key = (spark.sparkContext.applicationId, tuple(tables))
    cached = _REGISTERED.get(key)
    if not force and cached is not None and cached[0] == sf_dir.rstrip("/"):
        return cached[1]
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    _REGISTERED[key] = (sf_dir.rstrip("/"), out)
    return out
