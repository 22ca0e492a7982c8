"""Columnar/delimited format sources: CSV with corrupt-record routing,
ORC round-trip — rounding out the lake's interchange surface (parquet is
native everywhere else; JSONL lives in `text_corpus.py`, WARC in
`warc.py`).

Same design rules as every source here:

- EXPLICIT schema, never inference — at 100 TB an inference pass is a
  second full scan, and drifting inferred types silently corrupt
  downstream arithmetic;
- corrupt rows are ROUTED, not absorbed or fatal: `read_csv_table`
  returns (good, corrupt) like the JSONL/WARC readers, with the raw line
  preserved for quarantine/replay;
- predicate pushdown caveat stated honestly: CSV supports none (a row
  format — every filter reads every byte), ORC pushes filters and prunes
  columns like parquet. CSV is an INGESTION EDGE format — land it, convert
  to parquet/ORC (`convert_to_parquet`), and never scan it twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt_record"


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV into (good, corrupt): rows that fail to parse against the
    explicit schema land in `corrupt` as their raw line.

    Parsing runs as a `from_csv` EXPRESSION over a plain text scan — the
    same pattern as the JSONL reader — because Spark's CSV file source
    disallows corrupt-only queries without caching the whole scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    expression form splits lazily with no materialization. With
    ``header=True``, lines equal to the schema-derived header string are
    dropped (a DATA row spelled exactly like the header is
    indistinguishable in CSV and is dropped too — inherent to the
    format, not this reader)."""
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    parse_schema = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path)
    if header:
        header_line = delimiter.join(f.name for f in schema.fields)
        raw = raw.filter(F.col("value") != header_line)
    parsed = raw.select(
        F.col("value"),
        F.from_csv(
            F.col("value"),
            parse_schema.simpleString(),
            {
                "sep": delimiter,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
            },
        ).alias("_p"),
    )
    good = parsed.filter(F.col(f"_p.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(F.col(f"_p.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw")
    )
    return good, bad


def write_csv_table(
    df: DataFrame, path: str, *, mode: str = "error", header: bool = True
) -> None:
    """Write CSV (reader round-trip by construction for scalar columns)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_orc_table(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """ORC write — the other pushdown-capable columnar format; use where
    the surrounding stack (Hive-era warehouses) reads ORC natively."""
    df.write.mode(mode).orc(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — filter pushdown + column pruning, like parquet."""
    return spark.read.orc(path)


def convert_to_parquet(
    spark: SparkSession,
    src_csv: str,
    dest: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "error",
) -> DataFrame:
    """The land-then-convert step: CSV edge data rewritten as parquet so
    every later scan gets pushdown/pruning; returns the corrupt rows.

    Corrupt rows are written NESTED under ``<dest>/_corrupt`` — the
    underscore prefix makes the directory invisible to Spark's parquet
    scans of ``dest`` (FileInputFormat hides ``_``/``.`` paths), so the
    quarantine rides with the table without polluting reads. Written
    unconditionally (possibly empty) so the conversion is a single CSV
    pass — probing for bad rows first would rescan the source."""
    good, bad = read_csv_table(
        spark, src_csv, schema, header=header, delimiter=delimiter
    )
    good.write.mode(mode).parquet(dest)
    bad.write.mode("overwrite").text(dest.rstrip("/") + "/_corrupt")
    return bad
