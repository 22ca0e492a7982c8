"""JSONL document-corpus source/sink — the interchange format of public
LLM pretraining corpora (C4, The Pile, RedPajama, Dolma all ship as
newline-delimited JSON with a text field plus metadata).

Reading goes through ``spark.read.text`` + ``from_json`` against an
EXPLICIT schema rather than ``spark.read.json``: schema inference is a
full extra pass over 100 TB, and silent schema drift between corpus
shards is exactly the failure this source must surface, not absorb.
Malformed lines route to a corrupt output (reusing the engine's
Firehose-analog split, ``parquet_lake.split_corrupt_json``) instead of
poisoning the batch or vanishing. Writing emits one JSON object per line
via ``to_json`` — round-trips through the reader by construction.

Scale shape: both directions are map-only (parse/serialize per line, no
shuffle); file parallelism comes from the text source's split handling,
and the parsed output feeds straight into the curation operators
(`c4_clean` → `gopher_rules` → dedup → …) without materializing an
intermediate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parquet_lake import split_corrupt_json

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = DOCUMENT_SCHEMA,
    text_field: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into (documents, corrupt_lines).

    ``documents`` carries ``schema``'s columns; rows whose ``text_field``
    is null (present-but-null or absent key) count as corrupt too — a
    pretraining pipeline must not silently ingest empty documents as
    zero-token rows.
    """
    raw = spark.read.text(path)
    good, bad = split_corrupt_json(spark, raw, "value", schema)
    missing_text = good.filter(F.col(text_field).isNull())
    return (
        good.filter(F.col(text_field).isNotNull()),
        bad.unionByName(missing_text.select(F.to_json(F.struct("*")).alias("raw"))),
    )


def write_jsonl_corpus(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """Write one JSON object per line (reader round-trip by construction)."""
    df.select(F.to_json(F.struct("*")).alias("value")).write.mode(mode).text(path)
