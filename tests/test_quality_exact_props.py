"""Property tests for the fixed-point exact quality classifier
(``mlquality.fit_linear_quality_exact`` ↔ ``plans.queries._quality_exact_oracle``).

The registered query pins ONE corpus (the driver's sf0.01 differential);
these properties pin the CONTRACT on generated corpora: for arbitrary
small document sets — unicode tokens, odd whitespace, empty docs, dup
texts, labels on both sides of the length threshold — the Spark training
run and the unrolled DuckDB CTE replay produce identical rows, and the
driver-local numpy path stays bit-identical to the distributed loop.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from aws_dataset_ingestion_metrics_collection_framework_spark.operators import mlquality as ML
from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import _quality_exact_oracle

from pyspark.sql import functions as F

_PARAMS = dict(dim=16, iters=3, lr_shift=6, scale_bits=20, bias_x=16)

_words = st.sampled_from([
    "alpha", "beta", "gamma", "délta", "ε", "词", "x", "yy", "zzz",
    "spark", "agg", "join", "window",
])
# up to ~60 tokens ≈ 0-420 chars: texts land on BOTH sides of the
# n_chars >= 300 label threshold the oracle hardcodes
_doc = st.lists(_words, min_size=0, max_size=60).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=20))
def test_training_replays_in_duckdb(spark, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "label", (F.col("n_chars") >= 300).cast("double")
    )
    _, scores = ML.fit_linear_quality_exact(
        df, "doc_id", "text", "label", **_PARAMS
    )
    got = sorted(tuple(r) for r in scores.collect())

    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(map(tuple, con.execute(
        _quality_exact_oracle(**_PARAMS)
    ).fetchall()))
    con.close()
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=15))
def test_driver_and_distributed_paths_agree(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).withColumn("label", (F.length("text") >= 150).cast("double"))
    w_fast, _ = ML.fit_linear_quality_exact(
        df, "doc_id", "text", "label", **_PARAMS
    )
    w_dist, _ = ML.fit_linear_quality_exact(
        df, "doc_id", "text", "label", driver_rows_max=0, **_PARAMS
    )
    assert w_fast == w_dist
