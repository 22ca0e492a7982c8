"""MLlib quality classifier pins — the correctness contract for the
rows-only ``quality_scores`` registry entry: separable labels are learned
(AUC ≈ 1), scoring generalizes to held-out docs, refitting on identical
data reproduces identical scores, and the score schema is stable."""

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import mlquality as ML


@pytest.fixture(scope="module")
def labeled_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn(
        "label",
        (F.col("text").contains("spark") | F.col("text").contains("agg")).cast(
            "double"
        ),
    )


def test_learns_separable_signal(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 5 != 0)
    model = ML.train_quality_classifier(train, "text", "label")
    row = ML.quality_report(model, train, "label").collect()[0]
    assert row["auc"] > 0.97
    assert 0 < row["n_pos"] < row["n_train"]  # both classes present


def test_generalizes_to_holdout(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 5 != 0)
    hold = labeled_docs.filter(F.col("doc_id") % 5 == 0)
    model = ML.train_quality_classifier(train, "text", "label")
    scored = ML.score_quality(model, hold, "doc_id").join(
        hold.select("doc_id", "label"), "doc_id"
    )
    agree = scored.filter(
        F.col("predicted") == F.col("label").cast("int")
    ).count()
    assert agree / scored.count() > 0.9


def test_refit_is_deterministic(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 5 != 0)

    def fit_scores():
        m = ML.train_quality_classifier(train, "text", "label")
        return sorted(
            (r["doc_id"], r["quality_score"])
            for r in ML.score_quality(m, labeled_docs, "doc_id").collect()
        )

    assert fit_scores() == fit_scores()


def test_score_schema_and_range(spark, labeled_docs):
    model = ML.train_quality_classifier(labeled_docs, "text", "label")
    out = ML.score_quality(model, labeled_docs, "doc_id")
    assert [f.name for f in out.schema] == ["doc_id", "quality_score", "predicted"]
    rows = out.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["predicted"] in (0, 1) for r in rows)


# ------------- fixed-point exact face (quality_exact registry entry) -------


@pytest.fixture(scope="module")
def exact_labeled(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # Length label (the classic Gopher-style quality heuristic): signal
    # lives in the dominant eigendirection of the token-count covariance,
    # so the near-edge LMS rate (lr_shift=6) with a scaled bias feature
    # genuinely learns it — ~95% accuracy vs a 51% majority baseline.
    return docs.withColumn("label", (F.col("n_chars") >= 300).cast("double"))


def test_exact_training_is_deterministic(spark, exact_labeled):
    """Two independent fits on identical data produce bit-identical
    weights and scores — the property the unrolled-CTE oracle relies on."""
    w1, s1 = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", dim=64, iters=3, lr_shift=6
    )
    w2, s2 = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", dim=64, iters=3, lr_shift=6
    )
    assert w1 == w2
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_exact_training_partitioning_invariant(spark, exact_labeled):
    """Integer fixed-point sums are order-independent: training on a
    differently-partitioned input yields the same weights."""
    w1, _ = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", dim=32, iters=2, lr_shift=6
    )
    w2, _ = ML.fit_linear_quality_exact(
        exact_labeled.repartition(17, "doc_id"), "doc_id", "text", "label",
        dim=32, iters=2, lr_shift=6,
    )
    assert w1 == w2


def test_exact_training_learns_signal(spark, exact_labeled):
    """Ten hard-sigmoid GD steps must beat the majority-class baseline on
    the length label (the fixed-point face is a real learner, not just an
    oracle artifact)."""
    _, scores = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", dim=64, iters=10, lr_shift=6
    )
    rows = scores.collect()
    n = len(rows)
    pos = sum(1 for r in rows if r["label"] == 1)
    acc = sum(1 for r in rows if r["pred"] == r["label"]) / n
    assert acc > max(pos, n - pos) / n
    assert {r["pred"] for r in rows} == {0, 1}


def test_exact_weights_shape_and_bias_slot(spark, exact_labeled):
    w, scores = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", dim=16, iters=1, lr_shift=6
    )
    assert len(w) == 17 and all(isinstance(x, int) for x in w)
    assert scores.columns == ["doc_id", "label", "logit_units", "pred"]


def test_exact_driver_path_matches_distributed(spark, exact_labeled):
    """The driver-local numpy fast path (small exemplar sets) must be
    bit-identical to the distributed shuffle loop — same int64 fixed-point
    chain, same float denominator, order-independent integer sums."""
    kw = dict(dim=32, iters=3, lr_shift=6)
    w_fast, s_fast = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", **kw
    )
    w_dist, s_dist = ML.fit_linear_quality_exact(
        exact_labeled, "doc_id", "text", "label", driver_rows_max=0, **kw
    )
    assert w_fast == w_dist
    assert sorted(map(tuple, s_fast.collect())) == sorted(
        map(tuple, s_dist.collect())
    )
