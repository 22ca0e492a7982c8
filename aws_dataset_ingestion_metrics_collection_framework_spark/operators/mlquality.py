"""Model-based quality scoring on Spark MLlib: the fasttext/DSIR-style
"train a linear classifier on labeled exemplars, score the whole corpus"
stage (GPT-3's Wikipedia-vs-CommonCrawl quality filter, Brown et al. '20
§A; the classifier complement to the heuristic ``curation.gopher_rules``).

Pipeline: RegexTokenizer → HashingTF (hashing trick — no vocabulary build,
so the feature step is one stateless map over any corpus size) → IDF →
LogisticRegression.  Training runs on the labeled slice (always the small
side: curated exemplars); scoring broadcasts the fitted coefficient vector
and is a pure map over the full corpus — the same shape as every other
map-only curation pass here.

This is the engine's one genuinely iterative operator (LBFGS), so it is
NOT SQL-expressible; correctness is pinned by pytest (separable labels →
AUC ≈ 1, fixed-seed determinism, train/apply schema contracts) and the
registry entry runs as a rows-only check — the same declared contract as
``image_phash_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _build_pipeline(text_col: str, label_col: str, num_features: int, max_iter: int,
                    reg_param: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="_tokens", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="_tokens", outputCol="_tf", numFeatures=num_features, binary=False
    )
    idf = IDF(inputCol="_tf", outputCol="_features")
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return Pipeline(stages=[tokenizer, tf, idf, lr])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    *,
    num_features: int = 1 << 16,
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit the tokenize→hash→idf→LR pipeline on a labeled exemplar slice
    (label 1 = high quality / in-domain). Returns the fitted PipelineModel.

    The labeled side is the small one by construction; at 100 TB the fit
    cost is bounded by exemplar count, not corpus size. LBFGS on a fixed
    dataset/partitioning is deterministic (deterministic init, no
    sampling), pinned by tests."""
    return _build_pipeline(
        text_col, label_col, num_features, max_iter, reg_param
    ).fit(labeled)


def score_quality(model, corpus: DataFrame, id_col: str) -> DataFrame:
    """Score a corpus with a fitted model: (id, quality_score ∈ [0,1],
    predicted ∈ {0,1}). Map-only — the model rides to executors as a
    broadcast task binary; no shuffle, no iteration."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(corpus)
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array(F.col("probability"))[1], 6).alias("quality_score"),
        F.col("prediction").cast("int").alias("predicted"),
    )


def quality_report(model, labeled: DataFrame, label_col: str) -> DataFrame:
    """One-row training report: held-in AUC + positive rate (the number a
    curation run logs before trusting the scores)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    auc = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol="rawPrediction"
    ).evaluate(model.transform(labeled))
    spark = labeled.sparkSession
    pos = labeled.filter(F.col(label_col) == 1).count()
    n = labeled.count()
    return spark.createDataFrame(
        [(float(round(auc, 4)), n, pos)], "auc double, n_train long, n_pos long"
    )
