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


# ------------------- exact fixed-point linear classifier -------------------


def _train_distributed(
    spark, feats, y, id_col, dim, iters, denom, half, one, weights
):
    """The scale path: per iteration one logits aggregation (feats ⨝
    broadcast (dim+1)-row weights), one gradient aggregation — the classic
    distributed full-batch GD pair of shuffles."""
    import math

    for _ in range(iters):
        w_df = F.broadcast(spark.createDataFrame(
            [(j, w) for j, w in enumerate(weights)], "j int, w long"
        ))
        logits = (
            feats.join(w_df, "j")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("_lg"))
        )
        p = F.least(
            F.greatest(
                F.lit(half) + F.floor(F.col("_lg") / F.lit(4.0)).cast("long"),
                F.lit(0),
            ),
            F.lit(one),
        )
        err = logits.join(y, id_col).select(
            id_col, (F.col("_yu") - p).alias("_e")
        )
        grad_rows = (
            feats.join(err, id_col)
            .groupBy("j")
            .agg(F.sum(F.col("x") * F.col("_e")).alias("g"))
            .collect()
        )
        for r in grad_rows:
            weights[r["j"]] += int(math.floor(r["g"] / denom))
    return weights


def _train_driver_local(feats, y, id_col, dim, iters, denom, half, one):
    """Small-exemplar fast path: identical fixed-point chain in numpy.
    int64 ``np.add.at`` accumulation is exact and order-independent, the
    hard-sigmoid is the same clamp, and the update divides the SAME int64
    gradient by the SAME float denominator — bit-identical weights to
    ``_train_distributed`` (pinned by test_mlquality parity test)."""
    import numpy as np

    pdf = feats.join(y, id_col).toPandas()
    j_arr = pdf["j"].to_numpy(dtype=np.int64)
    x_arr = pdf["x"].to_numpy(dtype=np.int64)
    uniq, doc_idx = np.unique(pdf[id_col].to_numpy(), return_inverse=True)
    yu = np.zeros(len(uniq), dtype=np.int64)
    yu[doc_idx] = pdf["_yu"].to_numpy(dtype=np.int64)
    w_arr = np.zeros(dim + 1, dtype=np.int64)
    for _ in range(iters):
        contrib = x_arr * w_arr[j_arr]
        lg = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(lg, doc_idx, contrib)
        p = np.minimum(
            np.maximum(half + np.floor(lg / 4.0).astype(np.int64), 0), one
        )
        e = yu - p
        grad = np.zeros(dim + 1, dtype=np.int64)
        np.add.at(grad, j_arr, x_arr * e[doc_idx])
        w_arr += np.floor(grad / denom).astype(np.int64)
    return [int(v) for v in w_arr]


def fit_linear_quality_exact(
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    dim: int = 64,
    iters: int = 10,
    lr_shift: int = 6,
    scale_bits: int = 20,
    bias_x: int = 16,
    driver_rows_max: int = 8_000_000,
) -> tuple[list[int], DataFrame]:
    """Deterministic linear quality classifier — the engine-owned,
    ORACLE-REPLAYABLE complement to the MLlib LBFGS face above.

    Model: hashed bag-of-words (md5 bucket counts, ``dim`` buckets + a
    bias slot whose feature value is ``bias_x`` — scaled up so the
    intercept learns at a rate comparable to the token weights, whose
    effective step grows with Σx²) through a linear score, trained by
    ``iters`` full-batch gradient steps with a HARD-SIGMOID link — the
    clipped-linear approximation clamp(1/2 + z/4, 0, 1). The substitution is the whole
    trick: exp() is not bit-identical across JVMs and libms, but the
    hard sigmoid is piecewise linear, so with weights, counts, errors
    and gradients all held in 2^-scale_bits integer units EVERY quantity
    in training is an exact BIGINT — sums are order-independent, and the
    learning-rate step is floor(g / (n_docs · 2^lr_shift)): the gradient
    is AVERAGED per example (the step stays bounded as the corpus grows —
    a summed gradient oscillates at any fixed rate once n is large), and
    the division is reproducible because both operands are
    exactly-representable integers (< 2^53), so the IEEE-754 quotient is
    correctly rounded identically in every engine. Training is therefore
    bit-identical across engines, retries and partitionings, and the
    whole loop unrolls into DuckDB CTEs (see QUALITY_EXACT_ORACLE) —
    closing the "iterative training is never oracle-checkable" gap
    LBFGS genuinely has.

    Shape per iteration: one logits aggregation (feats ⨝ broadcast
    65-row weights), one gradient aggregation (feats ⨝ per-doc error,
    both already doc-keyed) — the classic distributed full-batch GD
    pair of shuffles; weights themselves are bounded planning data
    (dim+1 rows) and ride the driver like BPE's merge list.

    Like BPE training (``operators/bpe.py``'s 200k-word threshold), the
    iteration loop has a driver-local fast path: when the labeled slice is
    small (≤ ``driver_rows_max`` bounded feature rows — exemplar sets are
    small by construction), the slim (id, j, x) feature table is collected
    once and the ``iters`` gradient steps run in numpy, replacing
    3 shuffles × iters with one collect. The arithmetic is the SAME
    integer fixed-point chain (int64 ``np.add.at`` accumulation — integer
    sums are order-independent, so the result is bit-identical to the
    distributed loop, pinned by tests), and above the threshold the
    distributed loop runs unchanged.

    Returns (weights, scores_df): weights as the final integer list
    (index dim = bias), scores_df = (id, label, logit_units, pred).
    """
    from .dedup import md5_60bit, tokenize

    half = 1 << (scale_bits - 1)
    one = 1 << scale_bits

    toks = labeled.select(
        F.col(id_col),
        F.explode(tokenize(F.col(text_col))).alias("_w"),
    )
    feats = (
        toks.groupBy(
            id_col, F.pmod(md5_60bit(F.col("_w")), F.lit(dim)).alias("j")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .unionByName(
            labeled.select(
                F.col(id_col), F.lit(dim).alias("j"), F.lit(bias_x).alias("x")
            ).withColumn("j", F.col("j").cast("bigint"))
        )
        .select(id_col, F.col("j").cast("int").alias("j"),
                F.col("x").cast("long").alias("x"))
        # one id-hash shuffle up front: every per-iteration join/groupBy in
        # the distributed loop is doc-keyed, so the checkpointed
        # partitioning is reused each iteration instead of re-exchanged
        .repartition(F.col(id_col))
        .localCheckpoint(eager=False)
    )
    # One slim (id, label-units) table, stored once: the distributed loop
    # joins it every iteration and the final scores projection reads the
    # label back out of it — without the pin each of those consumers
    # re-scans the corpus parquet per use (iters + 1 scans at scale).
    # Same id-hash partitioning as feats so the per-iteration joins reuse
    # the exchange.
    y = (
        labeled.select(
            F.col(id_col), (F.col(label_col).cast("long") * one).alias("_yu")
        )
        .repartition(F.col(id_col))
        .localCheckpoint(eager=False)
    )

    spark = labeled.sparkSession
    n_docs = labeled.count()
    denom = float(n_docs << lr_shift)
    weights = [0] * (dim + 1)
    if 0 < n_docs * (dim + 1) <= driver_rows_max:
        weights = _train_driver_local(
            feats, y, id_col, dim, iters, denom, half, one
        )
    else:
        weights = _train_distributed(
            spark, feats, y, id_col, dim, iters, denom, half, one, weights
        )

    w_df = F.broadcast(spark.createDataFrame(
        [(j, w) for j, w in enumerate(weights)], "j int, w long"
    ))
    # Read the label back from the stored y table ((_yu != 0) ⇔ label=1 —
    # _yu is exactly label·2^scale_bits) instead of re-scanning the corpus:
    # the whole projection now runs over the two pinned slim tables.
    scores = (
        feats.join(w_df, "j")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("logit_units"))
        .join(y, id_col)
        .select(
            id_col,
            (F.col("_yu") != 0).cast("int").alias("label"),
            "logit_units",
            (F.col("logit_units") > 0).cast("int").alias("pred"),
        )
    )
    return weights, scores
