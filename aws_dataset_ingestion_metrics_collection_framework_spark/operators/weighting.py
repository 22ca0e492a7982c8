"""Data-selection importance weighting (the hashed n-gram DSIR recipe).

Selecting pretraining data that *looks like* a target domain is a standard
large-corpus curation step: DSIR ("Data Selection for Language Models via
Importance Resampling", Xie et al., NeurIPS 2023, arXiv:2302.03169) scores
every raw document by the log-likelihood ratio of a target-domain n-gram
model over a raw-corpus n-gram model, with both models estimated on hashed
n-gram buckets so the feature space is fixed-size regardless of vocabulary.

Spark-first shape (reference framework has no counterpart; this extends the
engine's curation surface, SURVEY.md §2 extensions):

- one explode pass builds (doc, bucket) hashed-gram rows — map-side only;
- bucket counts for raw and target are two tiny aggregations (``buckets``
  rows each, default 256) — the per-bucket log-ratio table is then a
  BROADCAST join back onto the gram rows: the corpus-sized side never
  shuffles on anything but the per-doc score aggregation;
- per-doc score = Σ log-ratio over the doc's gram instances, one
  map-side-combinable SUM.

At 100 TB: gram rows are (long, int) pairs, the ratio table is constant-
size, and the only wide shuffle is the final per-doc partial-aggregate —
volume O(docs), independent of document length.

Hashing uses the md5-derived 60-bit value (``dedup.md5_60bit``) so DuckDB
reproduces every bucket assignment and the whole operator is
oracle-checkable end to end; swap ``hash_fn='xx'`` (xxhash64) when
cross-engine reproducibility isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import bind_once, materialize_once, md5_60bit, tokenize


def _gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_max: int,
    buckets: int,
    hash_fn: str,
) -> DataFrame:
    """(doc, bucket) — one row per word n-gram instance (n = 1..n_max),
    bucket = hash(gram) mod buckets. Map-side only (explode, no shuffle)."""
    # The token array is bound ONCE per row (bind_once): Catalyst re-evaluates
    # expressions referenced inside HOF lambda bodies per element, so naming
    # `tokenize(...)` directly in the per-gram lambda would re-run the
    # tokenization regex once per gram — measured 6× slower on this operator.
    # Guard per n: Spark's sequence(1, stop) DESCENDS when stop < 1 (it never
    # returns empty), so docs shorter than n must take the empty-array branch.
    # The per-n closure must also be a real function scope: a `lambda i, n=n:`
    # two-parameter lambda would be interpreted by F.transform as its
    # (element, index) form, silently binding the array INDEX to n.
    def _ngrams(toks: Column, n: int) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = bind_once(
        tokenize(F.col(text_col)),
        lambda toks: F.flatten(
            F.array(*[_ngrams(toks, n) for n in range(1, n_max + 1)])
        ),
    )
    gram_hash: Column = (
        md5_60bit(F.col("g")) if hash_fn == "md5" else F.abs(F.xxhash64(F.col("g")))
    )
    return df.select(F.col(id_col).alias("doc"), F.explode(grams).alias("g")).select(
        "doc", F.pmod(gram_hash, F.lit(buckets)).cast("int").alias("bucket")
    )


def importance_weights(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target_predicate: Column,
    *,
    n_max: int = 2,
    buckets: int = 256,
    alpha: float = 1.0,
    hash_fn: str = "md5",
    round_to: int | None = 6,
) -> DataFrame:
    """Score every document of ``raw`` by the DSIR importance log-ratio
    toward the slice selected by ``target_predicate``.

    Returns (id_col, n_grams, weight): weight = Σ_grams ln p̂_target(bucket)
    − ln p̂_raw(bucket) with add-``alpha`` smoothing over ``buckets`` hashed
    unigram..``n_max``-gram features. Higher = more target-like; resample
    raw data proportionally to exp(weight) (or keep the top quantile) to
    build a domain-matched pretraining mix.

    ``round_to`` rounds the final sum (IEEE addition is non-associative
    across partitionings; 6 decimals is far coarser than the ~1e-13
    accumulation error, so results are engine- and partitioning-stable).
    Documents with zero grams (empty text) get weight 0.
    """
    # Derive gram rows ONCE (materialize_once: they feed the raw counts, the
    # target counts, and the final scoring join — three consumers that would
    # otherwise each re-run the explode+hash corpus pass); target counts
    # come from the stored rows via a slim id join instead of a second
    # tokenization of the target slice.
    feats = materialize_once(
        _gram_buckets(
            raw, id_col, text_col, n_max=n_max, buckets=buckets, hash_fn=hash_fn
        )
    )
    tgt_ids = raw.filter(target_predicate).select(F.col(id_col).alias("doc"))
    raw_counts = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt_counts = (
        feats.join(tgt_ids, "doc").groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    )
    spark = raw.sparkSession
    # Full bucket domain so never-seen buckets still get smoothed mass; the
    # totals ride a single-partition window over this `buckets`-row table —
    # constant-size driver-free scalars.
    grid = spark.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    w_all = Window.partitionBy()
    ratios = (
        grid.join(raw_counts, "bucket", "left")
        .join(tgt_counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
        .withColumn(
            "log_ratio",
            F.log(
                (F.col("ct") + F.lit(alpha))
                / (F.sum("ct").over(w_all) + F.lit(alpha * buckets))
            )
            - F.log(
                (F.col("cr") + F.lit(alpha))
                / (F.sum("cr").over(w_all) + F.lit(alpha * buckets))
            ),
        )
        .select("bucket", "log_ratio")
    )
    scored = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_ratio").alias("_w"),
        )
    )
    weight = F.col("_w") if round_to is None else F.round(F.col("_w"), round_to)
    return (
        raw.select(F.col(id_col).alias("doc"))
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(weight, F.lit(0.0)).alias("weight"),
        )
    )
