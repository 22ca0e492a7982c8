"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast nested-loop join with the
dot product computed JVM-side via ``zip_with``/``aggregate`` (no Python in
the loop). Scale path: random-hyperplane LSH bucketing (shuffle-partitioned
candidate generation), the classic recall/cost trade.

At 100 TB the corpus side stays partitioned; only the (small) query set is
broadcast — Catalyst turns the crossJoin+filter into BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Queries are broadcast
    (small side); the corpus scan is a single pass, no shuffle until the
    per-query top-k aggregation."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_literals(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def random_hyperplane_bucket(vec: Column, *, n_planes: int = 8, seed: int = 7, dim: int = 64) -> Column:
    """LSH bucket id = sign-bit string of ``n_planes`` random projections.
    Plane vectors are deterministic literals (no data pass needed)."""
    planes = _plane_literals(dim, n_planes, seed)
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` independent hyperplane tables; exact cosine + top-k within
    candidates. Equi-join on (table, bucket) → shuffle-partitioned, no cross
    join — the 100 TB path.

    Recall ≈ 1-(1-p^n_planes)^n_tables with p = 1-θ/π per plane: fewer
    planes → bigger buckets (cost↑ recall↑); more tables → recall↑ at
    linear candidate-generation cost.
    """

    def bucketed(df: DataFrame, idc: str, idname: str, vname: str) -> DataFrame:
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    random_hyperplane_bucket(
                        F.col(vec_col), n_planes=n_planes, seed=seed + 1000 * t, dim=dim
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(idc).alias(idname), F.col(vec_col).alias(vname), F.explode(tables).alias("tb")
        ).select(idname, vname, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    q = bucketed(queries, query_id, "query_id", "qv")
    c = bucketed(corpus, corpus_id, "neighbor_id", "cv")
    pairs = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id", "neighbor_id", cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
