"""Empirical scaling check: times representative queries at two scale
factors and prints the wall-time ratio against the 10x data ratio —
the local evidence that operator costs grow (sub)linearly with input,
i.e. no hidden quadratic or driver-bound stage.

Usage:
    python tools/scale_check.py [small_dir] [big_dir]   # default sf0.01 -> sf0.1
    python tools/scale_check.py --sf1                   # sf0.1 -> generated ~sf1

``--sf1`` generates a deterministic ~10x-sf0.1 corpus under
$SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1) the first time and
reuses it afterwards — giving the growth curves a third point at ~6M
lineitem rows / 1M events / 50k documents / 20k embeddings. Generation is
fully distributed (seeded hash arithmetic in Column expressions, no driver
loops) and mirrors the sf0.1 generator's statistics:

- ``lineitem``: 10 key-shifted replicas (aggregation probes group on the
  same few keys; 10x rows through the same plan is exactly the scale test).
- ``events``: 10 replicas with DISTINCT user/event ids per replica —
  per-user session structure stays identical, user count grows 10x (the
  realistic growth mode for sessionize/metrics probes; verbatim copies
  would leave sessionization's key cardinality flat).
- ``documents``: generated afresh from the same 31-word vocabulary with the
  same length range and ~0.16% exact-dup rate (measured from sf0.1:
  5000 docs / 4992 distinct). Verbatim 10x copies would give every doc 9
  exact near-dup partners and blow the PAIR count up ~100x — that would
  measure output explosion, not operator scaling.
- ``embeddings``: 20k seeded pseudo-random 64-dim vectors (same value
  range as the originals).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import QUERIES

PROBES = [
    "q01_pricing_summary", "metrics_day", "sla_daily", "dedup_exact_stats",
    "minhash_pairs", "ngram_jaccard", "token_stats", "cosine_topk", "sessionize",
    "dedup_clusters", "tfidf_top_terms",
    # r4: block dedup (one block-keyed shuffle), simhash at the d=3 design
    # point (60 map-side SUMs + 15-bit band join), C4 cleaning (map-only HOFs)
    "paragraph_dedup", "simhash_pairs", "c4_clean",
    # r4b: DSIR weighting (broadcast ratio table + one per-doc SUM shuffle),
    # CDC snapshot (single max_by shuffle — growth should track events 1:1)
    "importance_weights", "upsert_latest",
    # r4c: grid-bucketed overlap join (cell-equi join, no cross product)
    "interval_overlap",
    # r5: web-corpus surface — html_extract (map-only regex chain),
    # url_dedup (one canonical-key shuffle), kmv_overlap (two shingle
    # scans + k-row compare — growth should be the scan cost only),
    # substring_dedup (rolling-window hash: one 8-byte-key shuffle +
    # candidate-sliver island merge), corpus_shuffle (hash + per-shard
    # window sort)
    "html_extract", "url_dedup", "kmv_overlap", "substring_dedup",
    "corpus_shuffle", "perplexity",
    # r5b: snapshot diff (one full-outer key join), group sampling
    # (counts + threshold prefilter + candidate window), fuzzy join
    # (q-gram inverted index with count filter), incremental rollup
    # (map-side-combined partials + slim state merge)
    "snapshot_diff", "group_sample", "fuzzy_join", "incremental_rollup",
    # r5c: cross-corpus dedup, attribution range join, LPA rounds,
    # embedding normalization, mixture sampling
    "incremental_dedup", "attribution", "label_propagation",
    "embedding_norm", "corpus_mix",
    # r5d: anomaly/drift detectors, histogram percentile state, top-k
    # prefilter, survivorship, JSON flatten
    "seasonal_outliers", "cusum", "rollup_percentile", "topk_value",
    "golden_records", "json_flatten",
    # r5e: hashed embeddings, PMI, triangles, PSI
    "hashed_embeddings", "pmi_collocations", "triangles", "psi_drift",
    # r5f: BM25, KMV rollup state, weighted sampling
    "bm25_search", "distinct_rollup", "weighted_sample",
    # r6: progressive-JPEG decode (map-only Arrow, per-doc Python entropy
    # decode — growth should be linear in docs), zlib compression signal
    # (map-only Arrow). bpe_tokenize is NOT probed: its training slice is
    # pinned to doc_id < 50 at every sf (constant work by design).
    "jpeg_progressive", "compression_signals", "main_content",
    # r6b: PQ ANN (slim code-table join + broadcast ADC table)
    "pq_ann",
    # r7: hard-negative mining on the LSH backend — the corpus-scale face
    # (the registered query's brute face is the oracle face); candidate
    # generation is the (table, bucket) equi-join, so growth should track
    # bucket occupancy ~linearly, never the quadratic brute grid
    "hard_negatives_lsh",
    # r7b: fixed-point quality training — crosses its driver-local
    # threshold between sf0.1 (5k docs, numpy loop) and ~sf1 (50k docs,
    # distributed shuffle pair per iteration): the probe measures BOTH
    # faces and the handoff
    "quality_exact",
    # r9: the oracled hashed-count feature projection — one tokenize pass
    # + one (doc, bucket) map-side-combinable aggregate; growth should
    # track token volume 1:1
    "quality_tf",
    # r9b: embedding-space dedup end to end (hyperplane-LSH bucketing →
    # within-bucket cosine verify → edge-touched connected components) —
    # growth should track bucket-occupancy pair volume, never the
    # all-pairs grid, and the CC loop shuffles only edge endpoints
    "semantic_dedup",
]


def _probe_hard_negatives_lsh(spark, sf_dir):
    """LSH-backend mine_hard_negatives with synthetic positives (id+1) —
    keeps the probe timing pure LSH: no brute-force positive discovery."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import mine_hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    positives = q.select(
        F.col("vec_id").alias("query_id"),
        (F.col("vec_id") + 1).alias("vec_id"),
    )
    return mine_hard_negatives(
        q.select(F.col("vec_id").alias("query_id"), "embedding"),
        emb, positives, k=5, method="lsh", n_planes=8, n_tables=4,
    )


# Probes that exercise an operator configuration no registered query uses
# (e.g. the non-oracle backend of a dual-backend operator).
EXTRA_PROBES = {
    "hard_negatives_lsh": _probe_hard_negatives_lsh,
}

SF1_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _replicate(df, n, shifts):
    """Union ``n`` copies, shifting each column in ``shifts`` by
    replica * offset so key cardinality grows with the data."""
    parts = []
    for i in range(n):
        p = df
        for col, offset in shifts.items():
            p = p.withColumn(col, F.col(col) + F.lit(i * offset))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate_sf1(spark, src: str, dest: str) -> None:
    """Deterministic ~10x corpus; see module docstring for the statistics
    each table preserves."""
    os.makedirs(dest, exist_ok=True)

    # dimension tables: copied verbatim (they are dimensions; TPC-H keeps
    # region/nation constant across SFs too)
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dest}/{t}.parquet"
        )

    orders = spark.read.parquet(f"{src}/orders.parquet")
    _replicate(orders, 10, {"o_orderkey": 10_000_000}).write.mode("overwrite").parquet(
        f"{dest}/orders.parquet"
    )
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    _replicate(li, 10, {"l_orderkey": 10_000_000}).write.mode("overwrite").parquet(
        f"{dest}/lineitem.parquet"
    )

    # events carries TIMESTAMP(NANOS) — must go through load_table (which
    # floor-converts to micros); the regenerated copy is plain micros.
    ev = load_table(spark, src, "events")
    _replicate(ev, 10, {"event_id": 1_000_000_000, "user_id": 10_000_000}).write.mode(
        "overwrite"
    ).parquet(f"{dest}/events.parquet")

    # documents: same vocab / length range / dup rate as sf0.1, generated
    # distributed from seeded hashes (no driver loop, no RNG state)
    vocab_rows = (
        spark.read.parquet(f"{src}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .orderBy("w")
        .collect()
    )
    vocab = F.array(*[F.lit(r["w"]) for r in vocab_rows])
    nv = len(vocab_rows)
    langs = F.array(*[F.lit(x) for x in ("en", "en", "zh", "fr", "es", "de")])
    n_docs = 50_000
    docs = (
        spark.range(n_docs)
        .withColumn(
            # ~0.16% exact dups (copy the predecessor — the sf0.1 corpus has
            # 8 dups / 5000 docs) and ~3.3% NEAR-dups (predecessor's stream
            # plus a few extra tokens — sf0.1 has ~178 near-dup pairs / 5000
            # docs by shared-200-char-prefix count), so the minhash / LSH /
            # component probes do representative candidate work at 10x.
            "seed_id",
            F.when(
                ((F.col("id") % 625) == 624) | ((F.col("id") % 30) == 29),
                F.col("id") - 1,
            ).otherwise(F.col("id")),
        )
        .withColumn(
            "extra",
            F.when(
                ((F.col("id") % 30) == 29) & ((F.col("id") % 625) != 624),
                F.pmod(F.xxhash64(F.col("id"), F.lit(5)), F.lit(3)) + 3,
            ).otherwise(F.lit(0)),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        ((F.pmod(F.xxhash64(F.col("seed_id"), F.lit(1)), F.lit(93)) + 8)
                         + F.col("extra")).cast("int"),
                    ),
                    lambda i: F.element_at(
                        vocab,
                        (F.pmod(F.xxhash64(F.col("seed_id") * 1000 + i.cast("long")), F.lit(nv)) + 1).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
            F.element_at(
                langs, (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(6)) + 1).cast("int")
            ).alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.write.mode("overwrite").parquet(f"{dest}/documents.parquet")

    emb = (
        spark.range(20_000)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda j: (
                    (F.pmod(F.xxhash64(F.col("id") * 64 + j.cast("long"), F.lit(3)), F.lit(2001)) - 1000)
                    / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    emb.write.mode("overwrite").parquet(f"{dest}/embeddings.parquet")


def main():
    probes = PROBES
    if len(sys.argv) > 1 and sys.argv[1] == "--sf1":
        small = "/root/testdata/sf0.1"
        big = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
        if len(sys.argv) > 2:  # optional probe subset (resumable sweeps)
            probes = [p for p in PROBES if p in set(sys.argv[2:])]
    else:
        small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
        big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        if len(sys.argv) > 3:  # optional probe subset here too
            probes = [p for p in PROBES if p in set(sys.argv[3:])]

    # ~sf1 probes build broadcast sides and window state an order of
    # magnitude past the bench SF; the default local driver heap (1g) is a
    # harness artifact, not an engine limit — size it like the 128 GiB
    # local[32] environment the brief specifies.
    spark = get_spark(
        app_name="scale-check", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if big.startswith("/tmp") and not os.path.exists(os.path.join(big, "lineitem.parquet")):
        print(f"# generating ~sf1 corpus under {big} ...", file=sys.stderr)
        generate_sf1(spark, small, big)
        # Measure in a FRESH session: the generator leaves the JVM with GBs
        # of finished-stage state whose GC skews the very first probes
        # (observed: q01 26 s in the generator session vs 1.3 s clean).
        spark.stop()
        spark = get_spark(
            app_name="scale-check", extra_conf={"spark.driver.memory": "24g"}
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name in probes:
        ts = {}
        for label, d in (("small", small), ("big", big)):
            fn = QUERIES.get(name) or EXTRA_PROBES[name]
            fn(spark, d).collect()          # warm (codegen + FS cache)
            # MIN of 2 timed runs, same rationale as bench.py: a single
            # post-warm-up run still drifts with whatever GC/compilation
            # debt the preceding probes left in the shared JVM (observed:
            # cosine_topk 4.5 s in-suite vs 0.9 s isolated at sf0.1) —
            # the min is the number that predicts cluster throughput.
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            ts[label] = best
        out[name] = {
            "small_s": round(ts["small"], 3),
            "big_s": round(ts["big"], 3),
            "ratio": round(ts["big"] / ts["small"], 2),
        }
        print(f"{name:22s} {ts['small']:.2f}s -> {ts['big']:.2f}s  ratio {out[name]['ratio']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
