"""Web-corpus ingestion lifecycle — the round-5 web surface chained the way
a Common-Crawl-style corpus build actually runs, in one script:

  WARC shards → record parse (sources/warc) → HTML → text + title + links
  (operators/html) → URL canonicalization + crawl dedup (curation) →
  Gopher quality gate → CCNet perplexity buckets (bigram
  LM toward the kept slice) → exact-substring dedup spans → KMV overlap
  estimate vs a held-out slice → link graph → PageRank host ranking →
  deterministic global shuffle → JSONL corpus out.

Every stage is the declared operator from plans/queries.py — this is the
composition story, not new code paths.

Usage: python examples/web_corpus_pipeline.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import curation as CU
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import dedup as D
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import graph as G
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import html as HT
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import sketches as SK
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import textops as TX
from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import _synth_html_col
from aws_dataset_ingestion_metrics_collection_framework_spark.sources.text_corpus import write_jsonl_corpus
from aws_dataset_ingestion_metrics_collection_framework_spark.sources.warc import read_warc, warc_bytes


def run(out_dir: str, sf_dir: str) -> dict:
    spark = get_spark(app_name="web-corpus-pipeline", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # -- 0. fixture: serialize synthesized pages into WARC shards ---------
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pages = docs.select("doc_id", _synth_html_col().alias("html")).orderBy("doc_id")
    warc_dir = os.path.join(out_dir, "warc")
    os.makedirs(warc_dir, exist_ok=True)
    recs = [
        {
            "url": f"http://site{r['doc_id'] % 7}.example/doc/{r['doc_id']}",
            "date": "2026-01-01T00:00:00Z",
            "body": r["html"],
            "content_type": "text/html; charset=utf-8",
        }
        for r in pages.collect()
    ]
    for i in range(2):
        with open(os.path.join(warc_dir, f"crawl-{i}.warc"), "wb") as fh:
            fh.write(warc_bytes(recs[i::2]))

    # -- 1. WARC → HTML → text/links --------------------------------------
    raw, corrupt = read_warc(spark, warc_dir)
    raw = raw.withColumn(
        "doc_id", F.regexp_extract("url", r"doc/(\d+)$", 1).cast("long")
    )
    extracted = HT.html_to_text(raw, "doc_id", "text").withColumnRenamed(
        "text", "clean"
    )
    links = HT.extract_links(raw, "doc_id", "text")

    # -- 2. URL dedup over the crawl frontier ------------------------------
    frontier = CU.url_dedup(raw, "doc_id", "url")

    # -- 3. quality: Gopher gate → perplexity buckets ----------------------
    # (real crawls would insert curation.c4_clean here; the synthetic word
    # soup has no sentence-terminal punctuation, so the C4 line rule would
    # empty it — the c4_clean composition is exercised by `corpus_pipeline`)
    cleaned = extracted.select("doc_id", F.col("clean").alias("text"))
    # relax the stopword rule for the synthetic vocabulary (its only
    # English stopwords are 'the'/'a')
    gated = CU.gopher_rules(
        cleaned, "doc_id", "text",
        min_words=5, stopwords=("the", "a"), min_stopword_hits=1,
    )
    kept = cleaned.join(
        gated.filter(F.col("pass")).select("doc_id"), "doc_id"
    )
    scored = TX.perplexity_scores(cleaned, "doc_id", "text", reference=kept)

    # -- 4. dedup: substring spans + contamination estimate ---------------
    spans = D.duplicate_substring_spans(cleaned, "doc_id", "text", window=8)
    overlap = SK.corpus_overlap(
        cleaned.filter(F.col("doc_id") % 2 == 0),
        cleaned.filter(F.col("doc_id") % 2 == 1),
        "text",
        k=128,
    )

    # -- 5. link graph → PageRank host ranking -----------------------------
    edges = (
        links.filter(F.col("href").startswith("http"))
        .select(
            F.pmod(F.col("doc_id"), F.lit(7)).alias("src"),
            F.regexp_extract("href", r"site(\d+)\.example", 1).cast("long").alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    ranks = G.pagerank(edges, iterations=5)

    # -- 6. deterministic shuffle + JSONL out ------------------------------
    shuffled = TX.global_shuffle(kept, "doc_id", seed=13, n_shards=4)
    corpus_dir = os.path.join(out_dir, "corpus_jsonl")
    write_jsonl_corpus(shuffled.select("doc_id", "text", "shard"), corpus_dir)

    return {
        "warc_records": raw.count(),
        "warc_corrupt": corrupt.count(),
        "pages_extracted": extracted.count(),
        "frontier_size": frontier.count(),
        "kept_docs": kept.count(),
        "perplexity_head": scored.filter(F.col("bucket") == 1).count(),
        "dup_spans": spans.count(),
        "kmv_est_jaccard": float(overlap.collect()[0]["est_jaccard"]),
        "hosts_ranked": ranks.count(),
        "shuffled_out": shuffled.count(),
    }


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/web_corpus_pipeline"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    import json

    print(json.dumps(run(out, sf), indent=2))
