"""The examples/web_corpus_pipeline.py lifecycle runs end-to-end: WARC in,
extraction, quality, dedup, link ranking, shuffled JSONL out."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_web_corpus_pipeline_example(spark, sf_dir, tmp_path):
    import web_corpus_pipeline

    s = web_corpus_pipeline.run(str(tmp_path), sf_dir)
    n = s["warc_records"]
    assert n > 0 and s["warc_corrupt"] == 0
    assert s["pages_extracted"] == n
    assert s["frontier_size"] <= n          # URL variants collapse
    assert 0 < s["kept_docs"] <= n
    assert 0 < s["perplexity_head"] <= n
    assert 0.0 <= s["kmv_est_jaccard"] <= 1.0
    assert s["hosts_ranked"] == 7
    assert s["shuffled_out"] == s["kept_docs"]
    # JSONL landed
    out = os.path.join(str(tmp_path), "corpus_jsonl")
    assert any(f.startswith("part-") for f in os.listdir(out))
