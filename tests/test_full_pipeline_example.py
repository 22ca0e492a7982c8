"""The examples/full_pipeline.py lifecycle runs end-to-end and produces
rows at every stage (the 'switch from the reference' smoke path)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_full_pipeline_example(spark, sf_dir, tmp_path):
    import full_pipeline

    summary = full_pipeline.main(str(tmp_path), sf_dir)
    assert summary["business_scalars"]["lineitem_count"] > 0
    assert summary["metrics_day_rows"] > 0
    assert set(summary["sla_states"]) <= {"OK", "ALARM", "INSUFFICIENT_DATA"}
    assert summary["slas_rows"] == 5
    assert summary["dashboards"] == 1


def test_dataops_pipeline_example(spark, sf_dir, tmp_path):
    import dataops_pipeline

    summary = dataops_pipeline.main(str(tmp_path), sf_dir)
    assert summary["input_docs"] > 0
    # each gate only ever shrinks the corpus
    assert (
        summary["input_docs"]
        >= summary["after_exact_dedup"]
        >= summary["after_near_dedup"]
        >= summary["after_quality_gate"]
        > 0
    )
    assert summary["total_tokens"] > 0
    # a BPE-style estimate over letters-only text never undercounts words
    assert summary["est_subwords"] >= summary["total_tokens"]
    assert 0 < summary["above_avg_target_affinity"] < summary["after_quality_gate"]
    assert 0 < summary["vectors_after_semantic_dedup"]
    assert summary["ann_rows"] > 0
    assert summary["files_before_compaction"] == 16
    assert os.path.isdir(os.path.join(str(tmp_path), "curated_docs"))
    assert os.path.isdir(os.path.join(str(tmp_path), "curated_jsonl"))
