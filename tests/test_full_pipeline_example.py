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
