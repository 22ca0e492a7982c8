"""Property tests for the curation operators.

Strategy note: each property collects a BATCH of generated documents into
one DataFrame per example (Spark job startup dominates otherwise), and the
per-example budget is kept small — these guard invariants, the goldens in
test_curation.py pin exact values.
"""

import re

from hypothesis import given, settings, strategies as st

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import (
    C4_TERMINAL,
    PII_PATTERNS,
    c4_clean,
    redact_pii,
)

# Text fragments that exercise the PII patterns from both sides.
_pii_atoms = st.sampled_from([
    "alice@example.com", "bob.smith+tag@sub.domain.org", "not-an-email@",
    "555-867-5309", "555.123.4567", "12-34-5678",
    "10.0.0.1", "192.168.255.254", "1.2.3", "999.999.999.999",
    "plain", "words", "here", "{", "lorem", "ipsum",
])
_doc = st.lists(_pii_atoms, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=24))
def test_redaction_is_idempotent_and_clean(spark, docs):
    """After redaction no PII pattern matches, and redacting twice equals
    redacting once (the placeholders never re-trigger a pattern)."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    once = redact_pii(df, "doc_id", "text")
    rows = {r["doc_id"]: r["redacted"] for r in once.collect()}
    for red in rows.values():
        for pat, _ in PII_PATTERNS.values():
            assert re.search(pat, red) is None, (red, pat)
    twice = redact_pii(
        once.withColumnRenamed("redacted", "text"), "doc_id", "text"
    )
    assert {r["doc_id"]: r["redacted"] for r in twice.collect()} == rows


_line_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon",
                     "javascript", "words", "more"]),
    min_size=1, max_size=8,
).map(" ".join)
_line = st.tuples(_line_words, st.sampled_from([".", "!", "?", '"', "", " ", ";"])) \
    .map(lambda t: t[0] + t[1])
_page = st.lists(_line, min_size=1, max_size=10).map("\n".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_page, min_size=1, max_size=24))
def test_c4_output_lines_all_satisfy_line_rules(spark, pages):
    """Every line of every kept document's clean_text individually passes
    the C4 line rules, counters are consistent, and dropped docs emit ''."""
    df = spark.createDataFrame(list(enumerate(pages)), "doc_id long, text string")
    out = c4_clean(df, "doc_id", "text", min_words_per_line=3, min_lines=2)
    for r in out.collect():
        assert 0 <= r["n_kept"] <= r["n_lines"]
        if not r["doc_kept"]:
            assert r["clean_text"] == ""
            continue
        lines = r["clean_text"].split("\n")
        assert len(lines) == r["n_kept"] >= 2
        for line in lines:
            assert line[-1] in C4_TERMINAL
            assert len(line.split()) >= 3
            assert "javascript" not in line.lower()
