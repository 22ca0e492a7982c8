"""Property tests for the pair-join primitives: the banded Hamming join
and the grid-bucketed interval overlap join must equal brute force on
arbitrary inputs (completeness is the whole contract — a missed pair is a
silent dedup/correlation hole).

Each example batches its data into one DataFrame (job startup dominates
otherwise); example counts stay small, brute force is O(n²) driver-side.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import hamming_pairs
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import (
    interval_overlap_join,
)

_sig = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@settings(max_examples=6, deadline=None)
@given(st.lists(_sig, min_size=2, max_size=30), st.integers(min_value=0, max_value=6))
def test_hamming_pairs_equals_brute_force(spark, sigs, d):
    df = spark.createDataFrame(list(enumerate(sigs)), "id long, sig long")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "id", "sig", max_hamming=d).collect()
    )
    want = sorted(
        (i, j, _ham(a, b))
        for i, a in enumerate(sigs)
        for j, b in enumerate(sigs)
        if i < j and _ham(a, b) <= d
    )
    assert got == want


_iv = st.tuples(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=0, max_value=500),
).map(lambda t: (t[0], t[0] + t[1]))  # (start, end) with end >= start


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_iv, min_size=1, max_size=20),
    st.lists(_iv, min_size=1, max_size=20),
    st.sampled_from([7, 64, 257]),
)
def test_interval_overlap_equals_brute_force(spark, ls, rs, width):
    left = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(ls)], "iid long, s long, e long"
    )
    right = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rs)], "iid long, s long, e long"
    )
    got = sorted(
        (r["iid_l"], r["iid_r"])
        for r in interval_overlap_join(
            left, right, l_id="iid", l_start="s", l_end="e",
            r_id="iid", r_start="s", r_end="e", bucket_width=width,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (ls_, le) in enumerate(ls)
        for j, (rs_, re) in enumerate(rs)
        if ls_ < le and rs_ < re and ls_ < re and rs_ < le
    )
    assert got == want
