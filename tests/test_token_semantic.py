"""Tests for token_estimate (BPE-ish counting) and semantic_dedup."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import semantic_dedup
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import token_estimate


def test_token_estimate_goldens(spark):
    rows = [
        (0, "hello world"),                # 2 ws tokens, 2 pieces, 2+2=... ceil(5/4)=2 each → 4
        (1, "don't stop"),                 # pieces: don ' t stop → 4
        (2, "x12,y"),                      # x | 12 | , | y → 4 pieces, 4 subwords
        (3, ""),                           # empty
        (4, "supercalifragilistic"),       # 1 piece of 20 chars → 5 subwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in token_estimate(df, "doc_id", "text").collect()}
    assert (out[0]["n_ws_tokens"], out[0]["n_pieces"], out[0]["est_subwords"]) == (2, 2, 4)
    assert (out[1]["n_ws_tokens"], out[1]["n_pieces"], out[1]["est_subwords"]) == (2, 4, 4)
    assert (out[2]["n_ws_tokens"], out[2]["n_pieces"], out[2]["est_subwords"]) == (1, 4, 4)
    assert (out[3]["n_ws_tokens"], out[3]["n_pieces"], out[3]["est_subwords"]) == (0, 0, 0)
    assert (out[4]["n_ws_tokens"], out[4]["n_pieces"], out[4]["est_subwords"]) == (1, 1, 5)


def test_semantic_dedup_groups_and_keeps_min(spark):
    # 3 exact-duplicate vectors (0,1,2), one near-dup pair (10,11), singletons
    base = [1.0] + [0.0] * 7
    near = [0.98, 0.199, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = [
        (0, base), (1, base), (2, base),
        (10, [0.0, 1.0] + [0.0] * 6), (11, [0.001, 0.9999995] + [0.0] * 6),
        (20, [0.0] * 7 + [1.0]),
        (21, near),  # cosine vs base = 0.98/|near| ≈ 0.98 → joins group 0 at t=0.9
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, "vec_id", "embedding",
                         threshold=0.9, n_planes=2, n_tables=8)
    res = {r["vec_id"]: r for r in out.collect()}
    assert len(res) == 7  # total assignment
    assert {res[i]["cluster_rep"] for i in (0, 1, 2, 21)} == {0}
    assert res[10]["cluster_rep"] == res[11]["cluster_rep"] == 10
    assert res[20]["cluster_rep"] == 20 and res[20]["keep"]
    kept = {i for i, r in res.items() if r["keep"]}
    assert kept == {0, 10, 20}


def test_semantic_dedup_auto_planes(spark):
    """n_planes='auto' pins bucket occupancy ~16 via ceil(log2(n/16))
    clamped to [8, 24]: ≤4096 rows resolves to exactly the numeric
    default 8 (bit-identical output), a larger corpus resolves higher,
    and identical-vector dups are found under EVERY plane count (they
    collide in all buckets)."""
    import pytest
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import embedding_near_dup_pairs

    base = [1.0] + [0.0] * 7
    rows = [(0, base), (1, base), (10, [0.0, 1.0] + [0.0] * 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got_auto = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, "vec_id", "embedding",
                                          n_planes="auto").collect()
    )
    got_8 = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, "vec_id", "embedding",
                                          n_planes=8).collect()
    )
    assert got_auto == got_8 == [(0, 1)]

    # 5000 rows → ceil(log2(5000/16)) = 9 planes; planted identical pair
    big = spark.range(5000).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.xxhash64(
                F.when(F.col("id") == 4999, F.lit(0)).otherwise(F.col("id"))
                * 8 + F.lit(j)), F.lit(1001)) / 1000.0).cast("double")
            for j in range(8)
        ]).alias("embedding"),
    )
    pairs = semantic_dedup(big, "vec_id", "embedding", n_planes="auto")
    res = {r["vec_id"]: r["cluster_rep"] for r in pairs.collect()}
    assert res[4999] == 0 and res[0] == 0
    assert len(res) == 5000

    with pytest.raises(ValueError):
        embedding_near_dup_pairs(df, "vec_id", "embedding", n_planes="bogus")


class TestPmiCollocations:
    """PMI: tight pairs outrank frequent-but-independent ones; hapax
    suppression via min_count."""

    def test_bound_phrase_beats_independent_pair(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import pmi_collocations
        # 'new york' always adjacent; 'the'/'cat' both frequent but mixed
        docs = []
        for i in range(10):
            docs.append((i, "new york is where the cat saw the dog and "
                            "the cat ran from the dog quickly"))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = pmi_collocations(df, "doc_id", "text", min_count=5, top_n=20).collect()
        pmis = {(r["w1"], r["w2"]): r["pmi"] for r in out}
        # 'new york' is maximally bound (always adjacent, both words
        # unique to the pair) — it shares the TOP pmi value (several
        # always-adjacent pairs tie; ranking is (pmi, w1, w2) total order)
        top = max(pmis.values())
        assert pmis[("new", "york")] == top
        assert pmis[("new", "york")] > pmis[("the", "cat")]

    def test_min_count_suppresses_hapax(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import pmi_collocations
        df = spark.createDataFrame(
            [(1, "rare pair appears once amid other words"),
             (2, "other words fill out this corpus a bit more")],
            "doc_id long, text string",
        )
        out = pmi_collocations(df, "doc_id", "text", min_count=2, top_n=50).collect()
        assert ("rare", "pair") not in {(r["w1"], r["w2"]) for r in out}

    def test_deterministic(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import pmi_collocations
        df = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon {i % 3}") for i in range(30)],
            "doc_id long, text string",
        )
        a = [tuple(r) for r in pmi_collocations(df, "doc_id", "text", min_count=3).collect()]
        b = [tuple(r) for r in pmi_collocations(df.repartition(7), "doc_id", "text", min_count=3).collect()]
        assert a == b


class TestBm25Rank:
    """Okapi BM25: idf dominance of rare terms, length normalization,
    determinism, no-match exclusion."""

    def _rank(self, spark, rows, terms, **kw):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import bm25_rank
        df = spark.createDataFrame(rows, "id long, text string")
        return [(r["id"], r["score"])
                for r in bm25_rank(df, "id", "text", terms, **kw).collect()]

    def test_rare_term_outranks_common(self, spark):
        rows = [(i, "common words fill this document nicely") for i in range(20)]
        rows.append((100, "common words plus the zebra appears here"))
        out = self._rank(spark, rows, ["zebra", "common"])
        assert out[0][0] == 100  # only doc with the rare term wins

    def test_length_normalization(self, spark):
        rows = [
            (1, "target " + "filler " * 50),
            (2, "target " + "filler " * 5),
        ]
        out = dict(self._rank(spark, rows, ["target"]))
        assert out[2] > out[1]  # same tf, shorter doc scores higher

    def test_no_match_docs_excluded_and_deterministic(self, spark):
        rows = [(1, "apple banana"), (2, "cherry date"), (3, "apple fig")]
        a = self._rank(spark, rows, ["apple"])
        b = self._rank(spark, rows, ["APPLE"])  # case-folded query
        assert [i for i, _ in a] == [1, 3] or [i for i, _ in a] == [3, 1]
        assert a == b
        assert 2 not in {i for i, _ in a}

    def test_empty_query_raises(self, spark):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            self._rank(spark, [(1, "x")], [])
