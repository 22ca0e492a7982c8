"""IVF-PQ composition (operators/similarity.py): PQ codes inside the IVF
lists — probe bounds the candidate ROWS, ADC over stored codes bounds the
candidate BYTES, optional exact re-rank removes quantization error from
the final ranking. Build/query parity, persisted lifecycle (append /
replay / compact / torn-swap repair), plan pins (codes-only column
pruning + list_id partition pruning on the ADC scan), and the
planted-twin exactness contract."""

import os

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
    _pq_assign,
    _pq_codes_as_array,
    _pq_subslices,
    _unit_vec,
    append_to_ivfpq_index,
    build_ivfpq_index,
    compact_ivfpq_index,
    index_layout_stats,
    index_maintenance_plan,
    ivf_index_stats,
    ivfpq_ann_topk,
    load_ivfpq_index,
    persist_ivfpq_index,
    repair_ivfpq_index,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.sources import fsio


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivfpq_build_shapes_and_planted_twin(spark, sf_dir):
    """entries carries (id, vec, list_id, codes[m]); a bit-identical twin
    query probes its source's own list (same argmax kernel) and its ADC
    distance is PROVABLY minimal (its codes are the argmin encoding of
    itself), so top-1 recovery is exact at n_probe=1 — in both ADC and
    exact-rerank modes."""
    emb = _emb(spark, sf_dir)
    idx = build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16)
    ivf_cents, pq_cents, entries = idx
    assert entries.columns == ["vec_id", "embedding", "list_id", "codes"]
    assert pq_cents.count() == 4 * 16
    row = entries.filter(F.col("codes").isNotNull()).first()
    assert len(row["codes"]) == 4
    assert all(0 <= c < 16 for c in row["codes"])

    twins = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    adc = ivfpq_ann_topk(twins, idx, k=1, n_probe=1, scorer="hof")
    assert adc.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]
    assert (
        adc.filter(
            (F.col("rank") == 1)
            & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
        ).count()
        == 20
    )
    rr = ivfpq_ann_topk(twins, idx, k=1, n_probe=1, rerank=8, scorer="hof")
    assert rr.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    assert (
        rr.filter(
            (F.col("rank") == 1)
            & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
            & (F.col("cosine") > 0.999999)
        ).count()
        == 20
    )


def test_ivfpq_rerank_candidates_come_from_adc_topr(spark, sf_dir):
    """rerank=R re-scores exactly the ADC top-max(R, k) set: every
    reranked neighbor appears in the ADC top-R for its query, and its
    cosine equals the exact HOF cosine recomputed from the raw vectors."""
    emb = _emb(spark, sf_dir)
    idx = build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16)
    queries = emb.filter(F.col("vec_id") < 5)
    adc_top = ivfpq_ann_topk(queries, idx, k=12, n_probe=6, scorer="hof")
    rr = ivfpq_ann_topk(queries, idx, k=5, n_probe=6, rerank=12, scorer="hof")
    adc_set = {(r["query_id"], r["neighbor_id"]) for r in adc_top.collect()}
    rr_rows = rr.collect()
    assert all((r["query_id"], r["neighbor_id"]) in adc_set for r in rr_rows)
    # cosines are the exact scores (scale-invariant — raw vectors)
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        cosine_similarity,
    )

    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .crossJoin(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("cv"),
            )
        )
        .select(
            "query_id", "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("cos"),
        )
        .collect()
    }
    assert all(
        exact[(r["query_id"], r["neighbor_id"])] == r["cosine"] for r in rr_rows
    )


def test_ivfpq_persist_roundtrip_layout_and_param_guards(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    idx = build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16, hash_fn="md5")
    queries = emb.filter(F.col("vec_id") < 10)
    inline = sorted(
        map(tuple, ivfpq_ann_topk(queries, idx, k=5, n_probe=4, scorer="hof").collect())
    )
    root = str(tmp_path / "ivfpq_idx")
    persist_ivfpq_index(idx, root, m=4, pq_k=16, hash_fn="md5")
    loaded, params = load_ivfpq_index(spark, root)
    assert params == {
        "m": 4, "scale_bits": 20, "hash_fn": "md5", "normalize": True,
    }
    persisted = sorted(
        map(
            tuple,
            ivfpq_ann_topk(
                queries, loaded, k=5, n_probe=4, scorer="hof", **params
            ).collect(),
        )
    )
    assert persisted == inline
    # one data file per list directory
    assert all(
        sum(1 for f in files if f.endswith(".parquet")) <= 1
        for _, _, files in os.walk(os.path.join(root, "entries"))
    )
    # manifest-vs-codebook desync raises, both at persist and at query
    with pytest.raises(ValueError, match="disagree"):
        persist_ivfpq_index(idx, str(tmp_path / "x"), m=8, pq_k=16)
    with pytest.raises(ValueError, match="m=8"):
        ivfpq_ann_topk(queries, loaded, k=5, n_probe=4, m=8)
    other = str(tmp_path / "not_ivfpq")
    spark.createDataFrame([("ivf",)], "format string").coalesce(1).write.json(
        f"{other}/meta"
    )
    with pytest.raises(ValueError, match="not an IVF-PQ"):
        load_ivfpq_index(spark, other)


def test_ivfpq_append_parity_replay_compact_repair(spark, sf_dir, tmp_path):
    """The full maintenance lifecycle: append encodes with the build's own
    kernels against BOTH frozen quantizers, replay with dedupe adds 0,
    compact folds the layout without changing results, and a torn
    compaction swap heals forward."""
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    root = str(tmp_path / "ivfpq_maint")
    persist_ivfpq_index(
        build_ivfpq_index(base, n_lists=8, m=4, pq_k=16), root, m=4, pq_k=16
    )
    appended = append_to_ivfpq_index(spark, root, batch, dedupe=True)
    assert appended == batch.count()
    assert append_to_ivfpq_index(spark, root, batch, dedupe=True) == 0

    # append parity: appended codes == the frozen-codebook encode of the
    # batch (normalized, exactly as the build encodes)
    (ivf_cents, pq_cents, entries), params = load_ivfpq_index(spark, root)
    got = {
        (r["vec_id"], tuple(r["codes"]))
        for r in entries.filter(F.col("vec_id") % 2 == 1).collect()
    }
    enc_in = batch.select(
        F.col("vec_id").alias("cid"),
        _unit_vec(F.col("embedding").cast("array<double>")).alias("v"),
    )
    expect_codes = _pq_codes_as_array(
        _pq_assign(
            _pq_subslices(enc_in, "cid", "v", 4, 20, "cid"), pq_cents, "cid"
        ).select("cid", "sub", "code"),
        "cid",
    )
    expect = {(r["cid"], tuple(r["codes"])) for r in expect_codes.collect()}
    assert got == expect

    queries = emb.filter(F.col("vec_id") < 5)
    before = sorted(
        map(
            tuple,
            ivfpq_ann_topk(
                queries, load_ivfpq_index(spark, root)[0], k=5, n_probe=6,
                scorer="hof", **params,
            ).collect(),
        )
    )
    compact_ivfpq_index(spark, root)
    assert all(
        sum(1 for f in files if f.endswith(".parquet")) <= 1
        for _, _, files in os.walk(os.path.join(root, "entries"))
    )
    after = sorted(
        map(
            tuple,
            ivfpq_ann_topk(
                queries, load_ivfpq_index(spark, root)[0], k=5, n_probe=6,
                scorer="hof", **params,
            ).collect(),
        )
    )
    assert before == after

    # torn swap: live tree renamed away with a committed __compacting in
    # place — repair finishes the swap and results are unchanged
    live, tmp, old = (
        f"{root}/entries", f"{root}/entries__compacting", f"{root}/entries__old"
    )
    fsio.rename(live, tmp)
    fsio.write_text_atomic(f"{tmp}/_COMPACT_META", "1")
    assert repair_ivfpq_index(spark, root) is True
    assert fsio.exists(live) and not fsio.exists(tmp) and not fsio.exists(old)
    healed = sorted(
        map(
            tuple,
            ivfpq_ann_topk(
                queries, load_ivfpq_index(spark, root)[0], k=5, n_probe=6,
                scorer="hof", **params,
            ).collect(),
        )
    )
    assert healed == after


def test_ivfpq_adc_scan_prunes_vector_column_and_partitions(spark, sf_dir, tmp_path):
    """THE point of the composition, pinned in the plan: the ADC stage's
    scan of the persisted entries tree reads the codes column and NOT the
    float vector column (parquet column pruning — the ~dim·8/(m·4) byte
    cut), and the probe join carries dynamic partition pruning on
    list_id. The rerank stage — and only it — reads the vector column."""
    emb = _emb(spark, sf_dir)
    root = str(tmp_path / "ivfpq_plan")
    persist_ivfpq_index(
        build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16), root, m=4, pq_k=16
    )
    loaded, params = load_ivfpq_index(spark, root)
    queries = emb.filter(F.col("vec_id") < 5)
    adc = ivfpq_ann_topk(queries, loaded, k=5, n_probe=4, scorer="hof", **params)
    plan = adc._jdf.queryExecution().executedPlan().toString()
    # the entries scan is the one whose OUTPUT carries the codes column
    # (match on columns, not the path — toString truncates long lines)
    code_scans = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "codes#" in ln
    ]
    assert code_scans, plan[:3000]
    assert all("embedding#" not in ln for ln in code_scans), code_scans
    assert "dynamicpruning" in plan, plan[:3000]
    assert adc.count() > 0

    rr = ivfpq_ann_topk(
        queries, loaded, k=5, n_probe=4, rerank=10, scorer="hof", **params
    )
    rplan = rr._jdf.queryExecution().executedPlan().toString()
    rlines = rplan.splitlines()
    # the rerank stage — identified by list_id in the scan output — reads
    # the vector column; the ADC-side scan still avoids it
    assert any(
        "FileScan parquet" in ln and "embedding#" in ln and "list_id#" in ln
        for ln in rlines
    ), rplan[:3000]
    assert any(
        "FileScan parquet" in ln and "codes#" in ln and "embedding#" not in ln
        for ln in rlines
    ), rplan[:3000]
    assert rr.count() > 0


def test_ivfpq_gauges_and_policy_compose(spark, sf_dir, tmp_path):
    """entries carries list_id, so the IVF gauge family runs unchanged on
    an IVF-PQ index and the maintenance policy consumes it."""
    from pyspark.sql import functions as FF

    emb = _emb(spark, sf_dir)
    root = str(tmp_path / "ivfpq_gauge")
    persist_ivfpq_index(
        build_ivfpq_index(
            emb.filter(F.col("vec_id") % 2 == 0), n_lists=8, m=4, pq_k=16
        ),
        root, m=4, pq_k=16,
    )
    for shift in (1_000_000, 2_000_000):
        append_to_ivfpq_index(
            spark, root,
            emb.filter(F.col("vec_id") % 2 == 1).select(
                (F.col("vec_id") + shift).alias("vec_id"), "embedding"
            ),
        )
    ls = index_layout_stats(spark, root, "entries")
    assert ls["max_files_per_dir"] >= 3
    entries = load_ivfpq_index(spark, root)[0][2]
    stats = ivf_index_stats(entries).withColumn(
        "files_per_dir", FF.lit(ls["max_files_per_dir"])
    )
    verdict = index_maintenance_plan(stats, max_files_per_dir=2).first()
    assert verdict["action"] == "compact_due"
    assert stats.first()["n_rows"] == entries.count()


def test_ivfpq_malformed_and_wrong_width_inputs(spark, sf_dir):
    """Null query vectors and queries whose width disagrees with the
    codebook produce NO rows (scorer-independent contract, same as the
    flat families); normalize=False keeps the raw pq_index semantics."""
    emb = _emb(spark, sf_dir)
    idx = build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16)
    bad = spark.createDataFrame(
        [(1, None), (2, [0.1, 0.2, 0.3])],
        "vec_id long, embedding array<double>",
    )
    assert ivfpq_ann_topk(bad, idx, k=3, n_probe=2, scorer="hof").count() == 0

    raw_idx = build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16, normalize=False)
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivfpq_ann_topk(
        queries, raw_idx, k=3, n_probe=8, normalize=False, scorer="hof"
    )
    assert out.count() == 9


def test_sharded_ivfpq_degenerations(spark, sf_dir):
    """The composition's two exactness anchors: 1 shard reproduces the
    flat ivfpq row for row (ADC and rerank), and a probe budget covering
    every list returns the SAME ADC rows at 2 shards as flat — the
    shared corpus-trained codebook makes full-budget ADC distances
    shard-independent."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        build_sharded_ivfpq_index,
        sharded_ivfpq_ann_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    flat = build_ivfpq_index(emb, n_lists=6, m=4, pq_k=16)
    one = build_sharded_ivfpq_index(emb, n_shards=1, n_lists=6, m=4, pq_k=16)
    two = build_sharded_ivfpq_index(emb, n_shards=2, n_lists=6, m=4, pq_k=16)

    f_adc = sorted(map(tuple, ivfpq_ann_topk(
        queries, flat, k=5, n_probe=4, scorer="hof").collect()))
    s_adc = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, one, k=5, n_probe=4, scorer="hof").collect()))
    assert f_adc == s_adc
    f_rr = sorted(map(tuple, ivfpq_ann_topk(
        queries, flat, k=5, n_probe=4, rerank=15, scorer="hof").collect()))
    s_rr = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, one, k=5, n_probe=4, rerank=15, scorer="hof").collect()))
    assert f_rr == s_rr

    full_flat = sorted(map(tuple, ivfpq_ann_topk(
        queries, flat, k=5, n_probe=6, scorer="hof").collect()))
    full_two = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, two, k=5, n_probe=12, scorer="hof").collect()))
    assert full_flat == full_two


def test_sharded_ivfpq_persisted_lifecycle(spark, sf_dir, tmp_path):
    """Persist/load round trip, hash-routed appends with replay
    idempotence, compaction layout + result parity, and planted-twin
    recovery — the sharded composition gets the full maintenance story."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        append_to_sharded_ivfpq_index,
        build_sharded_ivfpq_index,
        compact_sharded_ivfpq_index,
        load_sharded_ivfpq_index,
        persist_sharded_ivfpq_index,
        sharded_ivfpq_ann_topk,
    )

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 5)
    idx = build_sharded_ivfpq_index(base, n_shards=2, n_lists=6, m=4, pq_k=16)
    inline = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, idx, k=5, n_probe=6, scorer="hof").collect()))
    root = str(tmp_path / "sivfpq")
    persist_sharded_ivfpq_index(idx, root, m=4, pq_k=16)
    loaded, params = load_sharded_ivfpq_index(spark, root)
    assert params["m"] == 4 and params["normalize"] is True
    persisted = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, loaded, k=5, n_probe=6, scorer="hof", **params).collect()))
    assert persisted == inline

    appended = append_to_sharded_ivfpq_index(spark, root, batch, dedupe=True)
    assert appended == batch.count()
    assert append_to_sharded_ivfpq_index(spark, root, batch, dedupe=True) == 0
    # routed correctly: every appended row lives in its hash shard
    for s in range(2):
        entries = load_sharded_ivfpq_index(spark, root)[0][1][s][1]
        bad = entries.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)) != s
        ).count()
        assert bad == 0

    before = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, load_sharded_ivfpq_index(spark, root)[0],
        k=5, n_probe=6, scorer="hof", **params).collect()))
    compact_sharded_ivfpq_index(spark, root)
    for s in range(2):
        assert all(
            sum(1 for f in files if f.endswith(".parquet")) <= 1
            for _, _, files in os.walk(
                os.path.join(root, f"shard={s:05d}", "entries")
            )
        )
    after = sorted(map(tuple, sharded_ivfpq_ann_topk(
        queries, load_sharded_ivfpq_index(spark, root)[0],
        k=5, n_probe=6, scorer="hof", **params).collect()))
    assert before == after

    # twins probe the FULL budget (2 shards × 6 lists): unlike the flat
    # path, the GLOBAL budget at n_probe=1 can rank another shard's
    # centroid above the twin's source list (measured: 8/10 at
    # n_probe=1) — with every list probed, ADC minimality makes top-1
    # recovery provable again
    twins = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    hits = sharded_ivfpq_ann_topk(
        twins, load_sharded_ivfpq_index(spark, root)[0],
        k=1, n_probe=12, rerank=8, scorer="hof", **params,
    )
    assert hits.filter(
        (F.col("rank") == 1)
        & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
        & (F.col("cosine") > 0.999999)
    ).count() == 10
