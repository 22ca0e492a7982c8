"""ANN auto-sizing scale probe (SCALE.md r10 evidence): measures the IVF
build-once/query-many path and the LSH planted-twin query path on
generated corpora across size decades.

Usage:
    python tools/ann_scale_probe.py ivf [n ...] [--dim D] [--scorer S]   # default 200000 2000000, D=64
    python tools/ann_scale_probe.py lsh [n ...] [--dim D] [--scorer S]
    python tools/ann_scale_probe.py sharded [n ...] [--dim D] [--scorer S] [--shards K]
    python tools/ann_scale_probe.py pq [n ...] [--dim D]
    python tools/ann_scale_probe.py append [n ...] [--dim D] [--scorer S]
    python tools/ann_scale_probe.py amortize [n ...] [--dim D] [--scorer S] [--shards K]
    python tools/ann_scale_probe.py shardbuild [n ...] [--dim D] [--shards K] [--mat-only]
    python tools/ann_scale_probe.py ivfpq [n ...] [--dim D] [--scorer S]
    python tools/ann_scale_probe.py skewknee [n ...] [--dim D] [--scorer S]

``--scorer`` forces the candidate-scoring kernel ('hof'|'arrow';
default 'auto' — the dim-based cutover the query path itself applies).

sharded: the flat-vs-sharded A/B past the 4096-list clamp (SCALE.md r12).
For each n it builds BOTH the flat clamped index (n_lists='auto') and the
auto-sharded one (build_sharded_ivf_index, n_shards='auto'), persists each
through its engine helper, and measures the indexed query path min-of-2
PLUS the EXACT probed rows per query (the probe-selection stage joined to
the real per-list occupancies — the read-volume number the sharded design
exists to bound: flat grows as n_probe·n/4096 past 16.8M vectors, sharded
stays ≤ n_probe × ~4096).

amortize (SCALE.md r13): the sharded-build/query economics closer — on
ONE generated corpus it (a) times the flat build+persist and the sharded
build+persist BOTH ways (direct N-scan vs the one-shuffle
``scratch_dir`` materialized split), with a persisted-tree fingerprint
pinning that the two sharded paths built the SAME index; (b) times the
flat and sharded query paths at BOTH a small (100) and a large (1000)
query batch, so the per-shard fixed query overhead can be shown
amortizing toward the read-volume ratio as the batch grows.

append: the index-maintenance economics point (SCALE.md r12) — build +
persist the corpus index once (the rebuild cost), then append a 10%
increment via ``append_to_ivf_index`` (the O(batch) daily-crawl path),
compact, and re-query: reports append-vs-rebuild ratio, compact cost,
and the indexed query time over the grown index.

ivfpq (SCALE.md r14): the probe-BYTES A/B — flat IVF vs the IVF-PQ
composition on the same corpus, both persisted through their engine
helpers; per-probed-list column bytes are read from parquet column-chunk
metadata (exact on-disk read volume, not an estimate), so the headline
is probe_bytes_per_query(ivf float vectors) / probe_bytes_per_query
(ivfpq int codes), plus build + ADC / rerank query wall times and a
planted-twin sanity gate.

skewknee (SCALE.md r14): the rebuild-trigger evidence — drift a frozen-
centroid index with a tight cluster in avg-occupancy multiples (hot
list = 2x, 3x, 5x, 9x, 17x, 33x avg → skew ≈ those values), measuring
skew vs HOT-QUERY probed rows and latency at every step (cluster-drawn
queries probe the hot list — where degradation physically lives; base
queries ride along as the control), then rebuild via
apply_maintenance_plan and measure the recovery. Ties the policy's
skew_threshold to a measured latency curve: hot-query read
amplification ≈ 1 + (skew−1)/n_probe.

pq: the ADC economics point (SCALE.md r12) — pq_ann_topk end to end
(integer k-means train + encode + asymmetric-distance scan) with
``m='auto'`` (~16 dims/subspace; 768-dim → 48 codes/vector). Reports the
code-table row count (n × m slim int rows — what the query scan reads
instead of n × dim floats) alongside build+query wall time.

ivf: builds the index with n_lists='auto' (~sqrt(n)), persists it through
the ENGINE helper (persist_ivf_index: repartition by list_id before
partitionBy, so each list directory gets exactly one data file — the r10
probe's unrepartitioned write emitted 32 task-files into each of 1414
dirs), reloads with load_ivf_index, and times the indexed query path
min-of-2 — the sqrt(n) economics check. Reports total/max-per-dir file
counts as the small-files evidence. lsh: n_planes='auto' with 20 planted
bit-twin queries (recovery is exact at any plane count) — the occupancy
check.

``--dim`` sweeps the embedding width (768 = realistic sentence-embedding
width; stresses the centroid driver budget and Arrow matmul batch
economics).

Needs a fat local driver: the generated corpus is localCheckpointed
(2M × 64-dim ≈ 1 GB of storage memory; 2M × 768-dim ≈ 12 GB).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import similarity as SIM


def _gen(spark, n, dim, disk_dir=None):
    """Generated corpus. Default: localCheckpoint (RAM) — measures kernel
    cost with scans near-free. ``disk_dir``: write to parquet and read
    back instead — every scan then pays real IO + decode, modeling the
    cluster regime where the corpus lives on disk/object store (the
    regime the build-scan-economics A/Bs exist for; a RAM corpus makes
    the direct path's N re-scans artificially free)."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(F.col("id") * dim + j), F.lit(2001)) - 1000)
            .cast("double") / 1000.0
        ),
    )
    base = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    if disk_dir is None:
        return base.localCheckpoint(eager=True)
    base.write.mode("overwrite").parquet(disk_dir)
    return spark.read.parquet(disk_dir)


def _parquet_file_stats(root):
    total, per_dir = 0, []
    for d, _, files in os.walk(root):
        k = sum(1 for f in files if f.endswith(".parquet"))
        total += k
        if k:
            per_dir.append(k)
    return total, (max(per_dir) if per_dir else 0)


def _probed_rows(queries, shards, n_probe, scorer):
    """EXACT probed rows per query: replicate the query path's global
    probe selection (SIM._shard_probes + the identical ranking window)
    and join it to the REAL per-list occupancy of each shard's
    assignments — the read-volume number the sharded design bounds."""
    from pyspark.sql import Window

    q_slim = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).filter(F.col("qv").isNotNull())
    use = SIM.resolve_scorer(scorer, q_slim, "qv")
    probes = None
    occ = None
    for s, (cents, asg) in enumerate(shards):
        p = SIM._shard_probes(
            q_slim, cents, n_probe=n_probe, use=use, budget_check=False
        ).withColumn("shard", F.lit(s))
        o = (
            asg.filter(F.col("list_id").isNotNull())
            .groupBy("list_id").count().withColumn("shard", F.lit(s))
        )
        probes = p if probes is None else probes.unionByName(p)
        occ = o if occ is None else occ.unionByName(o)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("shard"), F.desc("list_id")
    )
    per_q = (
        probes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .join(occ, ["shard", "list_id"])
        .groupBy("query_id")
        .agg(F.sum("count").alias("rows"))
    )
    row = per_q.agg(F.avg("rows"), F.max("rows")).first()
    return float(row[0]), int(row[1])


def main() -> None:
    args = sys.argv[1:]
    dim = 64
    if "--dim" in args:
        i = args.index("--dim")
        dim = int(args[i + 1])
        del args[i : i + 2]
    scorer = "auto"
    if "--scorer" in args:
        i = args.index("--scorer")
        scorer = args[i + 1]
        del args[i : i + 2]
    shards_flag = "auto"
    if "--shards" in args:
        i = args.index("--shards")
        shards_flag = int(args[i + 1])
        del args[i : i + 2]
    mat_only = "--mat-only" in args
    if mat_only:
        args.remove("--mat-only")
    disk_corpus = "--disk-corpus" in args
    if disk_corpus:
        args.remove("--disk-corpus")
    mode = args[0] if args else "ivf"
    sizes = [int(a) for a in args[1:]] or [200_000, 2_000_000]
    mem = os.environ.get("ANN_PROBE_DRIVER_MEM", "16g")
    spark = get_spark(app_name=f"ann-scale-{mode}",
                      extra_conf={"spark.driver.memory": mem})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    out = []
    for n in sizes:
        corpus_dir = (
            tempfile.mkdtemp(prefix="ann_corpus_") if disk_corpus else None
        )
        emb = _gen(spark, n, dim, disk_dir=corpus_dir)
        if mode == "ivf":
            queries = emb.filter(F.col("vec_id") < 20)
            t0 = time.perf_counter()
            idx_built = SIM.build_ivf_index(emb, n_lists="auto")
            root = tempfile.mkdtemp(prefix="ivf_idx_")
            SIM.persist_ivf_index(idx_built, root, mode="overwrite")
            t_build = time.perf_counter() - t0
            n_files, max_per_dir = _parquet_file_stats(root + "/assignments")
            idx = SIM.load_ivf_index(spark, root)
            times = []
            for _ in range(2):
                t1 = time.perf_counter()
                rows = SIM.ivf_ann_topk(
                    queries, emb, k=5, n_probe=8, index=idx, scorer=scorer
                ).collect()
                times.append(time.perf_counter() - t1)
            out.append({"n": n, "dim": dim, "scorer": scorer,
                        "n_lists": idx[0].count(),
                        "build_persist_s": round(t_build, 1),
                        "query_indexed_s": round(min(times), 2),
                        "assign_files": n_files,
                        "max_files_per_list_dir": max_per_dir,
                        "topk_rows": len(rows)})
            shutil.rmtree(root, ignore_errors=True)
        elif mode == "sharded":
            queries = emb.filter(F.col("vec_id") < 20)
            rec = {"n": n, "dim": dim, "scorer": scorer}
            for label in ("flat", "sharded"):
                t0 = time.perf_counter()
                if label == "flat":
                    root = tempfile.mkdtemp(prefix="ivf_flat_")
                    SIM.persist_ivf_index(
                        SIM.build_ivf_index(emb, n_lists="auto"), root,
                        mode="overwrite",
                    )
                    t_build = time.perf_counter() - t0
                    shards = [SIM.load_ivf_index(spark, root)]
                else:
                    root = tempfile.mkdtemp(prefix="ivf_shard_")
                    SIM.persist_sharded_ivf_index(
                        SIM.build_sharded_ivf_index(
                            emb, n_shards=shards_flag, n_lists="auto"
                        ),
                        root, mode="overwrite",
                    )
                    t_build = time.perf_counter() - t0
                    shards = SIM.load_sharded_ivf_index(spark, root)
                times = []
                for _ in range(2):
                    t1 = time.perf_counter()
                    if label == "flat":
                        rows = SIM.ivf_ann_topk(
                            queries, emb, k=5, n_probe=8, index=shards[0],
                            scorer=scorer,
                        ).collect()
                    else:
                        rows = SIM.sharded_ivf_ann_topk(
                            queries, shards, k=5, n_probe=8, scorer=scorer
                        ).collect()
                    times.append(time.perf_counter() - t1)
                avg_pr, max_pr = _probed_rows(queries, shards, 8, scorer)
                rec[label] = {
                    "n_shards": len(shards),
                    "total_lists": sum(c.count() for c, _ in shards),
                    "build_persist_s": round(t_build, 1),
                    "query_s": round(min(times), 2),
                    "probed_rows_avg": round(avg_pr),
                    "probed_rows_max": max_pr,
                    "topk_rows": len(rows),
                }
                shutil.rmtree(root, ignore_errors=True)
            out.append(rec)
        elif mode == "amortize":
            rec = {"n": n, "dim": dim, "scorer": scorer}

            def _fingerprint(shards):
                # cheap persisted-tree identity: per-index row count +
                # order-free xor-ish sum of xxhash64(id, list_id)
                total, acc = 0, 0
                for cents, asg in shards:
                    r = asg.agg(
                        F.count(F.lit(1)).alias("c"),
                        # decimal sum: exact and overflow-proof under ANSI
                        F.sum(F.xxhash64("vec_id", "list_id").cast("decimal(38,0)")).alias("h"),
                    ).first()
                    total += r["c"]
                    acc ^= int(r["h"] or 0) & ((1 << 63) - 1)
                return total, acc

            def _timed_queries(shards, flat):
                res = {}
                for nq in (100, 1000):
                    queries = emb.filter(F.col("vec_id") < nq)
                    times = []
                    for _ in range(2):
                        t1 = time.perf_counter()
                        if flat:
                            rows = SIM.ivf_ann_topk(
                                queries, emb, k=5, n_probe=8,
                                index=shards[0], scorer=scorer,
                            ).collect()
                        else:
                            rows = SIM.sharded_ivf_ann_topk(
                                queries, shards, k=5, n_probe=8,
                                scorer=scorer,
                            ).collect()
                        times.append(time.perf_counter() - t1)
                    avg_pr, max_pr = _probed_rows(queries, shards, 8, scorer)
                    res[f"q{nq}"] = {
                        "batch_s": round(min(times), 2),
                        "per_query_ms": round(min(times) / nq * 1000, 1),
                        "probed_rows_avg": round(avg_pr),
                        "probed_rows_max": max_pr,
                        "topk_rows": len(rows),
                    }
                return res

            # flat reference: build once, query at both batch sizes
            t0 = time.perf_counter()
            froot = tempfile.mkdtemp(prefix="ivf_amz_flat_")
            SIM.persist_ivf_index(
                SIM.build_ivf_index(emb, n_lists="auto"), froot,
                mode="overwrite",
            )
            flat_build = round(time.perf_counter() - t0, 1)
            fshards = [SIM.load_ivf_index(spark, froot)]
            rec["flat"] = {"build_persist_s": flat_build,
                           **_timed_queries(fshards, flat=True)}
            shutil.rmtree(froot, ignore_errors=True)
            print(json.dumps({"partial": "flat", **rec}), flush=True)

            # sharded, direct N-scan build (the number to beat)
            t0 = time.perf_counter()
            droot = tempfile.mkdtemp(prefix="ivf_amz_dir_")
            SIM.persist_sharded_ivf_index(
                SIM.build_sharded_ivf_index(
                    emb, n_shards=shards_flag, n_lists="auto"
                ),
                droot, mode="overwrite",
            )
            direct_build = round(time.perf_counter() - t0, 1)
            dshards = SIM.load_sharded_ivf_index(spark, droot)
            d_fp = _fingerprint(dshards)
            n_sh = len(dshards)
            shutil.rmtree(droot, ignore_errors=True)
            print(json.dumps({"partial": "sharded_direct",
                              "build_persist_s": direct_build}), flush=True)

            # sharded, one-shuffle materialized split build
            scratch = tempfile.mkdtemp(prefix="ivf_amz_split_") + "/split"
            t0 = time.perf_counter()
            mroot = tempfile.mkdtemp(prefix="ivf_amz_mat_")
            SIM.persist_sharded_ivf_index(
                SIM.build_sharded_ivf_index(
                    emb, n_shards=shards_flag, n_lists="auto",
                    scratch_dir=scratch,
                ),
                mroot, mode="overwrite",
            )
            mat_build = round(time.perf_counter() - t0, 1)
            shutil.rmtree(os.path.dirname(scratch), ignore_errors=True)
            mshards = SIM.load_sharded_ivf_index(spark, mroot)
            m_fp = _fingerprint(mshards)
            rec["sharded"] = {
                "n_shards": n_sh,
                "build_direct_s": direct_build,
                "build_materialized_s": mat_build,
                "mat_vs_direct": round(mat_build / direct_build, 3),
                "fingerprint_match": d_fp == m_fp,
                **_timed_queries(mshards, flat=False),
            }
            shutil.rmtree(mroot, ignore_errors=True)
            out.append(rec)
        elif mode == "shardbuild":
            # build-economics A/B only (no flat reference, no queries):
            # direct N-scan sharded build vs the one-shuffle materialized
            # split, persisted through the engine helper both ways, with
            # a persisted-tree fingerprint when both sides run.
            rec = {"n": n, "dim": dim, "shards": shards_flag,
                   "corpus": "disk" if disk_corpus else "ram"}

            def _fp(shards):
                total, acc = 0, 0
                for _c, asg in shards:
                    r = asg.agg(
                        F.count(F.lit(1)).alias("c"),
                        F.sum(F.xxhash64("vec_id", "list_id").cast("decimal(38,0)")).alias("h"),
                    ).first()
                    total += r["c"]
                    acc ^= int(r["h"] or 0) & ((1 << 63) - 1)
                return total, acc

            d_fp = None
            if not mat_only:
                t0 = time.perf_counter()
                droot = tempfile.mkdtemp(prefix="ivf_sb_dir_")
                SIM.persist_sharded_ivf_index(
                    SIM.build_sharded_ivf_index(
                        emb, n_shards=shards_flag, n_lists="auto"
                    ),
                    droot, mode="overwrite",
                )
                rec["build_direct_s"] = round(time.perf_counter() - t0, 1)
                d_fp = _fp(SIM.load_sharded_ivf_index(spark, droot))
                shutil.rmtree(droot, ignore_errors=True)
                print(json.dumps({"partial": "direct", **rec}), flush=True)
            scratch = tempfile.mkdtemp(prefix="ivf_sb_split_") + "/split"
            t0 = time.perf_counter()
            mroot = tempfile.mkdtemp(prefix="ivf_sb_mat_")
            SIM.persist_sharded_ivf_index(
                SIM.build_sharded_ivf_index(
                    emb, n_shards=shards_flag, n_lists="auto",
                    scratch_dir=scratch,
                ),
                mroot, mode="overwrite",
            )
            rec["build_materialized_s"] = round(time.perf_counter() - t0, 1)
            sp_files, sp_max = _parquet_file_stats(scratch)
            rec["split_files"] = sp_files
            rec["split_max_per_dir"] = sp_max
            shutil.rmtree(os.path.dirname(scratch), ignore_errors=True)
            m_fp = _fp(SIM.load_sharded_ivf_index(spark, mroot))
            if d_fp is not None:
                rec["mat_vs_direct"] = round(
                    rec["build_materialized_s"] / rec["build_direct_s"], 3
                )
                rec["fingerprint_match"] = d_fp == m_fp
            shutil.rmtree(mroot, ignore_errors=True)
            out.append(rec)
        elif mode == "append":
            # the O(batch)-vs-O(corpus) maintenance claim, measured: build
            # + persist the corpus index once (the rebuild cost a daily
            # increment would otherwise pay), then append a 10% increment
            # through append_to_ivf_index and time it — plus the compact
            # pass and the indexed query over the grown index.
            import shutil as _sh

            t0 = time.perf_counter()
            root = tempfile.mkdtemp(prefix="ivf_append_")
            SIM.persist_ivf_index(
                SIM.build_ivf_index(emb, n_lists="auto"), root,
                mode="overwrite",
            )
            t_build = time.perf_counter() - t0
            n_inc = max(1, n // 10)
            inc = _gen(spark, n_inc, dim).select(
                (F.col("vec_id") + 2 * n).alias("vec_id"), "embedding"
            )
            t1 = time.perf_counter()
            appended = SIM.append_to_ivf_index(spark, root, inc)
            t_append = time.perf_counter() - t1
            t2 = time.perf_counter()
            SIM.compact_ivf_index(spark, root)
            t_compact = time.perf_counter() - t2
            idx = SIM.load_ivf_index(spark, root)
            queries = emb.filter(F.col("vec_id") < 20)
            times = []
            for _ in range(2):
                t3 = time.perf_counter()
                rows = SIM.ivf_ann_topk(
                    queries, emb, k=5, n_probe=8, index=idx, scorer=scorer
                ).collect()
                times.append(time.perf_counter() - t3)
            out.append({"n": n, "dim": dim, "increment": appended,
                        "build_persist_s": round(t_build, 1),
                        "append_s": round(t_append, 1),
                        "append_vs_rebuild": round(t_append / t_build, 3),
                        "compact_s": round(t_compact, 1),
                        "query_after_append_s": round(min(times), 2),
                        "topk_rows": len(rows)})
            _sh.rmtree(root, ignore_errors=True)
        elif mode == "pq":
            queries = emb.filter(F.col("vec_id") < 20)
            m_auto = SIM.auto_pq_m(dim)
            t0 = time.perf_counter()
            rows = SIM.pq_ann_topk(
                queries, emb, k_neighbors=5, m="auto"
            ).collect()
            t_total = time.perf_counter() - t0
            out.append({"n": n, "dim": dim, "m_auto": m_auto,
                        "code_rows": n * m_auto,
                        "build_query_s": round(t_total, 1),
                        "topk_rows": len(rows)})
        elif mode == "ivfpq":
            # probe-BYTES economics (SCALE.md r14): flat IVF carries full
            # float vectors through the probe join; IVF-PQ carries m int
            # codes. Bytes are measured from the PERSISTED trees' parquet
            # column-chunk metadata (pyarrow) — the exact on-disk bytes a
            # probed list's scan pays per column, not an estimate.
            import pyarrow.parquet as papq

            def col_bytes_per_dir(tree, col):
                per_dir = []
                for d, _, files in os.walk(tree):
                    b = 0
                    for f in files:
                        if not f.endswith(".parquet"):
                            continue
                        md = papq.ParquetFile(os.path.join(d, f)).metadata
                        for rg in range(md.num_row_groups):
                            g = md.row_group(rg)
                            for ci in range(g.num_columns):
                                c = g.column(ci)
                                if c.path_in_schema.split(".")[0] == col:
                                    b += c.total_compressed_size
                    if b:
                        per_dir.append(b)
                return (sum(per_dir) / len(per_dir)) if per_dir else 0.0

            queries = emb.filter(F.col("vec_id") < 100)
            n_probe = 8
            m_auto = SIM.auto_pq_m(dim)
            rec = {"n": n, "dim": dim, "m_auto": m_auto, "scorer": scorer,
                   "n_probe": n_probe}

            t0 = time.perf_counter()
            ivf_root = tempfile.mkdtemp(prefix="ivf_ref_")
            SIM.persist_ivf_index(
                SIM.build_ivf_index(emb, n_lists="auto"), ivf_root,
                mode="overwrite",
            )
            rec["ivf_build_persist_s"] = round(time.perf_counter() - t0, 1)
            idx = SIM.load_ivf_index(spark, ivf_root)
            rec["n_lists"] = idx[0].count()
            times = []
            for _ in range(2):
                t1 = time.perf_counter()
                SIM.ivf_ann_topk(
                    queries, emb, k=5, n_probe=n_probe, index=idx,
                    scorer=scorer,
                ).collect()
                times.append(time.perf_counter() - t1)
            rec["ivf_query_s"] = round(min(times), 2)
            vec_b = col_bytes_per_dir(f"{ivf_root}/assignments", "embedding")
            rec["ivf_probe_bytes_per_query"] = int(vec_b * n_probe)
            shutil.rmtree(ivf_root, ignore_errors=True)
            print(json.dumps({"partial": "ivf_ref", **rec}), flush=True)

            t0 = time.perf_counter()
            pq_root = tempfile.mkdtemp(prefix="ivfpq_idx_")
            SIM.persist_ivfpq_index(
                SIM.build_ivfpq_index(emb, n_lists="auto", m="auto", pq_k=16),
                pq_root, m=m_auto, pq_k=16, mode="overwrite",
            )
            rec["ivfpq_build_persist_s"] = round(time.perf_counter() - t0, 1)
            pidx, params = SIM.load_ivfpq_index(spark, pq_root)
            for label, kwargs in (
                ("adc", {}), ("rerank", {"rerank": 20}),
            ):
                times = []
                for _ in range(2):
                    t1 = time.perf_counter()
                    SIM.ivfpq_ann_topk(
                        queries, pidx, k=5, n_probe=n_probe, scorer=scorer,
                        **kwargs, **params,
                    ).collect()
                    times.append(time.perf_counter() - t1)
                rec[f"ivfpq_query_{label}_s"] = round(min(times), 2)
            code_b = col_bytes_per_dir(f"{pq_root}/entries", "codes")
            rec["ivfpq_adc_probe_bytes_per_query"] = int(code_b * n_probe)
            rec["probe_bytes_cut"] = round(
                rec["ivf_probe_bytes_per_query"]
                / max(rec["ivfpq_adc_probe_bytes_per_query"], 1), 1,
            )
            # twin sanity: the composed path still recovers exact copies
            twins = emb.filter(F.col("vec_id") < 20).select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
            hits = SIM.ivfpq_ann_topk(
                twins, pidx, k=1, n_probe=1, rerank=8, scorer=scorer, **params
            ).collect()
            rec["twins_recovered"] = "%d/20" % sum(
                1 for r in hits
                if r["rank"] == 1
                and r["neighbor_id"] == r["query_id"] - 10_000_000
            )
            shutil.rmtree(pq_root, ignore_errors=True)
            out.append(rec)
        elif mode == "pqassign":
            # HOF-vs-Arrow assign kernel A/B (SCALE.md r14): time the
            # corpus-encode pass — the dominant big-build cost at high
            # dim — against ONE frozen codebook, both kernels in the
            # same process over the SAME localCheckpointed slices (the
            # slice/explode cost is identical by construction, so the
            # delta is purely the argmin execution strategy). Checksums
            # over (code, d2) are the at-scale parity evidence the
            # pq_ann_arrow face pins at sf-scale.
            m_auto = SIM.auto_pq_m(dim)
            cents, _ = SIM.pq_index(emb, m="auto", lloyd_iters=0)
            cents = cents.localCheckpoint(eager=True)
            slices = SIM._pq_subslices(
                emb, "vec_id", "embedding", m_auto, 20, "cid"
            ).localCheckpoint(eager=True)
            rec = {"n": n, "dim": dim, "m_auto": m_auto,
                   "slice_rows": n * m_auto}
            for kernel in ("hof", "arrow"):
                times = []
                sums = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    row = (
                        SIM._pq_assign(slices, cents, "cid", kernel=kernel)
                        .agg(
                            F.sum("code").alias("sc"),
                            # d2 ~ dim * 2^(2*scale_bits) per row at raw
                            # (unnormalized) value scale — a plain sum
                            # overflows BIGINT past ~10k rows at 768-dim,
                            # so the parity checksum folds mod 2^31 first
                            F.sum(F.col("d2") % F.lit(1 << 31)).alias("sd"),
                            F.count(F.lit(1)).alias("cnt"),
                        )
                        .collect()[0]
                    )
                    times.append(time.perf_counter() - t0)
                    sums = (row["sc"], row["sd"], row["cnt"])
                rec[f"assign_{kernel}_s"] = round(min(times), 1)
                rec[f"checksum_{kernel}"] = list(sums)
                print(json.dumps({"partial": kernel, **rec}), flush=True)
            rec["kernel_speedup"] = round(
                rec["assign_hof_s"] / max(rec["assign_arrow_s"], 1e-9), 1
            )
            rec["checksums_match"] = (
                rec["checksum_hof"] == rec["checksum_arrow"]
            )
            out.append(rec)
        elif mode == "skewknee":
            # the rebuild-trigger evidence (SCALE.md r14): drift a frozen-
            # centroid index with a tight cluster in steps, measure skew vs
            # HOT-QUERY probed rows + latency at each step, then rebuild
            # and measure the recovered numbers. Hot queries are drawn
            # from the drift cluster — they probe the hot list, which is
            # where degradation physically lives (base queries ride along
            # as the control).
            root = tempfile.mkdtemp(prefix="skewknee_")
            t0 = time.perf_counter()
            SIM.persist_ivf_index(
                SIM.build_ivf_index(emb, n_lists="auto"), root,
                mode="overwrite",
            )
            t_build = time.perf_counter() - t0
            idx = SIM.load_ivf_index(spark, root)
            n_lists = idx[0].count()
            avg_occ = n / n_lists
            n_probe = 8

            def cluster(n_rows, id0):
                jit = F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: F.lit(0.5)
                    + (F.pmod(F.xxhash64(F.col("vec_id") * dim + j),
                              F.lit(2001)) - 1000).cast("double")
                    / 1000.0 * 0.15,
                )
                return spark.range(n_rows).select(
                    (F.col("id") + id0).alias("vec_id")
                ).select("vec_id", jit.alias("embedding"))

            hot_q = cluster(50, 900_000_000)
            base_q = emb.filter(F.col("vec_id") < 50)

            def measure(tag, extra):
                cur = SIM.load_ivf_index(spark, root)
                stats = SIM.ivf_index_stats(cur[1]).first()
                rec = {"step": tag, "n": n, "dim": dim,
                       "skew": stats["skew"],
                       "max_occ": stats["max_occupancy"], **extra}
                for label, qs in (("hot", hot_q), ("base", base_q)):
                    avg_pr, max_pr = _probed_rows(qs, [cur], n_probe, scorer)
                    times = []
                    for _ in range(2):
                        t1 = time.perf_counter()
                        SIM.ivf_ann_topk(
                            qs, emb, k=5, n_probe=n_probe, index=cur,
                            scorer=scorer,
                        ).collect()
                        times.append(time.perf_counter() - t1)
                    rec[f"{label}_probed_rows"] = round(avg_pr)
                    rec[f"{label}_query_s"] = round(min(times), 2)
                print(json.dumps(rec), flush=True)
                return rec

            recs = [measure("baseline", {"build_s": round(t_build, 1)})]
            grown = 0
            for i, mult in enumerate((1, 2, 4, 8, 16, 32)):
                inc = int(avg_occ * mult) - grown
                grown += inc
                SIM.append_to_ivf_index(
                    spark, root, cluster(inc, 800_000_000 + i * 10_000_000)
                )
                recs.append(measure(f"drift_{mult}x_avg", {"appended": grown}))
            # the cure: rebuild from the grown index's own stored vectors
            t0 = time.perf_counter()
            SIM.apply_maintenance_plan(
                spark, root, skew_threshold=4.0, min_rows_for_rebuild=10,
                max_files_per_dir=10_000,
            )
            recs.append(measure("rebuilt", {
                "rebuild_s": round(time.perf_counter() - t0, 1)
            }))
            out.append({"mode": "skewknee", "n": n, "steps": recs})
            shutil.rmtree(root, ignore_errors=True)
        else:
            twins = emb.filter(F.col("vec_id") < 20).select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
            times, rows = [], []
            for _ in range(2):
                t1 = time.perf_counter()
                rows = SIM.lsh_ann_topk(
                    twins, emb, k=1, n_planes="auto", n_tables=4,
                    scorer=scorer,
                ).collect()
                times.append(time.perf_counter() - t1)
            ok = sum(
                1 for r in rows
                if r["rank"] == 1
                and r["neighbor_id"] == r["query_id"] - 10_000_000
            )
            out.append({"n": n, "auto_planes": SIM.auto_planes(n),
                        "lsh_query_s": round(min(times), 2),
                        "twins_recovered": f"{ok}/20"})
        print(json.dumps(out[-1]), flush=True)
        if corpus_dir:
            shutil.rmtree(corpus_dir, ignore_errors=True)
    if len(out) >= 2 and mode in ("ivf", "lsh"):
        a, b = out[0], out[-1]
        key = "query_indexed_s" if mode == "ivf" else "lsh_query_s"
        print(json.dumps({
            "metric": f"{mode}_auto_scale",
            "query_growth": round(max(b[key], 0.01) / max(a[key], 0.01), 2),
            "decades": round(math.log10(b["n"] / a["n"]), 1),
        }))


if __name__ == "__main__":
    main()
