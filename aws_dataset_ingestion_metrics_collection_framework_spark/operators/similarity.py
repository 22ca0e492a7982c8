"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast nested-loop join with the
dot product computed JVM-side via ``zip_with``/``aggregate`` (no Python in
the loop). Scale path: random-hyperplane LSH bucketing (shuffle-partitioned
candidate generation), the classic recall/cost trade.

At 100 TB the corpus side stays partitioned; only the (small) query set is
broadcast — Catalyst turns the crossJoin+filter into BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import math
import random
import re
import weakref

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Row, SparkSession, Window, functions as F
from pyspark.sql import types as T
from pyspark.sql.types import StringType

from ..sources import fsio


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Queries are broadcast
    (small side); the corpus scan is a single pass, no shuffle until the
    per-query top-k aggregation."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_literals(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def auto_planes(count: int) -> int:
    """Plane count pinning expected LSH bucket occupancy near 16 for a
    ``count``-row corpus: ceil(log2(count/16)), clamped to [8, 24]. A
    FIXED plane count leaves within-bucket verification growing
    ~n²/2^planes per table — measured 28× for 10× data at 200k vectors
    under the default 8 planes (SCALE.md r9e); occupancy-pinned planes
    keep candidate volume O(n·occupancy) at any corpus size."""
    return min(24, max(8, (max(int(count), 1) * 2 - 1).bit_length() - 5))


def random_hyperplane_bucket(vec: Column, *, n_planes: int = 8, seed: int = 7, dim: int = 64) -> Column:
    """LSH bucket id = sign-bit string of ``n_planes`` random projections.
    Plane vectors are deterministic literals (no data pass needed).

    NOTE: literal planes inflate the query plan by n_planes × dim nodes —
    fine for one table, but multi-table bucketing should use
    ``bucketize_tables`` (planes live in the Arrow UDF closure, O(1) plan
    size), which cut the 16-table plan's analysis/codegen time ~4×."""
    planes = _plane_literals(dim, n_planes, seed)
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _bucket_batch_udf(n_tables: int, n_planes: int, seed: int):
    """Vectorized multi-table LSH bucketing: ONE BLAS matmul per Arrow batch.

    Why a pandas_udf here, in an engine that otherwise keeps the UDF surface
    at zero: multi-table bucketing is a dense (batch × dim) @ (dim ×
    n_tables·n_planes) matrix product. Expressed with built-in HOFs
    (``aggregate``/``zip_with`` per plane per table) it runs interpreted —
    measured ~1.6M lambda invocations for 250 vectors × 16 tables × 2
    planes × 64 dims, ≈3 s of pure expression-eval overhead that scales
    linearly with corpus size. The Arrow path does the same arithmetic as
    one numpy matmul per batch (map-only, no shuffle, plan size O(1)) —
    the documented built-ins-can't-express-this exception alongside the
    multimodal decoders."""
    # Planes are generated lazily from the OBSERVED vector dimension (and
    # cached per dim) — deterministic for a given (seed, dim), so every
    # batch/task/retry derives the identical matrix, and the operator works
    # for any embedding width without a dim annotation (empty batches
    # return an empty Series, no planes needed).
    plane_cache: dict[int, np.ndarray] = {}

    def _planes_for(d: int) -> np.ndarray:
        P = plane_cache.get(d)
        if P is None:
            tbls = [_plane_literals(d, n_planes, seed + 1000 * t) for t in range(n_tables)]
            P = np.asarray([p for tbl in tbls for p in tbl], dtype=np.float64)
            plane_cache[d] = P
        return P

    @F.pandas_udf("array<string>")
    def buckets(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype=object)
        # null/ragged contract (same degrade as build_ivf_index and the
        # pair scorer): a null vector gets a NULL bucket array — the
        # downstream posexplode emits no rows, so the document simply
        # doesn't participate in LSH — instead of np.vstack raising and
        # failing the whole job on one malformed row. Mixed widths are
        # each hashed with their own dim's plane matrix (deterministic
        # per (seed, dim)), one matmul per width group.
        out = [None] * n
        dims = np.fromiter(
            (len(x) if x is not None else -1 for x in v), dtype=np.int64, count=n
        )
        for d in np.unique(dims[dims >= 0]):
            sel = np.flatnonzero(dims == d)
            M = np.array([v.iloc[i] for i in sel], dtype=np.float64)  # (k, d)
            S = (M @ _planes_for(int(d)).T) >= 0.0  # (k, T*np) sign bits
            for idx, row in zip(sel, S):
                out[idx] = [
                    "".join("1" if row[t * n_planes + i] else "0" for i in range(n_planes))
                    for t in range(n_tables)
                ]
        return pd.Series(out)

    return buckets


# Above this vector width the ANN query paths score candidates with the
# Arrow pair-cosine kernel instead of the built-in HOF expression. The HOF
# cosine (zip_with dot + two aggregate norms) evaluates ~3 lambda steps
# PER ELEMENT per candidate row — CPU linear in dim × candidates — where
# the Arrow kernel is one fused numpy pass per batch. Measured on the
# indexed IVF probe at 768-dim (min-of-2, SCALE.md r11): 2M vectors
# 7.05 s → 5.61 s on 32 cores (1.26×), 200k on a CPU-constrained 8-core
# run 4.68 s → 3.21 s (1.46×) — the gap grows with candidate volume and
# core pressure (at 100 TB cores are the budget), while fixed per-query
# costs dominate small probes.
# Below the cutover the HOF path stays: it is fast at narrow widths AND
# its left-to-right float summation is bit-identical to the SQL oracles
# (the Arrow kernel's pairwise/SIMD summation is mathematically the same
# cosine but not bit-equal, so hash-pinned low-dim queries must keep the
# HOF scorer).
ARROW_SCORER_MIN_DIM = 128


def _pair_cosine_udf():
    """Arrow-vectorized pairwise cosine over two row-aligned vector
    columns: one fused numpy pass per batch (same justification as
    ``_bucket_batch_udf`` — a per-element interpreted HOF is the slow
    path at realistic embedding widths). Null or length-mismatched pairs
    degrade to null, mirroring the HOF scorer's null semantics."""

    @F.pandas_udf("double")
    def pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        if n == 0:
            return pd.Series([], dtype="float64")
        out = np.full(n, np.nan)
        dims = np.fromiter(
            (
                len(x) if (x is not None and y is not None and len(x) == len(y))
                else -1
                for x, y in zip(a, b)
            ),
            dtype=np.int64,
            count=n,
        )
        for d in np.unique(dims[dims >= 0]):
            sel = dims == d
            A = np.array([x for x, s in zip(a, sel) if s], dtype="float64")
            B = np.array([y for y, s in zip(b, sel) if s], dtype="float64")
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            den[den == 0] = np.nan
            out[sel] = num / den
        return pd.Series(out)

    return pair_cos


def resolve_scorer(scorer: str, queries: DataFrame, vec_col: str) -> str:
    """'auto' → 'arrow' iff the observed vector width is at or above
    ARROW_SCORER_MIN_DIM; explicit 'hof'/'arrow' pass through.

    The width probe is one short-circuiting first() job over the FIRST
    NON-NULL vector — a leading null row must not silently resolve a
    768-dim corpus to the interpreted HOF path (size(null) is null).
    Mixed-width batches resolve from that first well-formed row; pass an
    explicit scorer when widths genuinely vary. (Deliberate: probing
    max(size(vec)) instead would turn the short-circuiting first() into
    a full-scan aggregate per query call, and both scorers are CORRECT
    at every width — cross-width pairs are dropped by the callers — so
    a mixed batch only makes the speed cutover arbitrary, never the
    results wrong.) Public contract — the
    near-dup family in operators/dedup.py resolves through this too."""
    if scorer == "auto":
        row = (
            queries.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)))
            .first()
        )
        dim = row[0] if row is not None else 0
        return "arrow" if (dim or 0) >= ARROW_SCORER_MIN_DIM else "hof"
    if scorer not in ("hof", "arrow"):
        raise ValueError(f"scorer must be 'auto'|'hof'|'arrow', got {scorer!r}")
    return scorer


def cosine_score_col(scorer: str, a: str = "qv", b: str = "cv") -> Column:
    """The candidate-scoring column for a resolved scorer, over the
    given pair columns. Public contract (see :func:`resolve_scorer`)."""
    if scorer == "arrow":
        return _pair_cosine_udf()(F.col(a), F.col(b))
    return cosine_similarity(F.col(a), F.col(b))


def bucketize_tables(
    df: DataFrame,
    *,
    id_col: str,
    id_name: str,
    vec_col: str,
    keep_vec: str | None = None,
    n_tables: int,
    n_planes: int,
    seed: int = 7,
) -> DataFrame:
    """(id, tbl, bucket) rows: one per input row per LSH table, bucket =
    sign-bit string of that table's random-hyperplane projections.

    Map-only: the batch matmul UDF emits all n_tables buckets per row in one
    pass (``posexplode`` fans them out JVM-side); only slim (id, tbl,
    bucket) rows leave the stage unless ``keep_vec`` asks for the vector to
    ride along (query-side of ANN joins). Plane matrices live in the UDF
    closure (n_tables × n_planes × dim doubles — a few KB shipped once per
    task), never in the plan."""
    udf = _bucket_batch_udf(n_tables, n_planes, seed)
    cols = [F.col(id_col).alias(id_name)]
    if keep_vec:
        cols.append(F.col(vec_col).alias(keep_vec))
    return df.select(*cols, udf(F.col(vec_col)).alias("_buckets")).select(
        id_name,
        *([keep_vec] if keep_vec else []),
        F.posexplode(F.col("_buckets")).alias("tbl", "bucket"),
    )


# Default budget for the driver-side centroid matrix (n_lists × dim × 8 B
# float64).  build_ivf_index materializes the centroids on the driver once
# per Lloyd step (the Arrow assign matmul ships them in the UDF closure), so
# this product is driver memory, not executor memory: at the 'auto' sizing
# n_lists ≈ √n, an n = 10¹¹ corpus at dim 4096 would want √n·dim·8 ≈ 10 GB —
# far past what a driver should hold for ONE operator.  256 MiB covers every
# sane single-level IVF (4096 lists × 8192-dim float64 = 256 MiB exactly);
# beyond it, don't raise the budget — cap n_lists and accept more vectors
# per list, or train a two-level coarse quantizer on a sample and re-shard
# (out of this operator's scope, documented in build_ivf_index).
IVF_CENTROID_BUDGET_BYTES = 256 << 20

# r15 (guide §1.2, same precedent as _PQ_SHAPE_MEMO): the ANN contract faces
# run several assign/probe calls against the SAME pinned centroid table, and
# each call re-collected it as its own one-job probe (census: 12 collects at
# _assign_to_lists per ivf_index_maintenance run). A DataFrame is an
# immutable plan, so object identity implies identical rows; distinct
# objects miss and recompute — never a stale/wrong matrix. Values memoized
# AFTER normalization and are never mutated by the consumers.
_CENTROID_MATRIX_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _centroid_matrix(cents: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(list_ids, row-normalized centroid matrix) for the numpy assign
    kernel — collected once per centroid-table OBJECT per run."""
    try:
        hit = _CENTROID_MATRIX_MEMO.get(cents)
    except TypeError:  # unhashable/unweakrefable wrapper: just compute
        hit = None
    if hit is not None:
        return hit
    rows = cents.orderBy("list_id").collect()
    lids = np.array([r["list_id"] for r in rows], dtype="int64")
    mat = np.array([r["centroid"] for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cn = mat / norms[:, None]
    val = (lids, cn)
    try:
        _CENTROID_MATRIX_MEMO[cents] = val
    except TypeError:
        pass
    return val


def _assign_to_lists(c: DataFrame, cents: DataFrame) -> DataFrame:
    """The IVF assign kernel, shared by :func:`build_ivf_index` and
    :func:`append_to_ivf_index` (append parity with the build is BY
    CONSTRUCTION — same collect, same matmul, same tie order).

    ``c`` carries (cid, v array<double>); returns ``c`` + ``list_id``.

    The assign pass is O(corpus × n_lists × dim) multiply-adds —
    at the 'auto' sqrt(n) list count the interpreted-HOF argmax
    formulation becomes the index-build bottleneck (measured: DNF
    in 10 min at 200k × 447 lists). Same cure as bucketize_tables:
    ONE Arrow-batched BLAS matmul per batch, centroids shipped once
    in the UDF closure (≤4096 × 64 doubles ≈ 2 MB — bounded by the
    same clamp that bounds the broadcast row). Map-only, zero
    shuffle. Ties break toward the LARGEST list_id — parity with
    the struct-max the HOF formulation used."""
    lids, cn = _centroid_matrix(cents)

    dim = cn.shape[1]

    @F.pandas_udf("int")
    def best_list(vs: pd.Series) -> pd.Series:
        # null/ragged guard: a malformed embedding row (null, or a
        # dimension that disagrees with the centroids) degrades to a
        # null list_id — the same never-probed fate the pre-matmul
        # HOF argmax gave it — instead of a ValueError in np.array()
        # failing the whole assign job
        mask = np.fromiter(
            (v is not None and len(v) == dim for v in vs),
            dtype=bool,
            count=len(vs),
        )
        out = pd.array([None] * len(vs), dtype="Int32")
        if mask.any():
            V = np.array([v for v, m in zip(vs, mask) if m], dtype="float64")
            vn = np.linalg.norm(V, axis=1)
            vn[vn == 0] = 1.0
            sims = (V / vn[:, None]) @ cn.T
            idx = sims.shape[1] - 1 - np.argmax(sims[:, ::-1], axis=1)
            out[mask] = lids[idx].astype("int32")
        return pd.Series(out)

    return c.withColumn("list_id", best_list(F.col("v")))


def build_ivf_index(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | str = 16,
    kmeans_iters: int = 1,
    centroid_budget_bytes: int = IVF_CENTROID_BUDGET_BYTES,
    hash_fn: str = "xx",
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: partition the corpus into ``n_lists``
    Voronoi cells around centroids; ANN then probes only the nearest cells.

    ``hash_fn``: the seed-selection hash — ``'xx'`` (xxhash64, default)
    or ``'md5'`` (the PQ family's 60-bit md5 prefix, replayable in plain
    SQL — what :func:`build_ivfpq_index`'s hash-exact oracle face uses;
    see :func:`_pq_hash`). Identical semantics either way: a uniform
    pseudo-random sample keyed on the id.

    Returns ``(centroids, assignments)``:
    - centroids   : (list_id int, centroid array<double>)
    - assignments : (corpus_id, vec, list_id)

    Centroid seeding is deterministic (the ``n_lists`` corpus vectors with the
    smallest ``xxhash64(id)`` — a uniform pseudo-random sample with no data-
    dependent ordering), refined by ``kmeans_iters`` Lloyd steps implemented
    entirely as DataFrame ops: assign = argmax cosine against broadcast
    centroids (one map-side pass over the corpus); update = per-(list,
    position) mean via ``posexplode`` + groupBy — shuffle volume is
    O(corpus × dim) numbers, the classic distributed k-means shape.

    LIST COUNT MUST SCALE WITH THE CORPUS: probing n_probe of n_lists
    cells reads ~n·n_probe/n_lists vectors per query, so a fixed 16 lists
    means every query scans a fixed FRACTION of the corpus — linear
    per-query cost. ``n_lists='auto'`` applies the standard IVF sizing,
    ~sqrt(corpus), clamped to [16, 4096] (4096 × 64-dim doubles ≈ 2 MB —
    the broadcast centroid row stays sane; beyond 4096 lists, train on a
    sample and re-shard, which is out of this operator's scope). One
    count job.

    DRIVER MEMORY BOUND: the centroid matrix (``n_lists × dim × 8`` bytes
    of float64) is collected to the driver once per Lloyd step and shipped
    in the Arrow assign UDF closure. That product is checked against
    ``centroid_budget_bytes`` (default 256 MiB) BEFORE the first collect
    and the build fails loudly when it would exceed it — a silent 10 GB
    driver materialization (n = 10¹¹ at 'auto' sizing with dim = 4096) is
    exactly the failure mode this guards. If you hit the guard: cap
    ``n_lists`` (more vectors per list — probe cost grows linearly in
    list occupancy, still far from brute force), or split the corpus into
    shards each with its own in-budget index (the two-level / coarse-
    quantizer upgrade path: train the splitter on a sample, route each
    shard's queries to its index, merge top-k). Raising
    ``centroid_budget_bytes`` is for drivers that genuinely have the
    headroom, not the default answer.
    """
    if n_lists == "auto":
        n_lists = min(4096, max(16, math.isqrt(corpus.count())))
    elif not isinstance(n_lists, int):
        raise ValueError(f"n_lists must be an int or 'auto', got {n_lists!r}")
    c = corpus.select(F.col(corpus_id).alias("cid"), F.col(vec_col).cast("array<double>").alias("v"))
    # null/ragged contract: malformed vectors (null, or a dimension that
    # disagrees with the corpus) are excluded from seeding and centroid
    # updates and assign to a NULL list_id — degraded, never a crash.
    # The reference dimension is the first non-null row's (one
    # short-circuiting job); a corpus whose vectors genuinely disagree in
    # dim is caught here rather than as a numpy shape error mid-build.
    first = c.filter(F.col("v").isNotNull()).select(F.size("v")).first()
    if first is None:
        raise ValueError("build_ivf_index: corpus has no non-null vectors")
    ref_dim = first[0]
    est_bytes = n_lists * ref_dim * 8
    if est_bytes > centroid_budget_bytes:
        raise ValueError(
            f"build_ivf_index: centroid matrix would be n_lists({n_lists}) × "
            f"dim({ref_dim}) × 8 B = {est_bytes / (1 << 20):.0f} MiB on the "
            f"DRIVER, over the {centroid_budget_bytes / (1 << 20):.0f} MiB "
            "budget. Cap n_lists (more vectors per probed list), shard the "
            "corpus into per-shard in-budget indexes (two-level coarse-"
            "quantizer path — see the docstring), or pass a larger "
            "centroid_budget_bytes if the driver genuinely has the headroom."
        )
    well_formed = c.filter(
        F.col("v").isNotNull() & (F.size("v") == ref_dim)
    )
    seeds = (
        well_formed.withColumn("_h", _pq_hash(hash_fn, F.col("cid")))
        .orderBy("_h", "cid")
        .limit(n_lists)
        .withColumn(
            "list_id",
            (F.row_number().over(Window.orderBy("_h", "cid")) - 1).cast("int"),
        )
        .select("list_id", F.col("v").alias("centroid"))
    )
    centroids = seeds

    def assign(cents: DataFrame) -> DataFrame:
        return _assign_to_lists(c, cents)

    assignments = assign(centroids)
    for _ in range(kmeans_iters):
        updated = (
            assignments.filter(F.col("list_id").isNotNull())  # null/ragged
            .select("list_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
        centroids = updated
        assignments = assign(centroids)
    return centroids, assignments.select(
        F.col("cid").alias(corpus_id), F.col("v").alias(vec_col), "list_id"
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int | str = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
    index: tuple[DataFrame, DataFrame] | None = None,
    broadcast_queries: bool = True,
    scorer: str = "auto",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest inverted lists
    per query, exact cosine within the probed lists only.

    Expected cost ≈ (n_probe / n_lists) of brute force; recall rises with
    n_probe (n_probe = n_lists degenerates to exact search). The list join is
    a shuffle-partitioned equi-join on list_id — no cross join — and the
    centroid table rides a broadcast one-row array (plan size stays O(1)
    however large n_lists × dim grows). ``n_lists='auto'`` = ~sqrt(corpus)
    (see :func:`build_ivf_index`): with a FIXED list count every query
    scans a fixed fraction of the corpus; with sqrt sizing the probed
    volume per query is ~n_probe·sqrt(n).

    ``index``: a prebuilt ``(centroids, assignments)`` pair — THE way to
    query at scale. Without it, every call re-derives the index from
    ``corpus``, and because ``assignments`` is unmaterialized lineage the
    candidate join re-runs the Arrow assign matmul over the FULL corpus
    per action (measured: ~30 s of the 42 s query phase at 2M × 64-dim —
    SCALE.md r10). Build once with :func:`build_ivf_index`, persist
    ``assignments`` (parquet partitioned by ``list_id``, so probes prune
    partitions; or cache for a session), and pass the pair here: the
    per-query-batch cost is then ~n_probe · corpus/n_lists rows read —
    the √n economics IVF exists for. ``n_lists``/``kmeans_iters`` are
    ignored when ``index`` is given; ``assignments`` must carry
    (corpus_id, vec_col, list_id) and ``centroids`` (list_id, centroid).
    Use :func:`persist_ivf_index` / :func:`load_ivf_index` for the
    small-files-safe on-disk layout.

    SMALL-QUERY CONTRACT: ``queries`` is broadcast (×n_probe fan-out) —
    it must be a query BATCH that fits driver/executor broadcast memory
    (rule of thumb ≤ ~1M rows at 64-dim; scale the bound inversely with
    dim). The hint is deliberate: Catalyst's static size estimate of the
    corpus branch (array columns behind an Arrow projection) can be ~64×
    low and silently broadcast the CORPUS instead — measured OOM at 200k
    × 64-dim (r10). For a corpus-sized probe set pass
    ``broadcast_queries=False`` to fall back to a shuffle join (or use
    ``embedding_near_dup_pairs``, built for corpus × corpus).

    ``scorer``: ``'auto'`` (default) scores candidates with the built-in
    HOF cosine below ARROW_SCORER_MIN_DIM and the Arrow pair-cosine
    kernel at or above it (one tiny dim-probe job). The HOF expression
    evaluates interpreted per ELEMENT — CPU ∝ dim × candidates — where
    the Arrow kernel is one fused numpy pass per batch (measured A/B in
    the ARROW_SCORER_MIN_DIM note / SCALE.md r11); at narrow widths the
    HOF is fast AND bit-identical to SQL oracles (left-to-right
    summation), which the Arrow kernel's pairwise summation is not.
    ``'hof'``/``'arrow'`` force. The centroid-probing stage switches with
    the same knob (HOF transform vs one closure matmul over the collected
    centroid matrix — bounded by the same n_lists × dim budget as the
    build).
    """
    if index is not None:
        centroids, assignments = index
    else:
        centroids, assignments = build_ivf_index(
            corpus, corpus_id=corpus_id, vec_col=vec_col, n_lists=n_lists, kmeans_iters=kmeans_iters
        )
    # malformed (null-vector) queries produce NO result rows in EITHER
    # scorer path: the Arrow probe UDF necessarily drops them (no matmul
    # against a null), and without this filter the HOF path would instead
    # emit k arbitrary neighbors with null cosine — a row-set that changes
    # with the scorer/dim cutover. Drop them explicitly so the contract
    # is scorer-independent.
    q_slim = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).filter(F.col("qv").isNotNull())
    use = resolve_scorer(scorer, q_slim, "qv")
    if use == "arrow":
        # centroid probing as ONE matmul per Arrow batch — the HOF
        # transform below is queries × n_lists × dim interpreted lambda
        # steps. The collected matrix is the same data the broadcast row
        # carries — but a PREBUILT index never went through the build-side
        # budget on THIS driver, so enforce the same bound before the
        # collect (two tiny jobs against the index tables).
        if index is not None:
            first = centroids.select(F.size("centroid")).first()
            c_dim = first[0] if first is not None else 0
            n_c = centroids.count()
            est = n_c * (c_dim or 0) * 8
            if est > IVF_CENTROID_BUDGET_BYTES:
                raise ValueError(
                    f"ivf_ann_topk: prebuilt index centroids would be "
                    f"n_lists({n_c}) × dim({c_dim}) × 8 B = "
                    f"{est / (1 << 20):.0f} MiB on the query driver, over "
                    f"the {IVF_CENTROID_BUDGET_BYTES / (1 << 20):.0f} MiB "
                    "budget — shard the corpus into per-shard in-budget "
                    "indexes (see build_ivf_index), or score with "
                    "scorer='hof' (broadcast-row probing, no driver "
                    "matrix)."
                )
        lids, cn = _centroid_matrix(centroids)
        cdim = cn.shape[1]

        @F.pandas_udf("array<int>")
        def top_lists(vs: pd.Series) -> pd.Series:
            n = len(vs)
            if n == 0:
                return pd.Series([], dtype=object)
            out = [None] * n
            mask = np.fromiter(
                (v is not None and len(v) == cdim for v in vs),
                dtype=bool, count=n,
            )
            if mask.any():
                V = np.array([v for v, m in zip(vs, mask) if m], dtype="float64")
                vn = np.linalg.norm(V, axis=1)
                vn[vn == 0] = 1.0
                sims = (V / vn[:, None]) @ cn.T
                k = min(n_probe, sims.shape[1])
                j = 0
                for i in range(n):
                    if not mask[i]:
                        continue
                    # cos desc, list_id desc on ties — parity with the
                    # HOF sort_array(struct(cos, list_id), desc) order
                    order = np.lexsort((-lids, -sims[j]))[:k]
                    out[i] = [int(x) for x in lids[order]]
                    j += 1
            return pd.Series(out)

        probes = q_slim.withColumn("list_id", F.explode(top_lists(F.col("qv"))))
    else:
        cent_arr_df = centroids.agg(
            F.array_sort(F.collect_list(F.struct("list_id", "centroid"))).alias("_cents")
        )
        scored_cents = F.transform(
            F.col("_cents"),
            lambda s: F.struct(
                cosine_similarity(F.col("qv"), s["centroid"]).alias("cos"),
                s["list_id"].alias("list_id"),
            ),
        )
        probes = (
            q_slim
            .crossJoin(F.broadcast(cent_arr_df))
            .withColumn(
                "list_id",
                F.explode(
                    F.transform(
                        F.slice(F.sort_array(scored_cents, asc=False), 1, n_probe),
                        lambda s: s["list_id"],
                    )
                ),
            )
            .drop("_cents")
        )
    # probes (queries × n_probe rows) is DEFINITIONALLY the small side —
    # broadcast it explicitly. Without the hint, Catalyst's static size
    # estimate of the corpus branch (an ArrowEvalPython projection whose
    # stats are unreliable) can land under autoBroadcastJoinThreshold and
    # broadcast the CORPUS assignments instead — measured at 200k × 64-dim
    # vectors: driver "Not enough memory to build and broadcast" (r10).
    # The explicit isnotnull pre-filter matters too: the join would infer
    # it as a key constraint anyway, but the inferred filter lands BELOW
    # the UDF-extraction boundary and makes Catalyst evaluate the Arrow
    # assign matmul twice per corpus row (eval → filter → re-eval); with
    # the filter written on the already-projected column the plan keeps a
    # single eval. Null list_ids are malformed-vector rows (see
    # build_ivf_index) — unprobeable by construction.
    # broadcast_queries=False still must not let Catalyst's low corpus
    # estimate elect a corpus broadcast — pin sort-merge instead.
    probes_side = F.broadcast(probes) if broadcast_queries else probes.hint("merge")
    # the width filter makes the scorer paths agree on mixed-width pairs:
    # cosine between different-dimensional vectors is undefined — the HOF
    # zip_with would silently TRUNCATE to the shorter vector (a garbage
    # score), the Arrow kernel nulls it. Drop such pairs in both paths
    # (one int comparison per candidate row).
    cand = probes_side.join(
        assignments.filter(F.col("list_id").isNotNull()).select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"), "list_id"
        ),
        "list_id",
    ).filter(
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.size("qv") == F.size("cv"))
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine_score_col(use).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int | str = 8,
    n_tables: int = 4,
    seed: int = 7,
    index: DataFrame | None = None,
    broadcast_queries: bool = True,
    scorer: str = "auto",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` independent hyperplane tables; exact cosine + top-k within
    candidates. Equi-join on (table, bucket) → shuffle-partitioned, no cross
    join — the 100 TB path.

    Recall ≈ 1-(1-p^n_planes)^n_tables with p = 1-θ/π per plane: fewer
    planes → bigger buckets (cost↑ recall↑); more tables → recall↑ at
    linear candidate-generation cost. ``n_planes='auto'`` sizes planes
    from the CORPUS count so per-query candidate volume stays
    ~16·n_tables regardless of corpus size (one count job; see
    :func:`auto_planes` — a fixed plane count makes per-query cost grow
    linearly with the corpus instead).

    ``index``: a prebuilt corpus bucket table — the build-once/query-many
    path, mirroring ``ivf_ann_topk(index=...)``. Build it once with
    ``bucketize_tables(corpus, id_col=<corpus_id>, id_name="neighbor_id",
    vec_col=<vec_col>, keep_vec="cv", n_tables=..., n_planes=...,
    seed=...)``, persist (parquet partitioned by ``tbl, bucket`` so the
    candidate join prunes partitions), and pass it back here WITH THE
    SAME numeric ``n_planes``/``n_tables``/``seed`` used at build time —
    the query side must hash into identical buckets, so
    ``n_planes='auto'`` (whose resolution depends on the corpus count at
    call time) raises when an index is given. Without an index every
    call re-runs the corpus bucketize matmul from lineage, exactly like
    the unindexed IVF path. :func:`persist_lsh_index` /
    :func:`load_lsh_index` wrap the write/read with the scale-safe
    layout: the index is partitioned by (tbl, ``_bpfx<p>`` — a p-bit
    bucket prefix, so directory count stays bounded however many buckets
    the corpus occupies). When the index carries such a column the
    candidate join adds it as an equi-key, which hands Spark dynamic
    partition pruning from the broadcast query side: a query batch
    touches only the directories its bucket prefixes live in.

    SMALL-QUERY CONTRACT: the query bucket table (|queries| × n_tables
    rows, vectors riding along) is broadcast — keep query batches within
    broadcast memory (rule of thumb ≤ ~1M rows at 64-dim, inversely with
    dim). For corpus-scale probe sets pass ``broadcast_queries=False``
    (pins a sort-merge join; corpus-vs-corpus near-dup belongs to
    ``embedding_near_dup_pairs``).

    ``scorer``: same contract as :func:`ivf_ann_topk` — 'auto' picks the
    Arrow pair-cosine kernel at or above ARROW_SCORER_MIN_DIM (the HOF
    cosine is interpreted per element and dominates high-dim queries),
    the HOF expression below it (bit-identical to SQL oracles).
    """
    if index is not None and n_planes == "auto":
        raise ValueError(
            "n_planes='auto' cannot be used with a prebuilt index: pass "
            "the numeric plane count the index was built with"
        )
    if n_planes == "auto":
        n_planes = auto_planes(corpus.count())
    elif not isinstance(n_planes, int):
        raise ValueError(f"n_planes must be an int or 'auto', got {n_planes!r}")

    use = resolve_scorer(
        scorer,
        queries.select(F.col(vec_col).cast("array<double>").alias("qv")),
        "qv",
    )
    q = bucketize_tables(
        queries, id_col=query_id, id_name="query_id", vec_col=vec_col, keep_vec="qv",
        n_tables=n_tables, n_planes=n_planes, seed=seed,
    )
    join_keys = ["tbl", "bucket"]
    if index is not None:
        # cheap desync guard: when the index kept its bit-string bucket
        # (the persist_lsh_index layout stores bucket as a data column
        # verbatim), its length IS the plane count it was built with — a
        # caller-supplied n_planes that disagrees would hash queries into
        # buckets that never match, silently yielding empty/partial
        # results. One short-circuiting first() job. (A numeric bucket —
        # the old tbl/bucket-partitioned round trip — lost its leading
        # zeros, so length is meaningless there; the lpad below is that
        # path's reconstruction and load_lsh_index's params round-trip
        # its only guard.)
        if isinstance(index.schema["bucket"].dataType, StringType):
            row = index.select(F.length("bucket")).first()
            if row is not None and row[0] is not None and row[0] != n_planes:
                raise ValueError(
                    f"lsh_ann_topk: index bucket strings are {row[0]} bits "
                    f"but n_planes={n_planes} was passed — the query side "
                    "would hash into buckets that never match. Pass the "
                    "plane count the index was built with (load_lsh_index "
                    "returns it in params)."
                )
        # normalize the bucket dtype: reading a tbl/bucket-partitioned
        # parquet index back infers the bit-string bucket as INT (leading
        # zeros dropped — "01" comes back as 1, and at 24 planes the
        # decimal reading even outgrows bigint). lpad(cast) reconstructs
        # the exact sign-bit string for any round trip and is a no-op
        # when the string survived.
        c = index.withColumn(
            "bucket", F.lpad(F.col("bucket").cast("string"), n_planes, "0")
        ).withColumn("tbl", F.col("tbl").cast("int"))
        # persist_lsh_index layout: a `_bpfx<p>` partition column (p-bit
        # bucket prefix, 'b'-tagged to defeat numeric partition-value
        # inference). Joining on it too is semantically redundant (it is
        # a function of bucket) but it is THE partition column — with the
        # query side broadcast, Spark's dynamic partition pruning turns
        # it into a directory-level skip list for the corpus scan.
        bpfx = next(
            (col for col in index.columns if re.fullmatch(r"_bpfx\d+", col)), None
        )
        if bpfx is not None:
            p = int(bpfx[5:])
            q = q.withColumn(
                bpfx, F.concat(F.lit("b"), F.substring("bucket", 1, p))
            )
            join_keys = ["tbl", bpfx, "bucket"]
    else:
        c = bucketize_tables(
            corpus, id_col=corpus_id, id_name="neighbor_id", vec_col=vec_col, keep_vec="cv",
            n_tables=n_tables, n_planes=n_planes, seed=seed,
        )
    # the query side (|queries| × n_tables rows) is the small side by
    # contract — broadcast it explicitly rather than trusting static
    # size estimates of the corpus branch (an ArrowEvalPython +
    # posexplode projection whose stats are unreliable; the IVF
    # candidate join measurably mis-broadcast its CORPUS side from
    # the same shape — see ivf_ann_topk). broadcast_queries=False pins
    # sort-merge for oversized probe sets. Corpus-vs-corpus near-dup
    # search belongs to embedding_near_dup_pairs, which keeps the
    # shuffle join.
    q_side = F.broadcast(q) if broadcast_queries else q.hint("merge")
    # same cross-width drop as ivf_ann_topk: a mixed-width corpus can
    # collide bucket strings across dims — cosine between different
    # widths is undefined, so such pairs leave the candidate set here
    # (HOF would truncate, Arrow would null; both are wrong answers)
    pairs = (
        q_side.join(c, join_keys)
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.size("qv") == F.size("cv"))
        )
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    # score BEFORE the pair dedup: a (query, neighbor) pair repeats once
    # per shared table (≤ n_tables), and cosine is deterministic per
    # pair, so deduping on the scored rows is equivalent — but the
    # dropDuplicates shuffle then moves (ids, one double) instead of two
    # dim-wide vectors per row (~100× narrower at 768-dim for ≤ n_tables×
    # extra map-side scoring work)
    scored = pairs.select(
        "query_id", "neighbor_id", cosine_score_col(use).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _infer_id_vec_roles(df: DataFrame, data_cols: list[str], helper: str) -> tuple[str, str]:
    """(id_col, vec_col) roles for a persist manifest, identified by DTYPE
    — the vector column is the unique ArrayType column — never by column
    ORDER: an assignments/index frame built as (vec, id) would otherwise
    write a silently swapped manifest, and the load helper would rename
    the wrong columns into the query path (garbage joins, no error)."""
    from pyspark.sql.types import ArrayType

    by_name = {f.name: f.dataType for f in df.schema.fields}
    arrays = [c for c in data_cols if isinstance(by_name[c], ArrayType)]
    if len(arrays) != 1:
        raise ValueError(
            f"{helper}: cannot infer (id, vector) roles — expected exactly "
            f"one array-typed column among {data_cols}, found "
            f"{arrays or 'none'} (dtypes: "
            f"{ {c: by_name[c].simpleString() for c in data_cols} })"
        )
    vec = arrays[0]
    ident = next(c for c in data_cols if c != vec)
    return ident, vec


def persist_ivf_index(
    index: tuple[DataFrame, DataFrame],
    path: str,
    *,
    mode: str = "error",
) -> None:
    """Write a :func:`build_ivf_index` result to ``path`` in the layout the
    query path wants, small-files-safe:

    - ``{path}/centroids`` — the (list_id, centroid) table, one file
      (≤ 4096 rows by the build clamp).
    - ``{path}/assignments`` — parquet ``partitionBy("list_id")``, so a
      probe reading n_probe lists prunes to n_probe directories — the
      √n read volume IVF exists for. The write REPARTITIONS by list_id
      first: without it every write task holds rows of every list and
      emits tasks × n_lists files (measured r10: the unrepartitioned
      probe wrote 32 tasks × 1414 dirs ≈ 45k tiny files; SCALE.md); with
      it each list's rows arrive at exactly one task — one file per
      directory.
    - ``{path}/meta`` — a one-row JSON manifest (written driver-side via
      :mod:`..sources.fsio`, which resolves the same Hadoop FileSystem as
      Spark's own writers — a distributed write for a 200-byte manifest
      is one whole Spark job of fixed overhead; the layout stays the
      ``part-*.json`` + ``_SUCCESS`` tree ``spark.read.json`` expects)
      recording n_lists and the id/vector column names for load-time
      validation.

    Null list_id rows (malformed vectors, see :func:`build_ivf_index`)
    land in the Hive default partition and round-trip back as null —
    still unprobeable, never silently dropped.
    """
    centroids, assignments = index
    spark = centroids.sparkSession
    centroids.coalesce(1).write.mode(mode).parquet(f"{path}/centroids")
    # count the re-read (one tiny file) rather than `centroids` itself,
    # whose lineage is a full corpus aggregation — one corpus pass for the
    # write above, zero extra for the count.
    n_lists = spark.read.parquet(f"{path}/centroids").count()
    data_cols = [col for col in assignments.columns if col != "list_id"]
    if len(data_cols) != 2:
        raise ValueError(
            "persist_ivf_index: assignments must carry exactly "
            f"(corpus_id, vec_col, list_id); got {assignments.columns}"
        )
    id_col, v_col = _infer_id_vec_roles(assignments, data_cols, "persist_ivf_index")
    (
        assignments.repartition(n_lists, "list_id")
        .write.partitionBy("list_id")
        .mode(mode)
        .parquet(f"{path}/assignments")
    )
    meta = Row(
        format="ivf", version=1, n_lists=n_lists,
        corpus_id=id_col, vec_col=v_col,
    )
    fsio.write_json_dir(f"{path}/meta", meta.asDict(), mode=mode, spark=spark)


def load_ivf_index(
    spark: SparkSession,
    path: str,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a :func:`persist_ivf_index` tree back as the
    ``(centroids, assignments)`` pair :func:`ivf_ann_topk` takes via
    ``index=``. Pass ``corpus_id``/``vec_col`` to rename the stored
    columns to what your query call uses (defaults keep the stored
    names, which the manifest records from build time)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "ivf":
        raise ValueError(f"load_ivf_index: {path}/meta is not an IVF index manifest")
    centroids = spark.read.parquet(f"{path}/centroids")
    assignments = spark.read.parquet(f"{path}/assignments")
    if corpus_id and corpus_id != meta["corpus_id"]:
        assignments = assignments.withColumnRenamed(meta["corpus_id"], corpus_id)
    if vec_col and vec_col != meta["vec_col"]:
        assignments = assignments.withColumnRenamed(meta["vec_col"], vec_col)
    return centroids, assignments


def materialize_index(index, *, eager: bool = False):
    """Pin a freshly BUILT in-memory index so repeated query actions reuse
    the computed build instead of replaying its lineage (optimization guide
    §5: cache/localCheckpoint exactly when an intermediate is reused and
    recomputing it costs more than holding it).

    A ``build_*_index`` result is lazy DataFrames: every ``.collect()`` of a
    ``*_ann_topk`` over it re-runs the WHOLE build — seeding, Lloyd
    step(s), the corpus-wide assign/encode pass — once per action (measured
    on the r14 contract faces: 3–6 redundant full builds per face). This
    helper ``localCheckpoint``s every DataFrame in the structure, so the
    first action materializes the build once and every later action reads
    the stored blocks. Results are bit-identical by construction — a local
    checkpoint stores the rows the lazy plan would produce (and the builds
    are deterministic besides).

    Accepts any built index shape and preserves it:

    - ``(centroids, assignments)`` — :func:`build_ivf_index` /
      :func:`pq_index` pairs;
    - ``(ivf_centroids, pq_centroids, entries)`` —
      :func:`build_ivfpq_index` triples;
    - a LIST of such tuples — the sharded builds;
    - ``(pq_centroids, [(ivf_centroids, entries), ...])`` — the
      shared-codebook :func:`build_sharded_ivfpq_index` shape (tuples and
      lists are recursed structurally; DataFrames are the leaves).

    Use it between build and repeated querying in a session (persisted
    indexes don't need it — their lineage is already a parquet read).
    ``eager=True`` materializes immediately; the default defers to the
    first action. NOT for corpora that dwarf executor storage: local
    checkpoints live in the block manager (memory, spilling to local
    disk) — at that scale persist the index instead, which is the
    documented build-once/query-many path anyway."""
    if isinstance(index, list):
        return [materialize_index(t, eager=eager) for t in index]
    if isinstance(index, tuple):
        return tuple(materialize_index(t, eager=eager) for t in index)
    return index.localCheckpoint(eager=eager)


def append_to_ivf_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
    dedupe: bool = False,
    centroid_budget_bytes: int = IVF_CENTROID_BUDGET_BYTES,
) -> int:
    """Append a batch of new vectors to a persisted :func:`persist_ivf_index`
    tree WITHOUT rebuilding: assign each new vector to the index's FROZEN
    centroids (the exact :func:`_assign_to_lists` kernel the build used —
    append parity is by construction, pinned by test) and append the slim
    (id, vec, list_id) rows into the existing ``partitionBy(list_id)``
    layout. Returns the number of rows appended.

    THE DAILY-CRAWL PATH: at corpus scale a full IVF rebuild is a pass
    over ALL history (SCALE.md r11: 36 min at 20M × 64-dim), while the
    daily increment only needs one map-only matmul over the NEW batch +
    an append write — O(batch), not O(corpus). Centroids drift as the
    corpus grows; :func:`ivf_index_stats` reports occupancy skew and
    flags when a rebuild (or a reshard via
    :func:`build_sharded_ivf_index`) is due.

    Write shape: the batch is repartitioned by ``list_id`` before
    ``partitionBy``, so each append adds AT MOST ONE new file per touched
    list directory (files per dir grow by one per append, never by the
    task count — :func:`compact_ivf_index` restores the one-file-per-dir
    contract when the append count warrants it).

    ``corpus_id``/``vec_col`` name the columns of ``new_vectors``
    (default: the stored names from the manifest). Null/ragged vectors
    degrade to a null ``list_id`` (Hive default partition — unprobeable,
    never dropped), exactly as the build does.

    EXACTLY-ONCE: a plain parquet append replayed (e.g. a retried job)
    lands the batch twice. ``dedupe=True`` anti-joins the batch against
    the ids already in the index first (a column-pruned id-only scan), so
    re-running the same batch is idempotent — the streaming-ingest replay
    discipline (``streaming/ingest.py``) applied to index maintenance.
    """
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "ivf":
        raise ValueError(f"append_to_ivf_index: {path}/meta is not an IVF index manifest")
    stored_id, stored_vec = meta["corpus_id"], meta["vec_col"]
    n_lists = int(meta["n_lists"])
    id_in = corpus_id or stored_id
    vec_in = vec_col or stored_vec
    centroids = spark.read.parquet(f"{path}/centroids")
    first = centroids.select(F.size("centroid")).first()
    ref_dim = first[0] if first is not None else 0
    est_bytes = n_lists * ref_dim * 8
    if est_bytes > centroid_budget_bytes:
        raise ValueError(
            f"append_to_ivf_index: centroid matrix is n_lists({n_lists}) × "
            f"dim({ref_dim}) × 8 B = {est_bytes / (1 << 20):.0f} MiB on the "
            f"DRIVER, over the {centroid_budget_bytes / (1 << 20):.0f} MiB "
            "budget — this index should be queried/maintained as shards."
        )
    slim = new_vectors.select(
        F.col(id_in).alias("cid"),
        F.col(vec_in).cast("array<double>").alias("v"),
    )
    if dedupe:
        existing = spark.read.parquet(f"{path}/assignments").select(
            F.col(stored_id).alias("cid")
        )
        # pin the post-anti-join increment: the count below and the write
        # re-evaluate this plan, and the exactly-once accounting is only
        # honest if BOTH see the same rows — a non-deterministic batch
        # (a .limit() slice, a sample) would otherwise diverge between
        # the two passes. localCheckpoint materializes O(batch) once;
        # lost blocks fail the job loudly instead of silently recomputing.
        slim = slim.join(existing, "cid", "left_anti").localCheckpoint(eager=True)
    # one extra job over the NEW BATCH only (never the corpus): without
    # dedupe the returned count re-evaluates slim's scan and the write
    # re-evaluates it once more — the fast path therefore REQUIRES a
    # deterministic new_vectors plan (two passes over an increment beat
    # materializing it); with dedupe the checkpoint above already pinned
    # the row set
    appended = slim.count()
    if appended:
        (
            _assign_to_lists(slim, centroids)
            .select(
                F.col("cid").alias(stored_id),
                F.col("v").alias(stored_vec),
                "list_id",
            )
            .repartition(n_lists, "list_id")
            .write.partitionBy("list_id")
            .mode("append")
            .parquet(f"{path}/assignments")
        )
    return appended


def _swap_triplet(path: str, tree: str) -> tuple[str, str, str]:
    """(live, tmp, old) paths for the compaction rename swap of an
    index's ``tree`` subdirectory."""
    return (
        f"{path}/{tree}",
        f"{path}/{tree}__compacting",
        f"{path}/{tree}__old",
    )


COMPACT_COMMIT_MARKER = "_COMPACT_META"


def _repair_swap(
    spark: SparkSession, path: str, tree: str, helper: str
) -> bool:
    """Finish a compaction swap that crashed between its two renames: if
    the live tree is missing but a COMMITTED ``__compacting`` tree
    exists, rename it in and drop the superseded ``__old``. Returns True
    when a repair was performed. Committedness is the engine's OWN
    ``_COMPACT_META`` stamp (written by :func:`_commit_swap` strictly
    before the first rename — the post-job-marker discipline
    ``streaming/dedup.py``'s LSM runs use), with the job committer's
    ``_SUCCESS`` accepted as a fallback so trees compacted by pre-stamp
    engine versions remain repairable; the protocol therefore does NOT
    depend on ``mapreduce.fileoutputcommitter.marksuccessfuljobs`` being
    left at its default. A missing live tree with NO committed
    replacement raises — that index is broken and a silent resurrection
    from ``__old`` could lose appends that landed after the compaction
    read its snapshot."""
    live, tmp, old = _swap_triplet(path, tree)
    if fsio.exists(live, spark=spark):
        return False
    if fsio.exists(f"{tmp}/{COMPACT_COMMIT_MARKER}", spark=spark) or fsio.exists(
        f"{tmp}/_SUCCESS", spark=spark
    ):
        fsio.rename(tmp, live, spark=spark)
        fsio.delete(old, spark=spark)
        return True
    raise ValueError(
        f"{helper}: {live} is missing and no committed compaction "
        f"tree exists at {tmp} — the index is broken (appends landed after "
        "the last compaction snapshot would be lost by resurrecting "
        f"{old}; rebuild from the corpus)."
    )


def _commit_swap(spark: SparkSession, path: str, tree: str) -> None:
    """The sequence after the ``__compacting`` tree's write job finished:
    stamp the tree committed (``_COMPACT_META`` — crash BEFORE the stamp
    leaves the live tree in place, so compaction simply reruns; crash
    after is repairable regardless of the cluster's ``_SUCCESS``-marker
    setting), then live → old, tmp → live, delete old."""
    live, tmp, old = _swap_triplet(path, tree)
    fsio.write_text_atomic(f"{tmp}/{COMPACT_COMMIT_MARKER}", "1", spark=spark)
    fsio.rename(live, old, spark=spark)
    fsio.rename(tmp, live, spark=spark)
    fsio.delete(old, spark=spark)


def compact_ivf_index(spark: SparkSession, path: str) -> None:
    """Rewrite a persisted IVF index's assignments back to the
    one-data-file-per-list-directory contract after a run of
    :func:`append_to_ivf_index` calls (each append adds one file per
    touched directory; K appends → K+1 files/dir → K+1 seeks per probed
    list at query time).

    Swap protocol (all on the index's own filesystem via
    ``sources.fsio`` — works on any Hadoop FS, not just local disk):
    write the repartitioned tree to ``assignments__compacting`` (job-
    committed with ``_SUCCESS``), rename the live tree to
    ``assignments__old``, rename the new tree in, delete the old. A crash
    between the two renames leaves the live path missing but the
    COMMITTED new tree intact — the next ``compact_ivf_index`` call (or
    :func:`repair_ivf_index` directly) finishes the swap instead of
    recompacting; a crash before the first rename leaves an uncommitted
    temp tree that is deleted and rebuilt. Readers holding the old
    DataFrame may see a transient listing error during the swap — run
    compaction in the same maintenance window as the appends it follows.
    """
    if repair_ivf_index(spark, path):
        return  # the finished swap IS the compacted tree
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "ivf":
        raise ValueError(f"compact_ivf_index: {path}/meta is not an IVF index manifest")
    asg, tmp, old = _swap_triplet(path, "assignments")
    fsio.delete(tmp, spark=spark)  # uncommitted residue from a prior crash
    fsio.delete(old, spark=spark)
    (
        spark.read.parquet(asg)
        .repartition(int(meta["n_lists"]), "list_id")
        .write.partitionBy("list_id")
        .mode("error")
        .parquet(tmp)
    )
    _commit_swap(spark, path, "assignments")


def repair_ivf_index(spark: SparkSession, path: str) -> bool:
    """Finish a :func:`compact_ivf_index` swap that crashed between its
    two renames (see :func:`_repair_swap`)."""
    return _repair_swap(spark, path, "assignments", "repair_ivf_index")


def ivf_index_stats(
    assignments: DataFrame, *, skew_threshold: float = 4.0
) -> DataFrame:
    """One-row occupancy report for an IVF assignments table — the
    rebuild-due gauge for :func:`append_to_ivf_index` maintenance:

    - ``n_lists_used`` / ``n_rows`` / ``null_rows`` (malformed vectors
      parked on the null list);
    - ``max_occupancy`` / ``avg_occupancy`` and their ratio ``skew`` —
      appends assign to FROZEN centroids, so corpus drift shows up as a
      few lists absorbing the growth: probe cost is per-LIST, so query
      latency degrades as max occupancy, not avg;
    - ``rebalance_recommended`` — skew above ``skew_threshold`` (the
      signal to rebuild, or to reshard via
      :func:`build_sharded_ivf_index` when n is past the clamp).

    One groupBy over the slim (list_id) projection + a scalar agg —
    column-pruned to a single int column however wide the vectors are."""
    occ = (
        assignments.groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return occ.agg(
        F.count(F.when(F.col("list_id").isNotNull(), 1)).cast("int").alias("n_lists_used"),
        F.sum("occ").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("list_id").isNull(), F.col("occ"))), F.lit(0)
        ).cast("long").alias("null_rows"),
        F.coalesce(
            F.max(F.when(F.col("list_id").isNotNull(), F.col("occ"))), F.lit(0)
        ).cast("long").alias("max_occupancy"),
        F.coalesce(
            F.round(F.avg(F.when(F.col("list_id").isNotNull(), F.col("occ"))), 2),
            F.lit(0.0),
        ).alias("avg_occupancy"),
    ).select(
        "n_lists_used",
        "n_rows",
        "null_rows",
        "max_occupancy",
        "avg_occupancy",
        # All-null assignments (every vector malformed): definite 0.0 skew
        # + False, never a null row the plan would read as append_ok with
        # no occupancy signal at all (see lsh_index_stats).
        # when-guarded division: ANSI mode makes 0/0 a hard error, and a
        # null avg (no non-null rows) must surface as definite zeros.
        F.when(
            F.col("avg_occupancy") > 0,
            F.round(F.col("max_occupancy") / F.col("avg_occupancy"), 3),
        ).otherwise(F.lit(0.0)).alias("skew"),
        F.when(
            F.col("avg_occupancy") > 0,
            F.col("max_occupancy") / F.col("avg_occupancy") > F.lit(skew_threshold),
        ).otherwise(F.lit(False)).alias("rebalance_recommended"),
    )


def lsh_index_stats(
    buckets: DataFrame, *, skew_threshold: float = 4.0
) -> DataFrame:
    """Bucket-occupancy report for an LSH bucket table — the LSH face of
    :func:`ivf_index_stats`, and a plan-compatible input to
    :func:`index_maintenance_plan` (carries the ``n_rows``/``null_rows``/
    ``skew`` columns the policy consumes): LSH query cost per probe is
    the occupancy of the (tbl, bucket) a query hashes into, so a hot
    bucket — plane set no longer separating a drifted corpus, or a
    degenerate all-zeros region — is a candidate-explosion hazard the
    same way a hot IVF list is. One groupBy over the slim (tbl, bucket)
    projection; ``n_rows`` counts BUCKET rows (vectors × n_tables), null
    buckets (malformed vectors, bucketize's null contract) split out.

    The cure differs from IVF's (re-bucketize with more planes /
    different seed — appends reuse the manifest's frozen planes, so
    drift shows up here exactly as frozen-centroid drift does), but the
    gauge→policy loop is the same: feed this plus
    :func:`index_layout_stats` into the plan and branch on ``action``.
    """
    occ = buckets.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("occ"))
    return occ.agg(
        F.count(F.when(F.col("bucket").isNotNull(), 1)).cast("int").alias("n_buckets_used"),
        F.sum("occ").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("bucket").isNull(), F.col("occ"))), F.lit(0)
        ).cast("long").alias("null_rows"),
        F.coalesce(
            F.max(F.when(F.col("bucket").isNotNull(), F.col("occ"))), F.lit(0)
        ).cast("long").alias("max_occupancy"),
        F.coalesce(
            F.round(F.avg(F.when(F.col("bucket").isNotNull(), F.col("occ"))), 2),
            F.lit(0.0),
        ).alias("avg_occupancy"),
    ).select(
        "n_buckets_used",
        "n_rows",
        "null_rows",
        "max_occupancy",
        "avg_occupancy",
        # All-null degenerate table: max/avg coalesce to 0, so skew reads
        # a definite 0.0 and rebalance a definite False — the null_rows /
        # null_vector_rate reason is the visible signal, never a
        # null-poisoned "looks healthy" row.
        # when-guarded division: ANSI mode makes 0/0 a hard error, and a
        # null avg (no non-null rows) must surface as definite zeros.
        F.when(
            F.col("avg_occupancy") > 0,
            F.round(F.col("max_occupancy") / F.col("avg_occupancy"), 3),
        ).otherwise(F.lit(0.0)).alias("skew"),
        F.when(
            F.col("avg_occupancy") > 0,
            F.col("max_occupancy") / F.col("avg_occupancy") > F.lit(skew_threshold),
        ).otherwise(F.lit(False)).alias("rebalance_recommended"),
    )


def persist_lsh_index(
    index: DataFrame,
    path: str,
    *,
    n_planes: int,
    n_tables: int,
    seed: int,
    prefix_bits: int | None = None,
    mode: str = "error",
) -> None:
    """Write a :func:`bucketize_tables` corpus bucket table to ``path`` in
    a directory-bounded, prunable layout for :func:`lsh_ann_topk`
    ``index=`` queries.

    partitionBy("tbl", "bucket") — the naive layout — creates one
    directory PER OCCUPIED BUCKET: at 'auto' plane sizing that is
    ~corpus/16 × n_tables directories (500k at 2M vectors), which drowns
    file listing before any query runs. Instead the index is partitioned
    by (tbl, ``_bpfx<p>``): a p-bit bucket PREFIX (auto-sized from the
    row count — see below), capping directories at n_tables × 2^p ≤ 1024
    while dynamic partition pruning (the query side is broadcast and
    joins on the prefix column too — see :func:`lsh_ann_topk`) still
    skips every directory no query bucket hashes into. The prefix value
    is 'b'-tagged ("b0110…") so partition-value inference can't collapse
    the bit string to an int, and p is encoded in the COLUMN NAME
    (``_bpfx6``) so the query path self-configures with zero extra jobs.
    Files are repartitioned by (tbl, prefix) — each directory is written
    by exactly one task — and sorted by bucket within partitions so each
    file covers a contiguous bucket range (row-group min/max locality).

    ``n_planes``/``n_tables``/``seed`` must be the values the index was
    bucketized with; they are recorded in ``{path}/meta`` and handed back
    by :func:`load_lsh_index` so query calls can't desync.

    ``prefix_bits=None`` sizes the prefix from the index row count (one
    count job — this is an offline build step): directories multiply as
    n_tables × 2^p, so p ≈ log2(rows / n_tables / 20k), clamped to
    [1, min(n_planes, 8)] — each (tbl, prefix) directory holds ~20k rows,
    so small corpora don't shatter into 1024 dirs of tiny files while big
    ones keep directory-level pruning granularity.
    """
    if not isinstance(n_planes, int):
        raise ValueError(
            "persist_lsh_index: n_planes must be the numeric plane count the "
            f"index was built with, got {n_planes!r}"
        )
    if prefix_bits is None:
        n_rows = index.count()
        per_table = max(1, n_rows // max(1, n_tables))
        # floor(log2(per_table / 20k)): bit_length()-1 is exact at powers
        # of two (160k rows/table → p=3 → ~20k rows per directory)
        p = max(1, min(min(n_planes, 8),
                       (max(1, per_table // 20_000)).bit_length() - 1))
    else:
        p = prefix_bits
    if not 1 <= p <= n_planes:
        raise ValueError(f"prefix_bits must be in [1, n_planes], got {p}")
    bp = f"_bpfx{p}"
    spark = index.sparkSession
    data_cols = [c for c in index.columns if c not in ("tbl", "bucket")]
    if len(data_cols) != 2:
        raise ValueError(
            "persist_lsh_index: index must carry exactly "
            f"(id, vec, tbl, bucket); got {index.columns}"
        )
    id_col, v_col = _infer_id_vec_roles(index, data_cols, "persist_lsh_index")
    normalized = index.withColumn(
        "bucket", F.lpad(F.col("bucket").cast("string"), n_planes, "0")
    ).withColumn(bp, F.concat(F.lit("b"), F.substring("bucket", 1, p)))
    n_dirs = n_tables * (1 << p)
    (
        normalized.repartition(min(1024, n_dirs), "tbl", bp)
        .sortWithinPartitions("bucket")
        .write.partitionBy("tbl", bp)
        .mode(mode)
        .parquet(f"{path}/buckets")
    )
    meta = Row(
        format="lsh", version=1, n_planes=n_planes, n_tables=n_tables,
        seed=seed, prefix_bits=p, id_col=id_col, vec_col=v_col,
    )
    fsio.write_json_dir(f"{path}/meta", meta.asDict(), mode=mode, spark=spark)


def load_lsh_index(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Read a :func:`persist_lsh_index` tree back as ``(index, params)``:
    ``index`` ready for ``lsh_ann_topk(..., index=index)`` (id/vec columns
    renamed to the neighbor_id/cv names the query path binds), ``params``
    the exact ``{"n_planes", "n_tables", "seed"}`` the index was built
    with — splat them into the query call so the query side hashes into
    identical buckets: ``lsh_ann_topk(q, corpus, index=idx, **params)``."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "lsh":
        raise ValueError(f"load_lsh_index: {path}/meta is not an LSH index manifest")
    index = spark.read.parquet(f"{path}/buckets")
    if meta["id_col"] != "neighbor_id":
        index = index.withColumnRenamed(meta["id_col"], "neighbor_id")
    if meta["vec_col"] != "cv":
        index = index.withColumnRenamed(meta["vec_col"], "cv")
    params = {
        "n_planes": int(meta["n_planes"]),
        "n_tables": int(meta["n_tables"]),
        "seed": int(meta["seed"]),
    }
    return index, params


def append_to_lsh_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
    dedupe: bool = False,
) -> int:
    """Append a batch of new vectors to a persisted :func:`persist_lsh_index`
    tree WITHOUT rebuilding: bucketize the batch with the index's OWN
    stored parameters (n_planes/n_tables/seed from the manifest — the
    desync :func:`lsh_ann_topk` guards against cannot happen here) and
    append the (id, vec, tbl, bucket) rows into the existing
    ``(tbl, _bpfx<p>)`` layout. Returns the number of VECTORS appended
    (each lands ``n_tables`` bucket rows).

    The LSH face of the daily-crawl path :func:`append_to_ivf_index`
    documents: one map-only bucketize matmul over the increment —
    O(batch), never the O(corpus) rebucketize. Appended rows use the
    SAME prefix derivation as the build, so they stay visible to the
    query side's dynamic partition pruning; each append adds at most one
    new file per touched (tbl, prefix) directory
    (:func:`compact_lsh_index` restores the one-file-per-directory
    contract). Null/ragged vectors degrade to null buckets exactly as
    :func:`bucketize_tables` does — never probed, never dropped.

    ``dedupe=True`` anti-joins the batch against ids already in the index
    (an id-column-pruned scan) so a replayed append is a no-op — the
    exactly-once discipline for retried maintenance jobs.
    """
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "lsh":
        raise ValueError(f"append_to_lsh_index: {path}/meta is not an LSH index manifest")
    stored_id, stored_vec = meta["id_col"], meta["vec_col"]
    n_planes, n_tables = int(meta["n_planes"]), int(meta["n_tables"])
    seed, p = int(meta["seed"]), int(meta["prefix_bits"])
    id_in = corpus_id or stored_id
    vec_in = vec_col or stored_vec
    slim = new_vectors.select(
        F.col(id_in).alias("_id"), F.col(vec_in).alias("_v")
    )
    if dedupe:
        existing = spark.read.parquet(f"{path}/buckets").select(
            F.col(stored_id).alias("_id")
        )
        # pinned for the same reason as append_to_ivf_index: count and
        # write must see the SAME anti-joined rows even for a
        # non-deterministic batch
        slim = slim.join(existing, "_id", "left_anti").localCheckpoint(eager=True)
    # one extra job over the NEW BATCH only; the no-dedupe fast path
    # requires a deterministic new_vectors plan (see append_to_ivf_index)
    appended = slim.count()
    if appended:
        bp = f"_bpfx{p}"
        normalized = (
            bucketize_tables(
                slim, id_col="_id", id_name=stored_id, vec_col="_v",
                keep_vec=stored_vec, n_tables=n_tables, n_planes=n_planes,
                seed=seed,
            )
            .withColumn(
                "bucket", F.lpad(F.col("bucket").cast("string"), n_planes, "0")
            )
            .withColumn(bp, F.concat(F.lit("b"), F.substring("bucket", 1, p)))
        )
        n_dirs = n_tables * (1 << p)
        (
            normalized.repartition(min(1024, n_dirs), "tbl", bp)
            .sortWithinPartitions("bucket")
            .write.partitionBy("tbl", bp)
            .mode("append")
            .parquet(f"{path}/buckets")
        )
    return appended


def compact_lsh_index(spark: SparkSession, path: str) -> None:
    """Rewrite a persisted LSH index's buckets back to the
    one-data-file-per-directory, bucket-sorted layout after a run of
    :func:`append_to_lsh_index` calls — same rename-swap protocol (and
    same crash repair via :func:`repair_lsh_index`) as
    :func:`compact_ivf_index`. Re-sorting by bucket within partitions
    restores the contiguous row-group min/max locality appends
    interleave."""
    if repair_lsh_index(spark, path):
        return
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "lsh":
        raise ValueError(f"compact_lsh_index: {path}/meta is not an LSH index manifest")
    p, n_tables = int(meta["prefix_bits"]), int(meta["n_tables"])
    bp = f"_bpfx{p}"
    live, tmp, old = _swap_triplet(path, "buckets")
    fsio.delete(tmp, spark=spark)
    fsio.delete(old, spark=spark)
    n_dirs = n_tables * (1 << p)
    (
        spark.read.parquet(live)
        .repartition(min(1024, n_dirs), "tbl", bp)
        .sortWithinPartitions("bucket")
        .write.partitionBy("tbl", bp)
        .mode("error")
        .parquet(tmp)
    )
    _commit_swap(spark, path, "buckets")


def repair_lsh_index(spark: SparkSession, path: str) -> bool:
    """Finish a :func:`compact_lsh_index` swap that crashed between its
    two renames (see :func:`_repair_swap`)."""
    return _repair_swap(spark, path, "buckets", "repair_lsh_index")


# Per-shard row cap for auto shard sizing: with the per-index list clamp at
# 4096 (see build_ivf_index), a shard of 4096² ≈ 16.8M rows is the largest
# corpus whose 'auto' √n list count still reaches the clamp exactly —
# beyond it a single flat index's probed rows grow LINEARLY (n_probe ·
# n/4096; SCALE.md r11 measured 39k rows/query at 20M vs 11.3k at 2M).
# Sharding at this cap keeps per-list occupancy ≤ 4096 vectors, so the
# global-probe-budget query path (sharded_ivf_ann_topk) reads at most
# n_probe × 4096 rows per query REGARDLESS of corpus size.
IVF_SHARD_MAX_ROWS = 4096 * 4096


def auto_shards(n_rows: int) -> int:
    """Shard count for :func:`build_sharded_ivf_index` ``n_shards='auto'``:
    the smallest shard count keeping every shard at or under
    ``IVF_SHARD_MAX_ROWS`` (= 4096², the corpus size where the per-index
    'auto' list sizing meets the 4096-list clamp). ≤ 16.8M rows → 1 shard
    (sharding adds nothing below the clamp); 20M → 2; 200M → 12; 1G → 60."""
    return max(1, -(-n_rows // IVF_SHARD_MAX_ROWS))


def build_sharded_ivf_index(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int | str = "auto",
    n_lists: int | str = "auto",
    kmeans_iters: int = 1,
    centroid_budget_bytes: int = IVF_CENTROID_BUDGET_BYTES,
    materialize: bool | str = "auto",
    scratch_dir: str | None = None,
) -> list[tuple[DataFrame, DataFrame]]:
    """IVF index SHARDED past the 4096-list clamp: hash-split the corpus
    into ``n_shards`` disjoint shards (``pmod(xxhash64(id), n_shards)`` —
    deterministic, uniform), build an independent in-budget
    :func:`build_ivf_index` per shard, and return the list of
    ``(centroids, assignments)`` pairs that :func:`sharded_ivf_ann_topk`
    queries with a GLOBAL probe budget.

    BUILD-SCAN ECONOMICS (``materialize``/``scratch_dir``): the direct
    path filters the FULL corpus per shard, so an N-shard build scans the
    source ~N× per build stage — fine at small auto shard counts (2–3;
    the smaller per-shard matmuls still made the 20M sharded build 0.59×
    the flat one, SCALE.md r12) but the scan multiplier flips the sign at
    high N. With ``scratch_dir`` set (and ``materialize='auto'``, the
    default, or ``True``), the hash split is written ONCE —
    ``partitionBy('_shard')``, one shuffle — and every per-shard build
    reads only its own partition directory (static partition pruning),
    turning N corpus scans per stage into 1 shuffle + N partition reads.
    Shard membership is the SAME expression either way, and the per-shard
    k-means is seeded on VALUES, not partition layout, so the two paths
    build identical indexes (parity-pinned by test). The returned shard
    DataFrames READ FROM ``scratch_dir`` — keep it until the index is
    persisted (the usual next step), then delete it; ``mode='error'``
    refuses a non-empty scratch so two builds can't interleave.

    WHY: a single flat IVF caps n_lists at 4096 (the driver-side centroid
    matrix budget — see ``IVF_CENTROID_BUDGET_BYTES``), so past ~16.8M
    vectors the probed rows per query grow LINEARLY with the corpus
    (n_probe · n/4096). Sharding multiplies the TOTAL list count
    (n_shards × per-shard lists) while every driver materialization —
    per-shard Lloyd collect at build, per-shard probe matmul closure at
    query — stays within the SAME per-index budget. With 'auto' sizing
    the per-list occupancy is capped at ~4096 vectors, so the global-
    budget query path reads at most n_probe × 4096 rows per query at ANY
    corpus size: the bounded-read-volume property the flat clamp loses.
    This is exactly the two-level upgrade path :func:`build_ivf_index`'s
    budget-guard docstring names.

    ``n_shards='auto'`` sizes from one corpus count (:func:`auto_shards`);
    1 shard is the degenerate case and builds/queries IDENTICALLY to the
    flat path (pinned by test). ``n_lists``/``kmeans_iters``/
    ``centroid_budget_bytes`` pass through to every per-shard build
    ('auto' there re-counts the SHARD — n_shards extra count jobs, an
    offline build cost).

    Null/ragged vectors: xxhash64(null id) still routes to a shard; the
    per-shard build degrades them to null list_id exactly as the flat
    build does (never probed, never silently dropped from persistence).
    """
    if n_shards == "auto":
        n_shards = auto_shards(corpus.count())
    elif not isinstance(n_shards, int) or n_shards < 1:
        raise ValueError(f"n_shards must be a positive int or 'auto', got {n_shards!r}")
    if materialize == "auto":
        do_mat = scratch_dir is not None and n_shards > 1
    elif isinstance(materialize, bool):
        do_mat = materialize and n_shards > 1
        if materialize and scratch_dir is None:
            raise ValueError(
                "build_sharded_ivf_index: materialize=True needs a "
                "scratch_dir to write the one-shuffle hash split to"
            )
    else:
        raise ValueError(
            f"materialize must be 'auto', True or False, got {materialize!r}"
        )
    shard_of = F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(n_shards))
    if do_mat:
        if "_shard" in corpus.columns:
            # withColumn would silently REPLACE the caller's column and the
            # post-read drop would remove it — breaking the documented
            # bit-identical parity with the direct path, which preserves it.
            raise ValueError(
                "build_sharded_ivf_index: corpus already has a '_shard' "
                "column, which the materialized split uses internally — "
                "rename it or pass materialize=False"
            )
        spark = corpus.sparkSession
        # deliberately NOT repartitioned by _shard: hash-partitioning on a
        # column with n_shards distinct values caps the write at n_shards
        # tasks — a 2-shard split of a big corpus would serialize onto 2
        # cores (measured: the whole cluster idle while 2 tasks write).
        # Writing from the source partitioning keeps full parallelism;
        # each task emits one file per shard directory it touches, and
        # the scratch split is READ-ONCE, so files-per-dir = source task
        # count costs one listing, not the per-probe seeks a query-layout
        # tree would pay.
        (
            corpus.withColumn("_shard", shard_of.cast("int"))
            .write.partitionBy("_shard")
            .mode("error")
            .parquet(scratch_dir)
        )
        split = spark.read.parquet(scratch_dir)
        parts = [
            split.filter(F.col("_shard") == s).drop("_shard")
            for s in range(n_shards)
        ]
    else:
        parts = [corpus.filter(shard_of == s) for s in range(n_shards)]

    def _one(part: DataFrame) -> tuple[DataFrame, DataFrame]:
        return build_ivf_index(
            part,
            corpus_id=corpus_id,
            vec_col=vec_col,
            n_lists=n_lists,
            kmeans_iters=kmeans_iters,
            centroid_budget_bytes=centroid_budget_bytes,
        )

    if n_shards == 1:
        return [_one(parts[0])]
    # r14 optimization (guide §2.6): the per-shard builds are independent
    # — each one's construction runs its own driver-side jobs (ref-dim
    # first(), seed/Lloyd centroid collects, optional 'auto' count), and
    # running them from a small thread pool overlaps those jobs instead of
    # serializing n_shards × per-shard latency on the driver (shard
    # results are positionally ordered, and each build is deterministic
    # on its VALUES, so the output is bit-identical to the sequential
    # loop — the ordering parity the materialized/direct twin test pins).
    # 2-4 builds in flight fill the scheduler without fighting over
    # executors; deeper pools add driver memory (one centroid matrix per
    # in-flight build) for no extra overlap.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(n_shards, 4)) as pool:
        return list(pool.map(_one, parts))


def _shard_probes(
    q_slim: DataFrame,
    centroids: DataFrame,
    *,
    n_probe: int,
    use: str,
    budget_check: bool,
) -> DataFrame:
    """Per-shard centroid probing for the sharded query path: the top
    ``n_probe`` lists per query WITH their centroid cosine riding along
    (the global merge ranks on it) — (query_id, qv, list_id, ccos) rows.

    Scorer parity with :func:`ivf_ann_topk`'s probe stage is deliberate
    and pinned by the 1-shard == flat test: the HOF branch evaluates the
    identical ``cosine_similarity`` expression; the Arrow branch runs the
    identical normalized matmul with the identical (cos desc, list_id
    desc) tie order, so at n_shards=1 the selected lists — and therefore
    the result rows — are bit-for-bit the flat path's."""
    if use == "arrow":
        if budget_check:
            first = centroids.select(F.size("centroid")).first()
            c_dim = first[0] if first is not None else 0
            n_c = centroids.count()
            est = n_c * (c_dim or 0) * 8
            if est > IVF_CENTROID_BUDGET_BYTES:
                raise ValueError(
                    f"sharded_ivf_ann_topk: shard centroids would be "
                    f"n_lists({n_c}) × dim({c_dim}) × 8 B = "
                    f"{est / (1 << 20):.0f} MiB on the query driver, over "
                    f"the {IVF_CENTROID_BUDGET_BYTES / (1 << 20):.0f} MiB "
                    "per-shard budget — rebuild with more shards, or "
                    "score with scorer='hof'."
                )
        lids, cn = _centroid_matrix(centroids)
        cdim = cn.shape[1]

        @F.pandas_udf("array<struct<ccos: double, list_id: int>>")
        def top_lists(vs: pd.Series) -> pd.Series:
            n = len(vs)
            if n == 0:
                return pd.Series([], dtype=object)
            out = [None] * n
            mask = np.fromiter(
                (v is not None and len(v) == cdim for v in vs),
                dtype=bool, count=n,
            )
            if mask.any():
                V = np.array([v for v, m in zip(vs, mask) if m], dtype="float64")
                vn = np.linalg.norm(V, axis=1)
                vn[vn == 0] = 1.0
                sims = (V / vn[:, None]) @ cn.T
                kk = min(n_probe, sims.shape[1])
                j = 0
                for i in range(n):
                    if not mask[i]:
                        continue
                    order = np.lexsort((-lids, -sims[j]))[:kk]
                    out[i] = [
                        (float(sims[j][o]), int(lids[o])) for o in order
                    ]
                    j += 1
            return pd.Series(out)

        return (
            q_slim.withColumn("_p", F.explode(top_lists(F.col("qv"))))
            .select("query_id", "qv", F.col("_p.list_id").alias("list_id"),
                    F.col("_p.ccos").alias("ccos"))
        )
    cent_arr_df = centroids.agg(
        F.array_sort(F.collect_list(F.struct("list_id", "centroid"))).alias("_cents")
    )
    scored_cents = F.transform(
        F.col("_cents"),
        lambda s: F.struct(
            cosine_similarity(F.col("qv"), s["centroid"]).alias("ccos"),
            s["list_id"].alias("list_id"),
        ),
    )
    return (
        q_slim
        .crossJoin(F.broadcast(cent_arr_df))
        .withColumn(
            "_p",
            F.explode(F.slice(F.sort_array(scored_cents, asc=False), 1, n_probe)),
        )
        .select("query_id", "qv", F.col("_p.list_id").alias("list_id"),
                F.col("_p.ccos").alias("ccos"))
    )


def sharded_ivf_ann_topk(
    queries: DataFrame,
    index: list[tuple[DataFrame, DataFrame]],
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 8,
    broadcast_queries: bool = True,
    scorer: str = "auto",
) -> DataFrame:
    """Approximate top-k over a :func:`build_sharded_ivf_index` /
    :func:`load_sharded_ivf_index` shard list with a GLOBAL probe budget:
    every shard's centroids score the query, the best ``n_probe`` lists
    ACROSS ALL SHARDS are probed (not n_probe per shard — a per-shard
    budget would make read volume grow linearly with the shard count),
    candidates are scored exactly within the probed lists, and the final
    top-k merges across shards.

    READ-VOLUME BOUND: probed rows per query = n_probe × avg list
    occupancy. With 'auto' build sizing occupancy is capped at ~4096
    vectors/list however large the corpus (the shard cap IS the clamp
    boundary), so per-query reads are bounded at ~n_probe × 4096 rows at
    ANY corpus size — vs the flat clamped index whose probed rows grow as
    n_probe · n/4096 (SCALE.md r11: 39k rows/query at 20M and climbing
    linearly). The global selection is a union of per-shard top-n_probe
    candidate lists (each shard's top-n_probe is a superset of its
    contribution to the global top-n_probe — no candidate is lost) ranked
    by centroid cosine in one window.

    DRIVER BOUND: with ``scorer='arrow'`` each shard's probe matmul ships
    that shard's centroid matrix in its own UDF closure — each checked
    against the per-index 256 MiB budget; the driver transiently holds
    n_shards × (per-shard matrix) while the plan is built (at 'auto'
    sizing ≤ 25 MiB/shard at 768-dim — 60 shards ≈ 1.5 GiB; for extreme
    shard counts force ``scorer='hof'``, whose centroids ride broadcast
    one-row arrays, never the driver). Same small-query broadcast
    contract as :func:`ivf_ann_topk` (``broadcast_queries=False`` pins
    sort-merge candidate joins for corpus-scale probe sets).

    n_shards=1 degenerates EXACTLY to ``ivf_ann_topk(index=...)`` —
    same probes, same scores, same rows (pinned by test); n_probe ≥ total
    lists degenerates to exact brute force.
    """
    if not index:
        raise ValueError("sharded_ivf_ann_topk: empty shard list")
    q_slim = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).filter(F.col("qv").isNotNull())
    use = resolve_scorer(scorer, q_slim, "qv")
    probe_parts = []
    for s, (centroids, _assignments) in enumerate(index):
        probe_parts.append(
            _shard_probes(
                q_slim, centroids, n_probe=n_probe, use=use, budget_check=True
            ).withColumn("shard", F.lit(s))
        )
    all_probes = probe_parts[0]
    for p in probe_parts[1:]:
        all_probes = all_probes.unionByName(p)
    # global probe budget: keep the best n_probe (query, list) pairs across
    # shards by centroid cosine. Tie order (ccos desc, shard asc, list_id
    # desc) is deterministic; at 1 shard it reduces to the flat path's
    # (cos desc, list_id desc) struct-max parity order.
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("shard"), F.desc("list_id")
    )
    probes = (
        all_probes.withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "shard", "list_id")
    )
    if len(index) > 1:
        # materialize the globally-ranked probe set ONCE: every shard's
        # candidate branch below consumes `probes`, and Spark does NOT
        # reuse the ranking window's exchange across the branches
        # (measured: 0 ReusedExchange at 3 shards, the whole probe
        # subtree replanned per branch) — without this pin probe work is
        # recomputed per shard, O(n_shards²) at high shard counts. The
        # set is tiny (n_queries × n_probe rows, the query vector riding
        # along); the lazy local checkpoint computes it at the first
        # action, after which all branches read the materialized blocks
        # (plan-pinned by test: one row_number window, per-branch
        # ExistingRDD scans). The 1-shard path skips it so the flat
        # bit-for-bit degeneration keeps the flat plan too.
        probes = probes.localCheckpoint(eager=False)
    cand_parts = []
    for s, (_centroids, assignments) in enumerate(index):
        p_s = probes.filter(F.col("shard") == s).drop("shard")
        p_side = F.broadcast(p_s) if broadcast_queries else p_s.hint("merge")
        cand_parts.append(
            p_side.join(
                assignments.filter(F.col("list_id").isNotNull()).select(
                    F.col(corpus_id).alias("neighbor_id"),
                    F.col(vec_col).alias("cv"),
                    "list_id",
                ),
                "list_id",
            )
            .filter(
                (F.col("query_id") != F.col("neighbor_id"))
                & (F.size("qv") == F.size("cv"))
            )
            .select("query_id", "neighbor_id", "qv", "cv")
        )
    cand = cand_parts[0]
    for c in cand_parts[1:]:
        cand = cand.unionByName(c)
    scored = cand.select(
        "query_id", "neighbor_id", cosine_score_col(use).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def persist_sharded_ivf_index(
    index: list[tuple[DataFrame, DataFrame]],
    path: str,
    *,
    mode: str = "error",
) -> None:
    """Write a :func:`build_sharded_ivf_index` shard list to ``path``:
    one standard :func:`persist_ivf_index` tree per shard under
    ``{path}/shard=<s>/`` (each with the repartition-by-list_id one-file-
    per-directory layout and its own manifest) plus a top-level
    ``{path}/meta`` manifest recording the shard count — so a loader
    can't silently read a partial shard set as a complete index."""
    if not index:
        raise ValueError("persist_sharded_ivf_index: empty shard list")
    spark = index[0][0].sparkSession
    # r14 optimization (guide §2.6): per-shard trees are disjoint
    # directories — write them concurrently from a small thread pool so
    # one shard's write tail back-fills with the next shard's jobs (the
    # top-level manifest still lands LAST, so a reader can never see a
    # complete manifest over an incomplete shard set).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(index), 4)) as pool:
        list(pool.map(
            lambda sp: persist_ivf_index(sp[1], f"{path}/shard={sp[0]:05d}", mode=mode),
            enumerate(index),
        ))
    meta = Row(format="sharded_ivf", version=1, n_shards=len(index))
    fsio.write_json_dir(f"{path}/meta", meta.asDict(), mode=mode, spark=spark)


def load_sharded_ivf_index(
    spark: SparkSession,
    path: str,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
) -> list[tuple[DataFrame, DataFrame]]:
    """Read a :func:`persist_sharded_ivf_index` tree back as the shard
    list :func:`sharded_ivf_ann_topk` takes. Every shard named by the
    top-level manifest must load (a missing shard raises via the
    per-shard manifest read — never a silently smaller index)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivf":
        raise ValueError(
            f"load_sharded_ivf_index: {path}/meta is not a sharded IVF manifest"
        )
    return [
        load_ivf_index(spark, f"{path}/shard={s:05d}", corpus_id=corpus_id, vec_col=vec_col)
        for s in range(int(meta["n_shards"]))
    ]


def append_to_sharded_ivf_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
    dedupe: bool = False,
) -> int:
    """Append a batch to a persisted :func:`persist_sharded_ivf_index`
    tree: each vector routes to its shard by the SAME deterministic
    ``pmod(xxhash64(id), n_shards)`` split the build used (so appended
    rows live exactly where a rebuild would put them and the disjoint-
    cover invariant holds), then the per-shard :func:`append_to_ivf_index`
    assigns it against that shard's frozen centroids. Returns total rows
    appended. ``dedupe=True`` is delegated per shard — the anti-join scans
    only the ONE shard a routed id could already live in, so the replay
    cost stays O(batch + one shard's ids), not O(corpus)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivf":
        raise ValueError(
            f"append_to_sharded_ivf_index: {path}/meta is not a sharded IVF manifest"
        )
    n_shards = int(meta["n_shards"])
    # the shard manifests record the stored id column; routing needs the
    # CALLER's id column name
    shard0 = fsio.read_json_dir(f"{path}/shard=00000/meta", spark=spark)
    id_in = corpus_id or shard0["corpus_id"]
    # pin the batch ONCE before the per-shard loop: each shard's filter
    # re-evaluates new_vectors, so a non-deterministic batch could route
    # a row to two shards (or none) and break the disjoint-cover
    # invariant; the checkpoint makes the loop read one materialized
    # O(batch) row set n_shards times instead of re-scanning the source
    if n_shards > 1:
        new_vectors = new_vectors.localCheckpoint(eager=True)
    total = 0
    for s in range(n_shards):
        part = new_vectors.filter(
            F.pmod(F.xxhash64(F.col(id_in)), F.lit(n_shards)) == s
        )
        total += append_to_ivf_index(
            spark, f"{path}/shard={s:05d}", part,
            corpus_id=corpus_id, vec_col=vec_col, dedupe=dedupe,
        )
    return total


def compact_sharded_ivf_index(spark: SparkSession, path: str) -> None:
    """Per-shard :func:`compact_ivf_index` over a persisted sharded tree
    (each shard's swap is independent and independently repairable)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivf":
        raise ValueError(
            f"compact_sharded_ivf_index: {path}/meta is not a sharded IVF manifest"
        )
    for s in range(int(meta["n_shards"])):
        compact_ivf_index(spark, f"{path}/shard={s:05d}")


def repair_sharded_ivf_index(spark: SparkSession, path: str) -> bool:
    """Per-shard :func:`repair_ivf_index` over a persisted sharded tree:
    finish any shard's compaction swap that crashed between its two
    renames. Returns True when at least one shard was repaired. Every
    shard is visited (a multi-shard compaction can tear more than one
    swap if the maintenance job died mid-loop)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivf":
        raise ValueError(
            f"repair_sharded_ivf_index: {path}/meta is not a sharded IVF manifest"
        )
    repaired = False
    for s in range(int(meta["n_shards"])):
        repaired = repair_ivf_index(spark, f"{path}/shard={s:05d}") or repaired
    return repaired


def sharded_ivf_index_stats(
    index: list[tuple[DataFrame, DataFrame]], *, skew_threshold: float = 4.0
) -> DataFrame:
    """Occupancy report for a sharded IVF index: one row per shard (the
    rebuild/reshard gauge per :func:`ivf_index_stats`) plus a GLOBAL row
    (``shard = -1``) aggregated over every (shard, list) — the number the
    query path's read volume actually follows, since the global probe
    budget picks lists across shards. A single hot list in ONE shard
    shows in both its shard row and the global max."""
    if not index:
        raise ValueError("sharded_ivf_index_stats: empty shard list")
    occ = None
    for s, (_cents, asg) in enumerate(index):
        o = (
            asg.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("occ"))
            .withColumn("shard", F.lit(s))
        )
        occ = o if occ is None else occ.unionByName(o)

    def summarize(grouped):
        return grouped.agg(
            F.count(F.when(F.col("list_id").isNotNull(), 1)).cast("int").alias("n_lists_used"),
            F.sum("occ").cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("list_id").isNull(), F.col("occ"))), F.lit(0)
            ).cast("long").alias("null_rows"),
            F.coalesce(
                F.max(F.when(F.col("list_id").isNotNull(), F.col("occ"))), F.lit(0)
            ).cast("long").alias("max_occupancy"),
            F.coalesce(
                F.round(F.avg(F.when(F.col("list_id").isNotNull(), F.col("occ"))), 2),
                F.lit(0.0),
            ).alias("avg_occupancy"),
        ).select(
            "*",
            F.when(
                F.col("avg_occupancy") > 0,
                F.round(F.col("max_occupancy") / F.col("avg_occupancy"), 3),
            ).otherwise(F.lit(0.0)).alias("skew"),
            F.when(
                F.col("avg_occupancy") > 0,
                F.col("max_occupancy") / F.col("avg_occupancy")
                > F.lit(skew_threshold),
            ).otherwise(F.lit(False)).alias("rebalance_recommended"),
        )

    per_shard = summarize(occ.groupBy("shard"))
    total = summarize(occ.withColumn("shard", F.lit(-1)).groupBy("shard"))
    cols = [
        "shard", "n_lists_used", "n_rows", "null_rows",
        "max_occupancy", "avg_occupancy", "skew", "rebalance_recommended",
    ]
    return per_shard.select(*cols).unionByName(total.select(*cols)).orderBy("shard")


def index_layout_stats(
    spark: SparkSession, path: str, tree: str = "assignments"
) -> dict:
    """Files-per-directory gauge for a persisted index tree — the
    COMPACTION-due signal :func:`index_maintenance_plan` consumes:
    K appends leave K+1 files in every touched directory, and probe cost
    at query time pays one seek per file per probed list
    (:func:`compact_ivf_index` docstring). Pure metadata: a recursive
    driver-side listing through the index's own filesystem
    (``sources.fsio`` — works on any Hadoop FS), bounded by the 4096-list
    clamp at ≤ ~4k directories per tree, one listStatus per directory —
    a maintenance-window cost, never a query-path one; no data file is
    opened. Returns ``{n_dirs, n_files, max_files_per_dir,
    avg_files_per_dir}`` over directories that hold at least one parquet
    file (LSH's two-level ``tbl=/_bpfx=`` layout walks the same way).
    Feed the max into the plan:
    ``stats.withColumn('files_per_dir', F.lit(ls['max_files_per_dir']))``.
    """
    per_dir: list[int] = []

    def walk(d: str) -> None:
        names = fsio.list_names(d, spark=spark)
        k = sum(1 for n in names if n.endswith(".parquet"))
        if k:
            per_dir.append(k)
        for n in names:
            # Skip markers/hidden/data files by NAME (cheap) but decide
            # directory-ness by an actual is_dir check — a "no dot in the
            # name" heuristic would silently skip partition directories
            # whose VALUE contains a dot (float/string partition columns),
            # understating files_per_dir and suppressing compact_due.
            if n.startswith(("_", ".")) or n.endswith(".parquet"):
                continue
            sub = f"{d}/{n}"
            if fsio.is_dir(sub, spark=spark):
                walk(sub)

    root = f"{path}/{tree}"
    if not fsio.exists(root, spark=spark):
        raise ValueError(f"index_layout_stats: no tree at {root}")
    walk(root)
    n_files = sum(per_dir)
    return {
        "n_dirs": len(per_dir),
        "n_files": n_files,
        "max_files_per_dir": max(per_dir) if per_dir else 0,
        "avg_files_per_dir": round(n_files / len(per_dir), 2) if per_dir else 0.0,
    }


def index_maintenance_plan(
    stats: DataFrame,
    *,
    skew_threshold: float = 4.0,
    max_files_per_dir: int = 8,
    max_null_frac: float = 0.01,
    min_rows_for_rebuild: int = 100_000,
) -> DataFrame:
    """Turn the maintenance GAUGES (:func:`ivf_index_stats` /
    :func:`sharded_ivf_index_stats`, optionally joined with
    :func:`index_layout_stats`'s ``files_per_dir``) into a tested POLICY:
    every input row gains an ``action`` — ``append_ok`` | ``compact_due``
    | ``rebuild_due`` — and a ``reasons`` array naming each fired signal,
    so the daily-crawl loop can branch on a contract instead of
    eyeballing skew numbers.

    THRESHOLDS AND THE MEASURED ECONOMICS they encode (SCALE.md r12: a
    10% increment appends at 0.176× the rebuild cost; compaction is one
    repartition of the tree; rebuild is a full corpus k-means pass):

    - ``append_ok`` is the DEFAULT — appending stays O(batch) however
      large the corpus, so nothing cheaper exists while the layout and
      occupancy hold;
    - ``compact_due`` when ``files_per_dir`` exceeds
      ``max_files_per_dir``: query probe cost pays one seek per file per
      probed list, so K appends multiply seeks by K+1; compaction
      restores one file per directory for one tree rewrite. Rows without
      a ``files_per_dir`` column never fire this (the gauge wasn't
      joined — the plan does not guess);
    - ``rebuild_due`` (wins over compact — the rebuild rewrites the
      layout anyway) when ``skew`` exceeds ``skew_threshold`` on an
      index of at least ``min_rows_for_rebuild`` rows: appends assign to
      FROZEN centroids, so corpus drift concentrates growth in few lists
      and query latency degrades as MAX occupancy, not corpus size — the
      one failure appending can never fix. The row floor keeps small
      indexes (where skew is sampling noise and a rebuild is cheap but
      pointless) on the append path;
    - ``null_vector_rate`` (``null_rows/n_rows`` over ``max_null_frac``)
      is reported as a REASON but never escalates the action: malformed
      vectors park on the null list by contract (never probed, never
      dropped) and no maintenance op repairs them — the signal routes to
      the ingest side, not the index.

    Pure column arithmetic on an already-tiny stats table — no shuffle,
    no job; sharded per-shard rows (including the ``shard = -1`` global)
    each get their own verdict, so one skewed shard can be rebuilt alone.
    """
    for need in ("n_rows", "null_rows", "skew"):
        if need not in stats.columns:
            raise ValueError(
                f"index_maintenance_plan: stats is missing column {need!r} "
                "(expected an ivf_index_stats/sharded_ivf_index_stats row set)"
            )
    files = (
        F.col("files_per_dir")
        if "files_per_dir" in stats.columns
        else F.lit(None).cast("int")
    )
    skew_fired = (F.col("skew") > F.lit(skew_threshold)) & (
        F.col("n_rows") >= F.lit(min_rows_for_rebuild)
    )
    compact_fired = files > F.lit(max_files_per_dir)
    nulls_fired = (
        F.col("null_rows") / F.greatest(F.col("n_rows"), F.lit(1))
    ) > F.lit(max_null_frac)
    reasons = F.array_compact(
        F.array(
            F.when(skew_fired, F.lit("occupancy_skew")),
            F.when(compact_fired, F.lit("files_per_dir")),
            F.when(nulls_fired, F.lit("null_vector_rate")),
        )
    )
    action = (
        F.when(skew_fired, F.lit("rebuild_due"))
        .when(compact_fired, F.lit("compact_due"))
        .otherwise(F.lit("append_ok"))
    )
    return stats.select(
        "*", action.alias("action"), reasons.alias("reasons")
    )


# ---------------------- maintenance-plan executor ----------------------
#
# index_maintenance_plan emits {append_ok, compact_due, rebuild_due};
# compact_due has had consumers since r12 (compact_*_index, and the
# streaming sink's compact_every='auto') but rebuild_due had NONE — the
# one verdict an operator had to execute by hand. apply_maintenance_plan
# closes the loop: gauge → plan → execute, with rebuilds running at the
# POLICY's granularity (a sharded index rebuilds only the flagged shard —
# the shard's own stored vectors are its corpus, so no source scan and no
# other shard is touched).

REBUILD_COMMIT_MARKER = "_REBUILD_META"


def _rebuilt_swap(spark: SparkSession, live: str) -> None:
    """Swap a fully-written ``{live}__rebuilt`` index directory into
    place: stamp it committed, retire the live dir, rename in, delete the
    retired copy — the :func:`_commit_swap` discipline at whole-index-
    directory granularity (a rebuild replaces centroids + data tree +
    manifest together; swapping them tree-by-tree could tear into a
    mixed-generation index)."""
    rebuilt, retired = f"{live}__rebuilt", f"{live}__retired"
    fsio.write_text_atomic(
        f"{rebuilt}/{REBUILD_COMMIT_MARKER}", "1", spark=spark
    )
    fsio.rename(live, retired, spark=spark)
    fsio.rename(rebuilt, live, spark=spark)
    fsio.delete(retired, spark=spark)


def repair_index_rebuild(spark: SparkSession, path: str) -> bool:
    """Finish a rebuild swap that crashed between its renames: if the
    live index directory is missing but a COMMITTED ``__rebuilt`` sibling
    exists, rename it in (and drop any ``__retired`` copy). Returns True
    when a repair ran. Dispatched automatically at the top of
    :func:`apply_maintenance_plan` for the index and (sharded) every
    shard directory; a reader that finds the live path missing mid-swap
    fails loudly and the next executor run heals it."""
    rebuilt, retired = f"{path}__rebuilt", f"{path}__retired"
    if fsio.exists(path, spark=spark):
        # a crash BEFORE the first rename leaves live intact — any
        # committed-or-not __rebuilt sibling is superseded residue
        return False
    if fsio.exists(f"{rebuilt}/{REBUILD_COMMIT_MARKER}", spark=spark):
        fsio.rename(rebuilt, path, spark=spark)
        fsio.delete(retired, spark=spark)
        return True
    if fsio.exists(retired, spark=spark):
        raise ValueError(
            f"repair_index_rebuild: {path} is missing with no committed "
            f"__rebuilt tree — the retired copy at {retired} was not "
            "superseded; restore it manually (resurrecting automatically "
            "could mask a half-written rebuild)."
        )
    return False


def _rebuild_ivf_like(spark: SparkSession, live: str, kind: str) -> None:
    """Rebuild one flat IVF or IVF-PQ index directory from its OWN stored
    vectors (entries/assignments carry (id, vec) — no source corpus
    needed), into ``{live}__rebuilt``, then swap. Training params come
    from the manifest; n_lists is re-derived with the build's 'auto'
    sizing from the CURRENT row count — the drifted corpus is usually
    bigger than the one the frozen centroids were sized for, which is
    half of why it skewed."""
    meta = fsio.read_json_dir(f"{live}/meta", spark=spark)
    rebuilt = f"{live}__rebuilt"
    fsio.delete(rebuilt, spark=spark)  # uncommitted residue
    if kind == "ivf":
        assignments = spark.read.parquet(f"{live}/assignments")
        corpus = assignments.select(meta["corpus_id"], meta["vec_col"])
        persist_ivf_index(
            build_ivf_index(
                corpus, corpus_id=meta["corpus_id"], vec_col=meta["vec_col"],
                n_lists="auto",
            ),
            rebuilt,
        )
    elif kind == "ivfpq":
        entries = spark.read.parquet(f"{live}/entries")
        corpus = entries.select(meta["corpus_id"], meta["vec_col"])
        persist_ivfpq_index(
            build_ivfpq_index(
                corpus, corpus_id=meta["corpus_id"], vec_col=meta["vec_col"],
                n_lists="auto", m=int(meta["m"]), pq_k=int(meta["pq_k"]),
                scale_bits=int(meta["scale_bits"]), hash_fn=meta["hash_fn"],
                normalize=bool(meta["normalize"]),
            ),
            rebuilt,
            m=int(meta["m"]), pq_k=int(meta["pq_k"]),
            scale_bits=int(meta["scale_bits"]), hash_fn=meta["hash_fn"],
            normalize=bool(meta["normalize"]),
        )
    else:
        raise ValueError(f"_rebuild_ivf_like: unsupported kind {kind!r}")
    _rebuilt_swap(spark, live)


def _rebuild_ivfpq_shard_frozen_codes(spark: SparkSession, live: str) -> None:
    """Rebuild ONE sharded-IVF-PQ shard's IVF half from its own stored
    vectors while keeping every row's PQ codes VERBATIM: codes depend
    only on the (shared, frozen) codebook, not on list assignment, so a
    shard rebuild re-clusters its inverted lists without retraining PQ —
    retraining per shard would fork the shared codebook and break the
    one-ADC-table-per-query contract. (A FLAT ivfpq rebuild retrains
    both quantizers — there is no sharing to preserve and the drifted
    distribution deserves fresh codes; see :func:`_rebuild_ivf_like`.)"""
    meta = fsio.read_json_dir(f"{live}/meta", spark=spark)
    rebuilt = f"{live}__rebuilt"
    fsio.delete(rebuilt, spark=spark)
    entries = spark.read.parquet(f"{live}/entries")
    id_col, v_col = meta["corpus_id"], meta["vec_col"]
    new_cents, asg = build_ivf_index(
        entries.select(id_col, v_col), corpus_id=id_col, vec_col=v_col,
        n_lists="auto", hash_fn=meta["hash_fn"],
    )
    new_entries = asg.join(
        entries.select(id_col, "codes"), id_col, "left"
    ).select(id_col, v_col, "list_id", "codes")
    persist_ivfpq_index(
        (new_cents, spark.read.parquet(f"{live}/pq_centroids"), new_entries),
        rebuilt,
        m=int(meta["m"]), pq_k=int(meta["pq_k"]),
        scale_bits=int(meta["scale_bits"]), hash_fn=meta["hash_fn"],
        normalize=bool(meta["normalize"]),
    )
    _rebuilt_swap(spark, live)


def _rebuild_lsh(spark: SparkSession, live: str) -> None:
    """Rebuild an LSH index directory from its own stored vectors with a
    FRESH plane set — the LSH cure for occupancy skew (frozen planes no
    longer separating a drifted corpus): seed advances by one and the
    plane count re-derives from the current corpus size
    (:func:`auto_planes`, floored at the stored count). Queries keep
    working unchanged because they splat ``load_lsh_index``'s params,
    which the rebuilt manifest updates."""
    meta = fsio.read_json_dir(f"{live}/meta", spark=spark)
    buckets = spark.read.parquet(f"{live}/buckets")
    if "cv" not in buckets.columns:
        raise ValueError(
            "_rebuild_lsh: the stored bucket table has no vector column "
            "('cv') — this index cannot be rebuilt from itself; "
            "re-bucketize from the source corpus."
        )
    corpus = buckets.filter(F.col("tbl") == 0).select(
        F.col("neighbor_id").alias("_id"), F.col("cv")
    )
    n_planes = max(int(meta["n_planes"]), auto_planes(corpus.count()))
    n_tables, seed = int(meta["n_tables"]), int(meta["seed"]) + 1
    rebuilt = f"{live}__rebuilt"
    fsio.delete(rebuilt, spark=spark)
    persist_lsh_index(
        bucketize_tables(
            corpus, id_col="_id", id_name="neighbor_id", vec_col="cv",
            keep_vec="cv", n_tables=n_tables, n_planes=n_planes, seed=seed,
        ),
        rebuilt, n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
    _rebuilt_swap(spark, live)


def _gauge_rows(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Occupancy stats + files_per_dir layout gauge for one persisted
    index, shaped for :func:`index_maintenance_plan`. Sharded trees get
    per-shard rows (shard 0..n-1) plus the global shard = -1 row, each
    carrying its OWN shard's layout gauge (the global row carries the
    max) — so the plan can single out one shard."""
    if kind == "ivf":
        stats = ivf_index_stats(spark.read.parquet(f"{path}/assignments"))
        files = index_layout_stats(spark, path, "assignments")
    elif kind == "ivfpq":
        stats = ivf_index_stats(spark.read.parquet(f"{path}/entries"))
        files = index_layout_stats(spark, path, "entries")
    elif kind == "lsh":
        stats = lsh_index_stats(spark.read.parquet(f"{path}/buckets"))
        files = index_layout_stats(spark, path, "buckets")
    elif kind == "pq":
        # PQ has no occupancy gauge (ADC reads every code row by design);
        # synthesize the occupancy columns as healthy so only the layout
        # rule can fire
        meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
        n = spark.read.parquet(f"{path}/codes").count() // int(meta["m"])
        stats = spark.createDataFrame(
            [(int(n), 0, 0.0)], "n_rows long, null_rows long, skew double"
        )
        files = index_layout_stats(spark, path, "codes")
    elif kind in ("sharded_ivf", "sharded_ivfpq"):
        if kind == "sharded_ivf":
            idx = load_sharded_ivf_index(spark, path)
            tree = "assignments"
        else:
            (_pqc, idx), _params = load_sharded_ivfpq_index(spark, path)
            tree = "entries"
        per_stats = sharded_ivf_index_stats(idx)
        per_files = {
            s: index_layout_stats(
                spark, f"{path}/shard={s:05d}", tree
            )["max_files_per_dir"]
            for s in range(len(idx))
        }
        per_files[-1] = max(per_files.values())
        fmap = F.create_map(
            *[F.lit(x) for kv in per_files.items() for x in kv]
        )
        return per_stats.withColumn(
            "files_per_dir", F.element_at(fmap, F.col("shard")).cast("int")
        )
    else:
        raise ValueError(f"_gauge_rows: unsupported kind {kind!r}")
    return stats.withColumn(
        "files_per_dir", F.lit(files["max_files_per_dir"]).cast("int")
    )


def apply_maintenance_plan(
    spark: SparkSession,
    path: str,
    *,
    skew_threshold: float = 4.0,
    max_files_per_dir: int = 8,
    max_null_frac: float = 0.01,
    min_rows_for_rebuild: int = 100_000,
    dry_run: bool = False,
) -> DataFrame:
    """Gauge → plan → EXECUTE for one persisted ANN index (any family —
    the kind is read from the manifest): compute the occupancy and
    layout gauges, run :func:`index_maintenance_plan` over them, and
    execute each verdict row —

    - ``compact_due`` → the kind's ``compact_*_index`` (per-shard for a
      sharded tree: only the flagged shard's directory is rewritten);
    - ``rebuild_due`` → rebuild FROM THE INDEX'S OWN STORED VECTORS into
      a ``__rebuilt`` sibling, committed and swapped in whole
      (:func:`_rebuilt_swap` — a torn swap heals via
      :func:`repair_index_rebuild`, dispatched at the top of every run).
      Sharded: ONLY the flagged shard rebuilds — its assignments are its
      corpus, so the rebuild reads one shard and touches nothing else
      (the per-shard granularity the policy docstring promises). The
      global ``shard = -1`` row is never executed directly — the
      per-shard rows are the actionable granularity (a global-only
      firing means cross-shard imbalance no single-shard action fixes;
      it stays visible in the returned report);
    - ``append_ok`` → nothing.

    Returns the plan rows plus an ``executed`` column (``compacted`` |
    ``rebuilt`` | ``none``; with ``dry_run=True`` nothing runs and the
    column says what WOULD run — the report is the contract either way).
    Thresholds pass through to the policy unchanged. PQ trees have no
    occupancy gauge (ADC reads every code row by design) so only their
    layout rule can fire; LSH rebuilds re-derive the plane set
    (:func:`_rebuild_lsh`). This is the OFFLINE maintenance loop — the
    streaming sink intentionally executes only the compact rule live and
    surfaces rebuild_due to a callback (``on_rebuild_due``)."""
    repair_index_rebuild(spark, path)
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] not in (
        "ivf", "lsh", "pq", "ivfpq", "sharded_ivf", "sharded_ivfpq"
    ):
        raise ValueError(
            f"apply_maintenance_plan: {path}/meta is not an ANN index manifest"
        )
    kind = meta["format"]
    if kind in ("sharded_ivf", "sharded_ivfpq"):
        for s in range(int(meta["n_shards"])):
            repair_index_rebuild(spark, f"{path}/shard={s:05d}")
    plan_df = index_maintenance_plan(
        _gauge_rows(spark, path, kind),
        skew_threshold=skew_threshold,
        max_files_per_dir=max_files_per_dir,
        max_null_frac=max_null_frac,
        min_rows_for_rebuild=min_rows_for_rebuild,
    )
    plan_rows = plan_df.collect()

    def run(action: str, shard: int | None) -> str:
        if dry_run:
            return {"rebuild_due": "rebuilt", "compact_due": "compacted"}.get(
                action, "none"
            )
        if kind in ("sharded_ivf", "sharded_ivfpq"):
            if shard is None or shard < 0:
                return "none"  # the global row is a report, not a target
            sdir = f"{path}/shard={shard:05d}"
            if action == "rebuild_due":
                if kind == "sharded_ivf":
                    _rebuild_ivf_like(spark, sdir, "ivf")
                else:
                    _rebuild_ivfpq_shard_frozen_codes(spark, sdir)
                return "rebuilt"
            if action == "compact_due":
                {
                    "sharded_ivf": compact_ivf_index,
                    "sharded_ivfpq": compact_ivfpq_index,
                }[kind](spark, sdir)
                return "compacted"
            return "none"
        if action == "rebuild_due":
            if kind in ("ivf", "ivfpq"):
                _rebuild_ivf_like(spark, path, kind)
            elif kind == "lsh":
                _rebuild_lsh(spark, path)
            else:  # pq: unreachable (skew synthesized 0) — keep loud
                raise ValueError(
                    "apply_maintenance_plan: rebuild_due on a PQ tree "
                    "has no occupancy basis"
                )
            return "rebuilt"
        if action == "compact_due":
            {
                "ivf": compact_ivf_index,
                "lsh": compact_lsh_index,
                "pq": compact_pq_index,
                "ivfpq": compact_ivfpq_index,
            }[kind](spark, path)
            return "compacted"
        return "none"

    out = [
        (*row, run(row["action"], row["shard"] if "shard" in row.__fields__ else None))
        for row in plan_rows
    ]
    # explicit schema (not inference — an all-append_ok report has empty
    # reasons arrays, which inference cannot type)
    schema = T.StructType(
        list(plan_df.schema.fields)
        + [T.StructField("executed", T.StringType(), False)]
    )
    return spark.createDataFrame(out, schema)


def quantize_int8(
    df: DataFrame, id_col: str, vec_col: str, *, out_col: str = "qvec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i * 127 /
    max|x|), scale stored alongside — a 4× storage/bandwidth cut for
    embedding tables (the compression every billion-vector ANN corpus
    applies before indexing; dequantized cosine error is bounded by
    ~1/127 per axis).

    Map-only HOF arithmetic, zero shuffle. max|x| is bound once per row
    (``bind_once`` discipline — a lambda reference would rescan the array
    per element). Zero vectors quantize to zeros with scale 0. Exactly
    reproducible cross-engine: max, one double division and ROUND are
    identical IEEE steps in Spark and DuckDB."""
    from ..operators.dedup import bind_once

    vec = F.col(vec_col)
    mx_expr = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    # one bind_once packs both outputs so the max is computed ONCE per row
    # (referencing a max expression inside the per-element lambda would
    # rescan the array per element — no CSE through HOFs)
    packed = bind_once(
        mx_expr,
        lambda m: F.struct(
            F.when(
                m > 0.0,
                F.transform(
                    vec,
                    lambda x: F.round(
                        x.cast("double") * F.lit(127.0) / m
                    ).cast("int"),
                ),
            )
            .otherwise(F.transform(vec, lambda x: F.lit(0)))
            .alias("q"),
            F.when(m > 0.0, m / F.lit(127.0)).otherwise(F.lit(0.0)).alias("s"),
        ),
    )
    return df.select(F.col(id_col), packed.alias("_p")).select(
        id_col,
        F.col("_p.q").alias(out_col),
        F.col("_p.s").cast("double").alias("scale"),
    )


def dequantize_int8(
    df: DataFrame, qvec_col: str = "qvec", scale_col: str = "scale",
    *, out_col: str = "vec"
) -> Column | DataFrame:
    """Inverse map: x̂_i = q_i * scale (map-only)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
        ),
    )


def l2_normalize(
    df: DataFrame, id_col: str, vec_col: str, *, out_col: str = "unit"
) -> DataFrame:
    """Unit-L2 vectors — the prerequisite for cosine-as-dot-product ANN
    (normalize once at ingest; every later distance is a plain dot).
    Map-only HOF arithmetic, zero shuffle; zero vectors stay zero.
    Returns doubles in ``out_col`` plus the original ``norm``."""
    from ..operators.dedup import bind_once

    vec = F.col(vec_col)
    norm_expr = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    packed = bind_once(
        norm_expr,
        lambda n: F.struct(
            F.when(
                n > 0.0, F.transform(vec, lambda x: x.cast("double") / n)
            )
            .otherwise(F.transform(vec, lambda x: F.lit(0.0)))
            .alias("u"),
            n.alias("n"),
        ),
    )
    return df.select(F.col(id_col), packed.alias("_p")).select(
        id_col, F.col("_p.u").alias(out_col), F.col("_p.n").alias("norm")
    )


def zscore_embeddings(
    df: DataFrame, id_col: str, vec_col: str, *, out_col: str = "zvec"
) -> DataFrame:
    """Per-DIMENSION standardization (x − μ_d)/σ_d — the feature-scaling
    step before clustering/IVF when dimensions carry unequal variance.

    Cross-engine-exact by construction: values are first quantized to
    2²⁰-scaled BIGINTs — the power-of-two scale makes `x · 2²⁰` EXACT in
    double (no new mantissa bits), and the shared away-from-zero ROUND
    gives both engines the identical integer; per-dimension Σx and Σx²
    are then exact integer sums (order-independent — a double sum is
    order-dependent and breaks hash equality; and decimal sums at scale
    18 fail differently: DuckDB's wide-decimal→double cast is 1 ulp off
    Java's), and μ, σ, z derive from those identical integers through an
    identical double chain (int64→double is correctly-rounded IEEE in
    both engines even past 2⁵³ — the `char_entropy` discipline).
    Constant dimensions (σ=0) yield 0. The 2⁻²⁰ quantization (≈1e-6,
    under float32's own noise floor for unit-range features) IS the
    operator's input contract, stated, not hidden.

    Shape: one posexplode to (dim, value) slim rows, one map-side-combined
    aggregate onto the |dim|-row grid, grid broadcast back, map-only z
    computation — embeddings themselves never shuffle.
    """
    q = float(1 << 20)
    pos = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("_d", "_x"),
    ).withColumn(
        "_xi", F.round(F.col("_x").cast("double") * F.lit(q)).cast("bigint")
    )
    grid = pos.groupBy("_d").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_xi").alias("_s"),
        F.sum(F.col("_xi") * F.col("_xi")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    grid = grid.select(
        "_d",
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"),
    )
    z = F.when(
        F.col("_std") > 0.0,
        (F.col("_xi").cast("double") - F.col("_mean")) / F.col("_std"),
    ).otherwise(F.lit(0.0))
    return (
        pos.join(F.broadcast(grid), "_d")
        .select(F.col(id_col), "_d", z.alias("_z"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_d", "_z"))),
                lambda s: s["_z"],
            ).alias(out_col)
        )
    )


def hashed_doc_embeddings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
    shingle_k: int = 2,
    hash_fn: str = "xx",
) -> DataFrame:
    """Model-free document embeddings by feature hashing (Weinberger et
    al., ICML'09): each k-word shingle hashes to a dimension (h % dim)
    with a ±1 sign from a second hash bit, vectors L2-normalized — the
    deterministic fallback embedding that makes the WHOLE similarity
    stack (cosine pairs, ANN, semantic dedup, int8 quantization)
    self-contained when no learned model is available, and a cheap
    candidate signal even when one is.

    Sparse-in-effect: only |shingles| additions per doc regardless of
    ``dim``. Map-only (tokenize → explode → per-(doc, dim) sums →
    regroup to a dense array); two shuffles keyed on doc — shingle
    strings never shuffle (8-byte hashes do).

    ``hash_fn='md5'`` uses the 60-bit md5 hash so DuckDB reproduces the
    vectors bit-for-bit (the cross-engine-oracle variant; 'xx' is the
    scale default). Empty docs yield the zero vector.
    """
    from ..operators.dedup import md5_60bit, tokenize, word_shingles

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    h = F.xxhash64 if hash_fn == "xx" else md5_60bit
    # no tokens -> no signal: filter BEFORE the shingle fallback would
    # hand an empty doc a single ''-shingle (zero vector via the empties
    # union below is the honest embedding of no content)
    sh = (
        df.filter(F.size(tokenize(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                word_shingles(tokenize(F.col(text_col)), shingle_k)
            ).alias("s"),
        )
        .select("doc", h(F.col("s")).alias("hv"))
    )
    # dimension = hv % dim; sign from the next bit of the same hash
    contrib = sh.select(
        "doc",
        F.pmod(F.col("hv"), F.lit(dim)).cast("int").alias("d"),
        F.when(
            F.pmod(F.expr("hv DIV " + str(dim)), F.lit(2)) == 0, F.lit(1)
        ).otherwise(F.lit(-1)).alias("sgn"),
    )
    sums = contrib.groupBy("doc", "d").agg(F.sum("sgn").alias("w"))
    dense = (
        sums.groupBy("doc")
        .agg(F.map_from_entries(F.collect_list(F.struct("d", "w"))).alias("_m"))
        .select(
            "doc",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("_m", i), F.lit(0)).cast("double"),
            ).alias("_v"),
        )
    )
    norm = F.sqrt(
        F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x * x)
    )
    unit = F.when(
        norm > 0.0, F.transform(F.col("_v"), lambda x: x / norm)
    ).otherwise(F.col("_v"))
    out = dense.select(F.col("doc").alias(id_col), unit.alias("embedding"))
    # docs with no shingles at all (empty text) still get a row
    empties = df.select(F.col(id_col)).join(
        out.select(id_col), id_col, "left_anti"
    ).select(
        F.col(id_col),
        F.array_repeat(F.lit(0.0), dim).alias("embedding"),
    )
    return out.unionByName(empties)


# --------------------------- product quantization ---------------------------


def _pq_hash(hash_fn: str, col: Column) -> Column:
    from .dedup import md5_60bit

    return F.xxhash64(col) if hash_fn == "xx" else md5_60bit(col.cast("string"))


def _pq_subslices(df: DataFrame, id_col: str, vec_col: str, m: int,
                  scale_bits: int, out_id: str) -> DataFrame:
    """(id, sub, svec) rows: the vector quantized to integer units and cut
    into ``m`` equal subspaces (dim must divide by m — checked per row;
    the check is fused into the slice-width expression so Catalyst cannot
    prune it, and a violating row fails the job rather than silently
    truncating the trailing dim % m dimensions)."""
    scale = F.lit(1 << scale_bits)
    qv = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale).cast("long"),
    )
    d_sub = (
        F.when(qv.isNull(), F.lit(None).cast("int"))  # null vec: propagate,
        # as before the check existed — a missing embedding is a data gap,
        # not a wrong-dimension config error
        .when(F.size(qv) % m == 0, (F.size(qv) / m).cast("int"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("PQ: vector dim "), F.size(qv).cast("string"),
                    F.lit(f" is not divisible by m={m}"),
                )
            ).cast("int")
        )
    )
    return df.select(
        F.col(id_col).alias(out_id), qv.alias("_qv"), d_sub.alias("_ds")
    ).select(
        out_id,
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("_ds").alias("_ds"),
        F.col("_qv").alias("_qv"),
    ).select(
        out_id, "sub",
        F.slice(
            "_qv", F.col("sub") * F.col("_ds") + F.lit(1), F.col("_ds")
        ).alias("svec"),
    )


def _pq_assign(
    slices: DataFrame, cents: DataFrame, id_name: str, kernel: str = "hof"
) -> DataFrame:
    """Nearest centroid per (id, sub): exact integer squared-L2 argmin,
    ties to the smaller centroid index. Centroids ride ONE broadcast row
    of (sub, idx, cvec) structs (the IVF plan-size discipline).

    ``kernel`` picks the execution path, NOT the semantics — both produce
    bit-identical (code, d2) (parity-tested, and the ``pq_ann_arrow``
    face hash-matches the HOF face's DuckDB oracle):

    - ``'hof'`` (this private helper's default): Catalyst higher-order-
      function expressions. Plan is plain SQL — replayable in DuckDB, no
      Python workers — but the argmin is interpreted per element
      (k × d_sub ops/row). The reference implementation and the oracle
      discipline's pedagogical path (the ``pq_ann`` face pins it).
    - ``'arrow'`` (the PUBLIC default on every builder/append/query
      entry point): :func:`_pq_assign_arrow` — one vectorized numpy
      int64 argmin per Arrow batch via ``mapInArrow``. The build-scale
      path: the corpus-encode pass at 2M × 768-dim drops from
      interpreted-HOF minutes to numpy-batch speed (pqassign probe,
      SCALE.md r14).
    """
    if kernel == "arrow":
        return _pq_assign_arrow(slices, cents, id_name)
    if kernel != "hof":
        raise ValueError(f"_pq_assign: unknown kernel {kernel!r}")
    cent_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("sub", "idx", "cvec"))).alias("_c")
    )
    mine = F.filter(F.col("_c"), lambda s: s["sub"] == F.col("sub"))
    best = F.array_min(
        F.transform(
            mine,
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with(F.col("svec"), s["cvec"], lambda a, b: a - b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x * x,
                ).alias("d2"),
                s["idx"].alias("idx"),
            ),
        )
    )
    return (
        slices.crossJoin(F.broadcast(cent_row))
        .withColumn("_b", best)
        .select(id_name, "sub", "svec",
                F.col("_b.idx").alias("code"), F.col("_b.d2").alias("d2"))
    )


# Same WeakKey precedent as _CENTROID_MATRIX_MEMO: the validated dense
# codebook block for the Arrow assign kernel, collected once per codebook
# OBJECT per run (the persisted/maintenance faces encode several batches
# against the same pinned codebook).
_PQ_CODEBOOK_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _pq_codebook_matrix(cents: DataFrame) -> tuple[int, int, int, np.ndarray]:
    """(m, k, d_sub, dense int64 (m,k,d_sub) block) off a PQ codebook
    table, fully validated; memoized per codebook object (immutable plan
    ⇒ identity implies identical rows; consumers never mutate the block)."""
    try:
        hit = _PQ_CODEBOOK_MEMO.get(cents)
    except TypeError:
        hit = None
    if hit is not None:
        return hit
    crows = cents.select("sub", "idx", "cvec").collect()
    if not crows:
        raise ValueError("_pq_assign_arrow: empty centroid table")
    by_sub: dict[int, list[tuple[int, list]]] = {}
    for r in crows:
        by_sub.setdefault(r["sub"], []).append((r["idx"], r["cvec"]))
    m = len(by_sub)
    k = len(by_sub[min(by_sub)])
    d_sub = len(crows[0]["cvec"])
    if sorted(by_sub) != list(range(m)):
        raise ValueError(
            f"_pq_assign_arrow: non-contiguous subspace ids {sorted(by_sub)}"
        )
    cmat = np.empty((m, k, d_sub), dtype=np.int64)
    for s, lst in by_sub.items():
        lst.sort(key=lambda t: t[0])
        if [i for i, _ in lst] != list(range(k)):
            raise ValueError(
                f"_pq_assign_arrow: sub {s} centroid idx set is not 0..{k - 1}"
            )
        for i, cv in lst:
            if len(cv) != d_sub:
                raise ValueError(
                    f"_pq_assign_arrow: centroid (sub={s}, idx={i}) width "
                    f"{len(cv)} != {d_sub}"
                )
            cmat[s, i, :] = cv
    val = (m, k, d_sub, cmat)
    try:
        _PQ_CODEBOOK_MEMO[cents] = val
    except TypeError:
        pass
    return val


def _pq_assign_arrow(slices: DataFrame, cents: DataFrame, id_name: str) -> DataFrame:
    """Arrow exact-int64 twin of the HOF assign path (see
    :func:`_pq_assign`): the same integer squared-L2 argmin with the same
    smaller-index tie rule, computed as ONE vectorized numpy pass per
    Arrow RecordBatch instead of an interpreted expression per element.

    Bit-parity argument (and why it holds exactly, not approximately):

    - the quantized slices are int64 and numpy int64 arithmetic is the
      same two's-complement domain as the JVM's BIGINT, so ``(x−c)²``
      sums are bit-identical, not float-close;
    - centroid rows are laid out sorted by idx, and ``argmin`` returns
      the FIRST minimum — exactly array_min's (d2, idx) lexicographic
      tie rule;
    - a null svec mirrors the HOF result shape for null vectors
      (code 0 — the all-null-d2 tie collapses to the smallest index —
      with a null d2).

    The centroid table is tiny by construction (m × k rows; 48 × 16 at
    768-dim) and rides to executors inside the task closure as one dense
    (m, k, d_sub) int64 block — the closure analogue of the HOF path's
    one-row broadcast. List values cross as flat Arrow int64 buffers
    (``mapInArrow``), so no per-row Python objects exist even at
    96M slice rows (2M × m=48).
    """
    import pyarrow as pa

    m, k, d_sub, cmat = _pq_codebook_matrix(cents)

    out_schema = T.StructType(
        list(slices.schema.fields)
        + [T.StructField("code", T.IntegerType()),
           T.StructField("d2", T.LongType())]
    )

    def kernel(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            sub_np = (
                rb.column(rb.schema.get_field_index("sub"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            sv = rb.column(rb.schema.get_field_index("svec"))
            null_mask = np.asarray(sv.is_null())
            code_out = np.zeros(n, dtype=np.int32)
            d2_out = np.zeros(n, dtype=np.int64)
            valid = ~null_mask
            nv = int(valid.sum())
            if nv:
                sv_valid = sv.filter(pa.array(valid)) if nv < n else sv
                flat = (
                    sv_valid.flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
                if flat.size != nv * d_sub:
                    raise ValueError(
                        "_pq_assign_arrow: slice width disagrees with the "
                        f"codebook's d_sub={d_sub} (got {flat.size} values "
                        f"for {nv} rows) — dim % m is checked upstream, so "
                        "this is a corpus/codebook mismatch"
                    )
                x = flat.reshape(nv, d_sub)
                diff = x[:, None, :] - cmat[sub_np[valid]]
                d2 = np.einsum("nkd,nkd->nk", diff, diff)
                code = d2.argmin(axis=1)
                code_out[valid] = code.astype(np.int32)
                d2_out[valid] = d2[np.arange(nv), code]
            cols = [rb.column(i) for i in range(rb.num_columns)]
            cols.append(pa.array(code_out, type=pa.int32()))
            cols.append(
                pa.array(d2_out, type=pa.int64(), mask=null_mask)
                if null_mask.any()
                else pa.array(d2_out, type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                cols, names=[f.name for f in out_schema.fields]
            )

    return slices.mapInArrow(kernel, out_schema).select(
        id_name, "sub", "svec", "code", "d2"
    )


def auto_pq_m(dim: int) -> int:
    """Subspace count for PQ ``m='auto'``: the divisor-of-dim subspace
    WIDTH closest to 16 (ties to the wider subspace — fewer codes), m =
    dim/width. 16 dims/subspace is the classic PQ operating point (Jégou
    et al. use 8–16): wider subspaces lose recall to quantization error,
    narrower ones inflate the code table. dim=64 → m=4 (the pinned
    default the oracled face uses); dim=768 → m=48; an awkward dim picks
    its nearest workable divisor (dim must divide by m — the per-row
    check in _pq_subslices stays the hard gate)."""
    if dim <= 0:
        raise ValueError(f"auto_pq_m: vector dim must be positive, got {dim}")
    widths = [w for w in range(1, dim + 1) if dim % w == 0]
    best = min(widths, key=lambda w: (abs(w - 16), -w))
    return dim // best


def _resolve_pq_m(m: int | str, corpus: DataFrame, vec_col: str) -> int:
    if m == "auto":
        row = (
            corpus.select(F.size(F.col(vec_col).cast("array<double>")).alias("d"))
            .filter(F.col("d").isNotNull())
            .first()
        )
        if row is None:
            raise ValueError("pq m='auto': corpus has no non-null vectors")
        return auto_pq_m(row["d"])
    if not isinstance(m, int):
        raise ValueError(f"m must be an int or 'auto', got {m!r}")
    return m


def pq_index(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    m: int | str = 4,
    k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    lloyd_iters: int = 1,
    assign_kernel: str = "arrow",
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization index (Jégou et al., TPAMI'11): cut each
    vector into ``m`` subspaces, k-means each subspace independently
    (deterministic seeding + ``lloyd_iters`` Lloyd steps; the oracled
    query face pins the default of one), store each vector as ``m``
    one-byte-ish centroid codes — the 100 TB ANN memory plan: 64 float
    dims become 4 codes (64× smaller candidate state than raw vectors).

    Returns ``(centroids, codes)``: centroids (sub, idx, cvec
    array<bigint>), codes (corpus_id, sub, code int).

    Everything runs in integer fixed point (2^scale_bits units, floored
    integer centroid means, exact BIGINT squared-L2, ties to the smaller
    index) so training, encoding and ADC scoring are bit-identical across
    engines, retries and partitionings — with ``hash_fn='md5'`` the WHOLE
    pipeline (seeding included) replays in DuckDB SQL and the ANN query
    is hash-exact oracled, the same discipline as `pagerank`/`bpe`.

    Shape: seeds = one k-row TakeOrderedAndProject; assign = map-side
    argmin against ONE broadcast centroid row; update = one
    (sub, idx, pos)-keyed slim aggregate. Nothing quadratic, vectors
    shuffle once per Lloyd step as (id, sub, 16-int) rows.

    ``m='auto'`` sizes the subspace count from the corpus vector width
    (one short-circuiting first() job; see :func:`auto_pq_m` — ~16 dims
    per subspace, the width where quantization error and code-table size
    balance). At 768-dim that is m=48: the ADC scan reads 48 ints per
    vector instead of 768 floats.

    ``assign_kernel`` ('arrow' default | 'hof') selects the argmin
    execution path for training and encoding — bit-identical results
    either way (see :func:`_pq_assign`, parity-tested and face-attested
    against the same DuckDB oracle); 'hof' keeps the whole plan in
    Catalyst expressions.
    """
    m = _resolve_pq_m(m, corpus, vec_col)
    slices = _pq_subslices(corpus, corpus_id, vec_col, m, scale_bits, "cid")
    seeds = (
        corpus.select(
            F.col(corpus_id).alias("cid"),
            _pq_hash(hash_fn, F.col(corpus_id)).alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(k)
        .select(
            "cid",
            (F.row_number().over(Window.orderBy("_h", "cid")) - 1)
            .cast("int").alias("idx"),
        )
    )
    centroids = (
        slices.join(F.broadcast(seeds), "cid")
        .select("sub", "idx", F.col("svec").alias("cvec"))
    )
    for _ in range(lloyd_iters):
        assigned = _pq_assign(slices, centroids, "cid", kernel=assign_kernel)
        # floored integer means keep centroids in the exact-integer
        # domain; clusters emptied by a Lloyd step keep their previous
        # centroid
        upd = (
            assigned.select(
                "sub", "code", F.posexplode("svec").alias("pos", "x")
            )
            .groupBy("sub", "code", "pos")
            .agg(
                F.floor(F.sum("x") / F.count(F.lit(1)))
                .cast("long").alias("cmean")
            )
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cmean"))),
                    lambda s: s["cmean"],
                ).alias("cvec_new")
            )
            .withColumnRenamed("code", "idx")
        )
        centroids = (
            centroids.join(upd, ["sub", "idx"], "left")
            .select("sub", "idx", F.coalesce("cvec_new", "cvec").alias("cvec"))
            .localCheckpoint(eager=False)  # truncate per-iteration lineage
        )
    codes = _pq_assign(slices, centroids, "cid", kernel=assign_kernel).select(
        F.col("cid").alias(corpus_id), "sub", "code"
    )
    return centroids, codes


def pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k_neighbors: int = 5,
    m: int | str = 4,
    k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    index: tuple[DataFrame, DataFrame] | None = None,
    assign_kernel: str = "arrow",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: per query, one (m × k) integer
    distance table against the trained centroids; every corpus vector is
    scored as the SUM of m table lookups through its stored codes — no
    corpus vector is ever touched at query time, which is the entire
    100 TB point (the scan reads 4 ints per vector, not 64 floats).

    Output: (query_id, neighbor_id, adc_dist, rank) — exact integer adc,
    rank by (adc asc, neighbor asc), self excluded. The lookup is a slim
    (sub, code) equi-join of the Q·m·k-row broadcast table against the
    N·m-row code table + one (query, neighbor) sum — shuffle rows carry
    three ints.

    ``m='auto'`` resolves from the CORPUS vector width (see
    :func:`auto_pq_m`) and the same count slices the queries, so the two
    sides always agree.

    ``index=(centroids, codes)`` (from :func:`pq_index` or
    :func:`load_pq_index`) skips the train+encode entirely — the
    build-once/query-many path. ``m``/``k``/``scale_bits``/``hash_fn``
    must then be the index's stored values (``load_pq_index`` hands them
    back as params to splat), and ``m`` must be the resolved int — the
    query slicing has no corpus to resolve ``'auto'`` against. ``m`` is
    VALIDATED against the index's centroid table (max(sub)+1 over m×k
    tiny rows — one trivial job) because a mismatched subspace count
    would not error: the query subslices of the wrong width zip_with the
    stored cvecs and null-pad the ADC arithmetic into silently wrong
    distances. ``scale_bits``/``hash_fn`` cannot be inferred from the
    tables (codes are dimensionless ints) — splatting ``load_pq_index``'s
    params is the contract that keeps them right."""
    if index is not None:
        if not isinstance(m, int):
            raise ValueError(
                "pq_ann_topk(index=...): pass the index's stored m "
                "(load_pq_index returns it in params)"
            )
        centroids, codes = index
        stored = centroids.agg((F.max("sub") + 1).cast("int").alias("m")).first()
        if stored is None or stored["m"] != m:
            raise ValueError(
                f"pq_ann_topk(index=...): m={m} disagrees with the index "
                f"(its centroid table has m={stored and stored['m']} "
                "subspaces) — splat load_pq_index's returned params"
            )
    else:
        m = _resolve_pq_m(m, corpus, vec_col)
        centroids, codes = pq_index(
            corpus, corpus_id=corpus_id, vec_col=vec_col,
            m=m, k=k, scale_bits=scale_bits, hash_fn=hash_fn,
            assign_kernel=assign_kernel,
        )
    qslices = _pq_subslices(queries, query_id, vec_col, m, scale_bits,
                            "query_id")
    qtable = (
        qslices.join(F.broadcast(centroids), "sub")
        .select(
            "query_id", "sub", F.col("idx").alias("code"),
            F.aggregate(
                F.zip_with(F.col("svec"), F.col("cvec"), lambda a, b: a - b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x * x,
            ).alias("d2"),
        )
    )
    scored = (
        codes.withColumnRenamed(corpus_id, "neighbor_id")
        .join(F.broadcast(qtable), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def persist_pq_index(
    index: tuple[DataFrame, DataFrame],
    path: str,
    *,
    m: int,
    k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    vec_col: str = "embedding",
    mode: str = "error",
) -> None:
    """Write a :func:`pq_index` result to ``path`` — the build-once/
    query-many layout for the third ANN family:

    - ``{path}/centroids`` — (sub, idx, cvec), m × k rows, one file;
    - ``{path}/codes`` — parquet ``partitionBy("sub")``, repartitioned by
      sub first so each subspace directory holds exactly one data file
      (appends add one per append; :func:`compact_pq_index` folds them),
      sorted by code within files for row-group min/max locality on the
      ADC join key. The ADC scan reads EVERY code row by design (m slim
      ints per vector — that IS the PQ economics), so unlike IVF/LSH the
      layout exists for file-count sanity and append/compact mechanics,
      not partition pruning;
    - ``{path}/meta`` — the training parameters (m/k/scale_bits/hash_fn)
      and column names, handed back by :func:`load_pq_index` so the query
      side can NEVER slice with a mismatched subspace count (``vec_col``
      is recorded for :func:`append_to_pq_index`'s default).

    ``m``/``k``/``scale_bits``/``hash_fn`` must be the values the index
    was built with — same manifest discipline as :func:`persist_lsh_index`.
    """
    centroids, codes = index
    spark = centroids.sparkSession
    data_cols = [c for c in codes.columns if c not in ("sub", "code")]
    if len(data_cols) != 1:
        raise ValueError(
            "persist_pq_index: codes must carry exactly "
            f"(corpus_id, sub, code); got {codes.columns}"
        )
    id_col = data_cols[0]
    # manifest integrity: a caller-supplied m/k that disagrees with the
    # built tables would silently desync EVERY future query's slicing —
    # validate against the centroid table (m × k tiny rows, one job)
    mk = centroids.agg(
        (F.max("sub") + 1).alias("m"), (F.max("idx") + 1).alias("k")
    ).first()
    if mk["m"] != m or mk["k"] != k:
        raise ValueError(
            f"persist_pq_index: manifest params (m={m}, k={k}) disagree "
            f"with the built index (m={mk['m']}, k={mk['k']}) — pass the "
            "values pq_index was called with"
        )
    centroids.coalesce(1).write.mode(mode).parquet(f"{path}/centroids")
    (
        codes.repartition(m, "sub")
        .sortWithinPartitions("code")
        .write.partitionBy("sub")
        .mode(mode)
        .parquet(f"{path}/codes")
    )
    meta = Row(
        format="pq", version=1, m=m, k=k, scale_bits=scale_bits,
        hash_fn=hash_fn, corpus_id=id_col, vec_col=vec_col,
    )
    fsio.write_json_dir(f"{path}/meta", meta.asDict(), mode=mode, spark=spark)


def load_pq_index(
    spark: SparkSession,
    path: str,
    *,
    corpus_id: str | None = None,
) -> tuple[tuple[DataFrame, DataFrame], dict]:
    """Read a :func:`persist_pq_index` tree back as ``((centroids, codes),
    params)``: splat ``params`` into :func:`pq_ann_topk` alongside
    ``index=`` so the query slicing uses EXACTLY the stored training
    parameters — ``pq_ann_topk(q, corpus, index=idx, **params)``."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "pq":
        raise ValueError(f"load_pq_index: {path}/meta is not a PQ index manifest")
    centroids = spark.read.parquet(f"{path}/centroids")
    codes = spark.read.parquet(f"{path}/codes")
    if corpus_id and corpus_id != meta["corpus_id"]:
        codes = codes.withColumnRenamed(meta["corpus_id"], corpus_id)
    params = {
        "m": int(meta["m"]), "k": int(meta["k"]),
        "scale_bits": int(meta["scale_bits"]), "hash_fn": meta["hash_fn"],
    }
    return (centroids, codes), params


def append_to_pq_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
    dedupe: bool = False,
    assign_kernel: str = "arrow",
) -> int:
    """Append a batch of new vectors to a persisted :func:`persist_pq_index`
    tree WITHOUT retraining: encode the increment against the FROZEN
    codebook (the exact :func:`_pq_subslices` + :func:`_pq_assign` kernels
    the build used — encode parity by construction) and append the slim
    (id, code) rows into the per-subspace layout. Returns vectors
    appended (each lands ``m`` code rows). Same daily-crawl economics and
    ``dedupe=True`` replay idempotence as :func:`append_to_ivf_index`;
    codebook drift under corpus growth shows up as rising ADC distances,
    and the cure is a rebuild, exactly as with IVF centroids."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "pq":
        raise ValueError(f"append_to_pq_index: {path}/meta is not a PQ index manifest")
    stored_id = meta["corpus_id"]
    m, scale_bits = int(meta["m"]), int(meta["scale_bits"])
    id_in = corpus_id or stored_id
    vec_in = vec_col or meta["vec_col"]
    slim = new_vectors.select(
        F.col(id_in).alias("cid"), F.col(vec_in).alias("_v")
    )
    if dedupe:
        existing = spark.read.parquet(f"{path}/codes").select(
            F.col(stored_id).alias("cid")
        )
        # pinned for the same reason as append_to_ivf_index: count and
        # write must see the SAME anti-joined rows even for a
        # non-deterministic batch
        slim = slim.join(existing, "cid", "left_anti").localCheckpoint(eager=True)
    # one extra job over the NEW BATCH only; the no-dedupe fast path
    # requires a deterministic new_vectors plan (see append_to_ivf_index)
    appended = slim.count()
    if appended:
        centroids = spark.read.parquet(f"{path}/centroids")
        slices = _pq_subslices(slim, "cid", "_v", m, scale_bits, "cid")
        (
            _pq_assign(slices, centroids, "cid", kernel=assign_kernel)
            .select(F.col("cid").alias(stored_id), "sub", "code")
            .repartition(m, "sub")
            .sortWithinPartitions("code")
            .write.partitionBy("sub")
            .mode("append")
            .parquet(f"{path}/codes")
        )
    return appended


def compact_pq_index(spark: SparkSession, path: str) -> None:
    """Fold a persisted PQ index's code files back to one per subspace
    directory after :func:`append_to_pq_index` runs — same rename-swap
    protocol (and crash repair via :func:`repair_pq_index`) as
    :func:`compact_ivf_index`."""
    if repair_pq_index(spark, path):
        return
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "pq":
        raise ValueError(f"compact_pq_index: {path}/meta is not a PQ index manifest")
    live, tmp, old = _swap_triplet(path, "codes")
    fsio.delete(tmp, spark=spark)
    fsio.delete(old, spark=spark)
    (
        spark.read.parquet(live)
        .repartition(int(meta["m"]), "sub")
        .sortWithinPartitions("code")
        .write.partitionBy("sub")
        .mode("error")
        .parquet(tmp)
    )
    _commit_swap(spark, path, "codes")


def repair_pq_index(spark: SparkSession, path: str) -> bool:
    """Finish a :func:`compact_pq_index` swap that crashed between its
    two renames (see :func:`_repair_swap`)."""
    return _repair_swap(spark, path, "codes", "repair_pq_index")


# --------------------------- IVF-PQ composition ---------------------------
#
# PQ codes INSIDE the IVF lists — the FAISS IVFPQ shape (Jégou et al.,
# TPAMI'11 §V; non-residual encoding, the standard choice for cosine/IP
# metrics), and the canonical 100 TB ANN memory plan this engine's two
# halves were built toward: IVF bounds the probed ROWS per query
# (n_probe lists of the corpus), PQ bounds the probed BYTES per row (m
# slim int codes instead of dim floats — at 768-dim/m=48 the ADC
# candidate read is ~32× smaller than the float-vector read). The probe
# stage reads ONLY (id, list_id, codes) — parquet column pruning keeps
# the full vectors' column chunks untouched — and the optional exact
# re-rank reads full vectors for just the ADC top-R candidate rows,
# partition-pruned to the probed lists.


def _unit_vec(col: Column) -> Column:
    """x / ||x||₂ as a left-to-right HOF expression (SQL-replayable, same
    summation-order discipline as :func:`cosine_similarity`); zero-norm
    vectors pass through unchanged. The norm is BOUND ONCE per row
    (``bind_once`` — Catalyst re-evaluates expressions referenced inside
    HOF lambda bodies once per ELEMENT, so a bare reference would make
    normalization O(dim²)/row: measured as the dominant cost of the
    2M × 768 IVF-PQ build before binding — each of the three PQ passes
    re-ran a 768-element aggregate 768× per row)."""
    from .dedup import bind_once

    n = F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))
    return bind_once(
        n,
        lambda nn: F.when(
            nn > 0.0, F.transform(col, lambda x: x / nn)
        ).otherwise(col),
    )


def _pq_codes_as_array(codes: DataFrame, id_col: str) -> DataFrame:
    """Pivot :func:`pq_index`'s long (id, sub, code) rows into one
    (id, codes array<int>) row — position ``sub`` holds that subspace's
    code, so an ADC lookup is ``dtab[sub][codes[sub]]``. One groupBy on
    the id (build-time shuffle of slim int rows)."""
    return codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | str = 16,
    kmeans_iters: int = 1,
    m: int | str = 4,
    pq_k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    lloyd_iters: int = 1,
    normalize: bool = True,
    centroid_budget_bytes: int = IVF_CENTROID_BUDGET_BYTES,
    assign_kernel: str = "arrow",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """IVF-PQ index: an IVF coarse quantizer (:func:`build_ivf_index` —
    same seeding, Lloyd refinement, clamp and budget guard) whose
    inverted lists store each vector's PQ codes (:func:`pq_index` — same
    integer fixed-point codebook, trained ONCE on the whole corpus, not
    per list) alongside the vector itself.

    Returns ``(ivf_centroids, pq_centroids, entries)``:

    - ivf_centroids : (list_id int, centroid array<double>)
    - pq_centroids  : (sub int, idx int, cvec array<bigint>) — the
      shared codebook, m × pq_k rows
    - entries       : (corpus_id, vec_col array<double>, list_id int,
      codes array<int>) — the assignments table with the m-code column
      added. The ADC query stage projects (id, list_id, codes) and the
      parquet scan never touches the vector column chunks; the vector
      rides along ONLY for the exact re-rank stage (and is what keeps
      the persisted tree self-contained — rebuilds and re-ranks never
      need the source corpus).

    ENCODING IS NON-RESIDUAL AND (BY DEFAULT) UNIT-NORMALIZED: codes
    quantize ``x/||x||``, not the residual (x − centroid) FAISS defaults
    to for L2. Under the cosine metric this engine ranks by, residuals
    against unnormalized Voronoi centroids have no exactness story —
    while for UNIT vectors ``||q − x||² = 2 − 2·cos(q, x)``, so the
    exact-integer ADC ordering is the cosine ordering up to quantization
    error (measured on the isotropic test embeddings: raw-vector ADC
    recall@5 vs exact cosine ≈ 0.12 — squared-L2 on unnormalized noise
    is norm-dominated — vs ≈ matching the probe ceiling once
    normalized). ``normalize=False`` keeps raw-vector codes (the plain
    :func:`pq_index` semantics) for corpora that are already unit-norm
    or that genuinely rank by L2. Either way the pipeline (seeding →
    training → encoding → ADC) stays in the exact integer domain after
    the one deterministic left-to-right normalization, bit-replayable in
    plain SQL with ``hash_fn='md5'`` (the ``pq_ann`` oracle discipline;
    the ``ivfpq_ann`` face replays probe selection + ADC verbatim in
    DuckDB). The STORED vector column stays raw — exact re-rank scores
    cosine, which is scale-invariant, and the entries tree remains
    bit-compatible with the flat IVF family's assignments.

    Build cost: the two trainings each pass over the corpus exactly as
    their standalone builds do, plus ONE slim join (ids + m ints) to
    attach codes to assignments — offline cost, amortized by every
    query's byte cut. Mixed-dimension corpora are PQ's hard gate
    (``dim % m`` is checked per row and raises); null vectors degrade to
    null list_id + null codes — never probed, never dropped.

    The gauges compose for free: ``entries`` carries ``list_id``, so
    :func:`ivf_index_stats` / :func:`index_maintenance_plan` /
    :func:`index_layout_stats` (tree ``'entries'``) run unchanged on an
    IVF-PQ index, and the streaming sink (``streaming/ann_ingest.py``)
    maintains it under kind ``'ivfpq'``.
    """
    to_encode = corpus
    if normalize:
        to_encode = corpus.withColumn(
            vec_col, _unit_vec(F.col(vec_col).cast("array<double>"))
        )

    # r14 optimization (guide §2.6): the two trainings are INDEPENDENT —
    # the coarse quantizer clusters raw vectors, the codebook clusters
    # (normalized) subslices; only `entries` joins their outputs. Each
    # training's construction runs its own driver-side jobs (ref-dim
    # first(), seed/Lloyd centroid collects), so running them from two
    # driver threads overlaps those jobs instead of serializing the two
    # chains. Deterministic either way — the join composes the same two
    # results.
    def _ivf():
        return build_ivf_index(
            corpus,
            corpus_id=corpus_id,
            vec_col=vec_col,
            n_lists=n_lists,
            kmeans_iters=kmeans_iters,
            centroid_budget_bytes=centroid_budget_bytes,
            hash_fn=hash_fn,
        )

    def _pq():
        return pq_index(
            to_encode,
            corpus_id=corpus_id,
            vec_col=vec_col,
            m=m,
            k=pq_k,
            scale_bits=scale_bits,
            hash_fn=hash_fn,
            lloyd_iters=lloyd_iters,
            assign_kernel=assign_kernel,
        )

    from concurrent.futures import ThreadPoolExecutor

    # No `with` block: its __exit__ would re-join the threads, blocking a
    # failed build on the still-running sibling training (minutes at scale).
    pool = ThreadPoolExecutor(max_workers=2)
    ivf_f, pq_f = pool.submit(_ivf), pool.submit(_pq)
    try:
        ivf_centroids, assignments = ivf_f.result()
        pq_centroids, codes = pq_f.result()
    except BaseException:
        pool.shutdown(wait=False, cancel_futures=True)
        raise
    pool.shutdown(wait=True)
    entries = assignments.join(
        _pq_codes_as_array(codes, corpus_id), corpus_id, "left"
    ).select(corpus_id, vec_col, "list_id", "codes")
    return ivf_centroids, pq_centroids, entries


def _pq_query_dtab(
    queries: DataFrame,
    pq_centroids: DataFrame,
    *,
    query_id: str,
    vec_col: str,
    m: int,
    pq_k: int,
    sub_width: int,
    scale_bits: int,
    normalize: bool,
) -> DataFrame:
    """Per-query ADC distance table: (query_id, qv, dtab array<array<
    bigint>>) where ``dtab[sub][code]`` is the exact integer squared-L2
    between the query's ``sub``-th subslice and centroid ``code`` — the
    m × pq_k lookup table every candidate's ADC sum reads
    (:func:`pq_ann_topk`'s qtable, pivoted dense so the candidate join
    carries ONE array column instead of m × pq_k rows). ``normalize``
    must echo the build's flag: the sliced side is the UNIT query vector
    when the codebook was trained on unit vectors — the carried ``qv``
    stays raw (probing and exact re-rank score cosine, which is
    scale-invariant and keeps flat-IVF probe parity bitwise). Queries
    whose dimension disagrees with the codebook (≠ m × sub_width) are
    dropped — cosine/ADC between different-width vectors is undefined,
    and the slicer would otherwise raise mid-job on the divisibility
    gate."""
    q_slim = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).filter(F.col("qv").isNotNull() & (F.size("qv") == m * sub_width))
    enc = _unit_vec(F.col("qv")) if normalize else F.col("qv")
    qslices = _pq_subslices(
        q_slim.select("query_id", enc.alias("qv")),
        "query_id", "qv", m, scale_bits, "query_id",
    )
    qtable = (
        qslices.join(F.broadcast(pq_centroids), "sub")
        .select(
            "query_id",
            (F.col("sub") * pq_k + F.col("idx")).cast("int").alias("_key"),
            F.aggregate(
                F.zip_with(F.col("svec"), F.col("cvec"), lambda a, b: a - b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x * x,
            ).alias("d2"),
        )
    )
    dtab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(pq_k - 1)),
            lambda c: F.element_at(F.col("_dm"), (s * pq_k + c).cast("int")),
        ),
    )
    per_query = qtable.groupBy("query_id").agg(
        F.map_from_entries(F.collect_list(F.struct("_key", "d2"))).alias("_dm")
    ).select("query_id", dtab.alias("dtab"))
    return q_slim.join(per_query, "query_id")


# Built at import (not lazily) so concurrent _par threads can never race a
# check-then-assign on the module global and drop each other's entries.
_PQ_SHAPE_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _pq_shape(pq_centroids: DataFrame) -> tuple[int, int, int]:
    """(m, pq_k, sub_width) read off a codebook table — m × pq_k tiny
    rows, one job.

    Memoized per codebook DataFrame OBJECT (r14, guide §1.2: don't
    recompute what you already know — the contract faces issue several
    ``ivfpq_ann_topk`` calls against the same pinned codebook and each
    paid this job again). A DataFrame is an immutable plan, so identity
    implies an identical shape; distinct objects over the same data just
    miss the memo and pay the one job, never a wrong answer. WeakKey so
    the memo never outlives the codebook object."""
    try:
        hit = _PQ_SHAPE_MEMO.get(pq_centroids)
    except TypeError:  # unhashable/unweakrefable wrapper: just compute
        hit = None
    if hit is not None:
        return hit
    row = pq_centroids.agg(
        (F.max("sub") + 1).cast("int").alias("m"),
        (F.max("idx") + 1).cast("int").alias("k"),
        F.max(F.size("cvec")).cast("int").alias("w"),
    ).first()
    if row is None or row["m"] is None:
        raise ValueError("ivfpq: empty PQ codebook table")
    shape = (int(row["m"]), int(row["k"]), int(row["w"]))
    try:
        _PQ_SHAPE_MEMO[pq_centroids] = shape
    except TypeError:
        pass
    return shape


def ivfpq_ann_topk(
    queries: DataFrame,
    index: tuple[DataFrame, DataFrame, DataFrame],
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 8,
    rerank: int = 0,
    m: int | None = None,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    normalize: bool = True,
    broadcast_queries: bool = True,
    scorer: str = "auto",
) -> DataFrame:
    """IVF-PQ approximate top-k: probe the ``n_probe`` nearest inverted
    lists per query (exactly :func:`ivf_ann_topk`'s probe stage — same
    scorer cutover, same tie order), then score every candidate in the
    probed lists by ADC over its stored codes — the candidate scan reads
    (id, list_id, codes): m ints per vector, never the float vector.

    ``rerank=0`` (default): output (query_id, neighbor_id, adc_dist,
    rank), exact integer ADC ascending — :func:`pq_ann_topk`'s contract
    restricted to the probed lists; the whole row set is SQL-replayable
    with ``hash_fn='md5'`` builds. ``rerank=R > 0``: the ADC top-
    ``max(R, k)`` candidates per query are re-scored with EXACT cosine
    against their full vectors — read back from the entries table
    partition-pruned to the probed lists and id-joined to just those
    candidate rows — and the output is (query_id, neighbor_id, cosine,
    rank), :func:`ivf_ann_topk`'s contract. R trades one slim extra read
    (R full vectors per query) for removing quantization error from the
    final ranking — the FAISS ``IndexRefineFlat`` shape; R ≈ 2–4× k is
    the usual operating point.

    ``m``/``scale_bits``/``hash_fn``/``normalize``: splat
    ``load_ivfpq_index``'s returned params (``scale_bits``/``normalize``
    cannot be inferred from the tables and a desync would silently skew
    every ADC distance; ``m`` is validated against the codebook when
    passed, inferred from it when None; ``hash_fn`` is unused at query
    time — accepted so the params dict splats whole). Same small-query broadcast contract and
    ``broadcast_queries=False`` sort-merge fallback as
    :func:`ivf_ann_topk`; malformed or wrong-width queries produce no
    rows (scorer-independent, same as the flat paths).
    """
    ivf_centroids, pq_centroids, entries = index
    m_i, k_i, w_i = _pq_shape(pq_centroids)
    if m is not None and m != m_i:
        raise ValueError(
            f"ivfpq_ann_topk: m={m} disagrees with the index (its codebook "
            f"has m={m_i} subspaces) — splat load_ivfpq_index's params"
        )
    with_dtab = _pq_query_dtab(
        queries, pq_centroids, query_id=query_id, vec_col=vec_col,
        m=m_i, pq_k=k_i, sub_width=w_i, scale_bits=scale_bits,
        normalize=normalize,
    )
    use = resolve_scorer(scorer, with_dtab, "qv")
    probes = _shard_probes(
        with_dtab.select("query_id", "qv"), ivf_centroids,
        n_probe=n_probe, use=use, budget_check=True,
    ).select("query_id", "qv", "list_id").join(
        with_dtab.select("query_id", "dtab"), "query_id"
    )
    probes_side = F.broadcast(probes) if broadcast_queries else probes.hint("merge")
    # THE byte-cut projection: (id, list_id, codes) — the parquet scan of
    # a persisted entries tree reads the m-int codes column chunks and
    # prunes to the probed list directories; the float vector column is
    # never touched on this path.
    slim = entries.filter(
        F.col("list_id").isNotNull() & F.col("codes").isNotNull()
    ).select(
        F.col(corpus_id).alias("neighbor_id"), "list_id", "codes"
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("dtab"), F.col("codes"),
            lambda t, c: F.element_at(t, c + F.lit(1)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        probes_side.join(slim, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "list_id", "qv", adc.alias("adc_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(wa))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_dist", "rank")
        )
    top = (
        scored.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= max(rerank, k))
        .select("query_id", "neighbor_id", "list_id", "qv")
    )
    # exact re-rank: R rows per query join back to their FULL vectors —
    # broadcast the candidate set, prune the entries scan to the probed
    # lists (equi-join on list_id + neighbor id), read the vector column
    # for only those rows.
    vecs = entries.filter(F.col("list_id").isNotNull()).select(
        F.col(corpus_id).alias("neighbor_id"), "list_id",
        F.col(vec_col).alias("cv"),
    )
    rescored = (
        F.broadcast(top).join(vecs, ["list_id", "neighbor_id"])
        .filter(F.size("qv") == F.size("cv"))
        .select("query_id", "neighbor_id", cosine_score_col(use).alias("cosine"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wc))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def persist_ivfpq_index(
    index: tuple[DataFrame, DataFrame, DataFrame],
    path: str,
    *,
    m: int,
    pq_k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    normalize: bool = True,
    mode: str = "error",
) -> None:
    """Write a :func:`build_ivfpq_index` result to ``path`` — the fourth
    persisted ANN family, same discipline as its parents:

    - ``{path}/ivf_centroids`` / ``{path}/pq_centroids`` — one file each
      (≤ 4096 and m × pq_k rows by the clamps);
    - ``{path}/entries`` — parquet ``partitionBy("list_id")``,
      repartitioned by list_id first (one data file per list directory);
      probes prune to n_probe directories AND column-prune to the codes
      column — the rows × bytes double cut;
    - ``{path}/meta`` — n_lists + the PQ training params, handed back by
      :func:`load_ivfpq_index` so query slicing can never desync.

    ``m``/``pq_k`` are validated against the built codebook (the
    :func:`persist_pq_index` manifest-integrity check); ``scale_bits``/
    ``hash_fn`` must be the build's values — codes are dimensionless
    ints, nothing on disk can re-derive them.
    """
    ivf_centroids, pq_centroids, entries = index
    spark = ivf_centroids.sparkSession
    # _pq_shape instead of a bespoke agg: same (max sub+1, max idx+1)
    # values, and the WeakKey memo makes the probe free when the codebook
    # object was already shape-probed by a query/encode in this run (r15,
    # guide §1.2 — the persisted faces pay this probe up to 11x per run)
    got_m, got_k, _w = _pq_shape(pq_centroids)
    if got_m != m or got_k != pq_k:
        raise ValueError(
            f"persist_ivfpq_index: manifest params (m={m}, pq_k={pq_k}) "
            f"disagree with the built codebook (m={got_m}, k={got_k}) "
            "— pass the values build_ivfpq_index was called with"
        )
    if "codes" not in entries.columns or "list_id" not in entries.columns:
        raise ValueError(
            "persist_ivfpq_index: entries must carry (corpus_id, vec_col, "
            f"list_id, codes); got {entries.columns}"
        )
    data_cols = [c for c in entries.columns if c not in ("list_id", "codes")]
    if len(data_cols) != 2:
        raise ValueError(
            "persist_ivfpq_index: entries must carry exactly (corpus_id, "
            f"vec_col, list_id, codes); got {entries.columns}"
        )
    id_col, v_col = _infer_id_vec_roles(
        entries.drop("codes"), data_cols, "persist_ivfpq_index"
    )
    ivf_centroids.coalesce(1).write.mode(mode).parquet(f"{path}/ivf_centroids")
    pq_centroids.coalesce(1).write.mode(mode).parquet(f"{path}/pq_centroids")
    n_lists = spark.read.parquet(f"{path}/ivf_centroids").count()
    (
        entries.repartition(n_lists, "list_id")
        .write.partitionBy("list_id")
        .mode(mode)
        .parquet(f"{path}/entries")
    )
    meta = Row(
        format="ivfpq", version=1, n_lists=n_lists, m=m, pq_k=pq_k,
        scale_bits=scale_bits, hash_fn=hash_fn, normalize=bool(normalize),
        corpus_id=id_col, vec_col=v_col,
    )
    fsio.write_json_dir(f"{path}/meta", meta.asDict(), mode=mode, spark=spark)


def load_ivfpq_index(
    spark: SparkSession,
    path: str,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
) -> tuple[tuple[DataFrame, DataFrame, DataFrame], dict]:
    """Read a :func:`persist_ivfpq_index` tree back as ``((ivf_centroids,
    pq_centroids, entries), params)`` — splat ``params`` into
    :func:`ivfpq_ann_topk` alongside ``index=`` so the query slicing uses
    exactly the stored training parameters."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "ivfpq":
        raise ValueError(
            f"load_ivfpq_index: {path}/meta is not an IVF-PQ index manifest"
        )
    ivf_centroids = spark.read.parquet(f"{path}/ivf_centroids")
    pq_centroids = spark.read.parquet(f"{path}/pq_centroids")
    entries = spark.read.parquet(f"{path}/entries")
    if corpus_id and corpus_id != meta["corpus_id"]:
        entries = entries.withColumnRenamed(meta["corpus_id"], corpus_id)
    if vec_col and vec_col != meta["vec_col"]:
        entries = entries.withColumnRenamed(meta["vec_col"], vec_col)
    params = {
        "m": int(meta["m"]), "scale_bits": int(meta["scale_bits"]),
        "hash_fn": meta["hash_fn"], "normalize": bool(meta["normalize"]),
    }
    return (ivf_centroids, pq_centroids, entries), params


def append_to_ivfpq_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
    dedupe: bool = False,
    centroid_budget_bytes: int = IVF_CENTROID_BUDGET_BYTES,
    assign_kernel: str = "arrow",
) -> int:
    """Append a batch to a persisted IVF-PQ tree without retraining
    EITHER quantizer: assign against the frozen IVF centroids
    (:func:`_assign_to_lists` — the build's own kernel) and encode
    against the frozen PQ codebook (:func:`_pq_subslices` +
    :func:`_pq_assign` — ditto), then append the (id, vec, list_id,
    codes) rows into the partitioned layout, repartitioned by list_id so
    each append adds at most one file per touched directory. O(batch),
    replay-idempotent with ``dedupe=True`` (column-pruned id anti-join),
    same economics and drift story as :func:`append_to_ivf_index` /
    :func:`append_to_pq_index` — both of whose gauges this family reads
    (``ivf_index_stats(entries)``)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "ivfpq":
        raise ValueError(
            f"append_to_ivfpq_index: {path}/meta is not an IVF-PQ index manifest"
        )
    stored_id, stored_vec = meta["corpus_id"], meta["vec_col"]
    n_lists, m = int(meta["n_lists"]), int(meta["m"])
    scale_bits = int(meta["scale_bits"])
    normalize = bool(meta["normalize"])
    id_in = corpus_id or stored_id
    vec_in = vec_col or stored_vec
    ivf_centroids = spark.read.parquet(f"{path}/ivf_centroids")
    first = ivf_centroids.select(F.size("centroid")).first()
    ref_dim = first[0] if first is not None else 0
    est_bytes = n_lists * ref_dim * 8
    if est_bytes > centroid_budget_bytes:
        raise ValueError(
            f"append_to_ivfpq_index: centroid matrix is n_lists({n_lists}) "
            f"× dim({ref_dim}) × 8 B = {est_bytes / (1 << 20):.0f} MiB on "
            f"the DRIVER, over the {centroid_budget_bytes / (1 << 20):.0f} "
            "MiB budget — this index should be maintained as shards."
        )
    slim = new_vectors.select(
        F.col(id_in).alias("cid"),
        F.col(vec_in).cast("array<double>").alias("v"),
    )
    if dedupe:
        existing = spark.read.parquet(f"{path}/entries").select(
            F.col(stored_id).alias("cid")
        )
        # same pin as append_to_ivf_index: count and write must see ONE
        # materialized row set
        slim = slim.join(existing, "cid", "left_anti").localCheckpoint(eager=True)
    appended = slim.count()
    if appended:
        pq_centroids = spark.read.parquet(f"{path}/pq_centroids")
        assigned = _assign_to_lists(slim, ivf_centroids)
        enc = slim
        if normalize:
            enc = slim.select("cid", _unit_vec(F.col("v")).alias("v"))
        codes = _pq_assign(
            _pq_subslices(enc, "cid", "v", m, scale_bits, "cid"),
            pq_centroids, "cid", kernel=assign_kernel,
        ).select("cid", "sub", "code")
        (
            assigned.join(_pq_codes_as_array(codes, "cid"), "cid", "left")
            .select(
                F.col("cid").alias(stored_id),
                F.col("v").alias(stored_vec),
                "list_id", "codes",
            )
            .repartition(n_lists, "list_id")
            .write.partitionBy("list_id")
            .mode("append")
            .parquet(f"{path}/entries")
        )
    return appended


def compact_ivfpq_index(spark: SparkSession, path: str) -> None:
    """Fold a persisted IVF-PQ index's entries back to one file per list
    directory after appends — same rename-swap protocol (and crash
    repair via :func:`repair_ivfpq_index`) as :func:`compact_ivf_index`."""
    if repair_ivfpq_index(spark, path):
        return
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "ivfpq":
        raise ValueError(
            f"compact_ivfpq_index: {path}/meta is not an IVF-PQ index manifest"
        )
    live, tmp, old = _swap_triplet(path, "entries")
    fsio.delete(tmp, spark=spark)
    fsio.delete(old, spark=spark)
    (
        spark.read.parquet(live)
        .repartition(int(meta["n_lists"]), "list_id")
        .write.partitionBy("list_id")
        .mode("error")
        .parquet(tmp)
    )
    _commit_swap(spark, path, "entries")


def repair_ivfpq_index(spark: SparkSession, path: str) -> bool:
    """Finish a :func:`compact_ivfpq_index` swap that crashed between
    its two renames (see :func:`_repair_swap`)."""
    return _repair_swap(spark, path, "entries", "repair_ivfpq_index")


# ------------------------- sharded IVF-PQ -------------------------
#
# The full 100 TB composition: sharding bounds probed ROWS per query
# (~n_probe × 4096 at any corpus size — build_sharded_ivf_index's
# global-budget economics) and PQ codes bound probed BYTES per row
# (m ints instead of dim floats). One codebook is trained on the WHOLE
# corpus and shared by every shard, so a query computes ONE ADC distance
# table and reuses it across shards — and every shard directory is a
# complete standalone ivfpq tree (same manifest, same repair/compact/
# append helpers), which is what lets the maintenance machinery dispatch
# per shard.


def build_sharded_ivfpq_index(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int | str = "auto",
    n_lists: int | str = "auto",
    kmeans_iters: int = 1,
    m: int | str = 4,
    pq_k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    lloyd_iters: int = 1,
    normalize: bool = True,
    centroid_budget_bytes: int = IVF_CENTROID_BUDGET_BYTES,
    materialize: bool | str = "auto",
    scratch_dir: str | None = None,
    assign_kernel: str = "arrow",
) -> tuple[DataFrame, list[tuple[DataFrame, DataFrame]]]:
    """Sharded IVF-PQ: :func:`build_sharded_ivf_index`'s hash split and
    per-shard in-budget IVF builds (same ``materialize``/``scratch_dir``
    one-shuffle economics), with ONE :func:`pq_index` codebook trained on
    the full corpus and each shard's assignments joined to its vectors'
    codes. Returns ``(pq_centroids, [(ivf_centroids, entries), ...])``
    — the shard entries carry (id, vec, list_id, codes) exactly like the
    flat :func:`build_ivfpq_index`.

    THE SHARED CODEBOOK IS THE POINT: PQ quantization quality depends on
    the value distribution, not on which shard a row hashed to, so one
    corpus-trained codebook loses nothing — and buys a query ONE m × pq_k
    ADC table reused across every shard, plus shard rebuilds that never
    retrain PQ (list assignment and codes are independent; a rebuilt
    shard re-clusters its lists and keeps its rows' codes verbatim).

    Build cost: the sharded IVF build + one PQ train + one slim
    (id, m-int) join per shard against the column-pruned code table —
    all offline; the per-query read volume this buys is bounded in BOTH
    dimensions (rows by the global probe budget, bytes by the codes).
    """
    to_encode = corpus
    if normalize:
        to_encode = corpus.withColumn(
            vec_col, _unit_vec(F.col(vec_col).cast("array<double>"))
        )

    # r14 optimization (guide §2.6): same independence as
    # build_ivfpq_index — the shared codebook trains on values, the
    # sharded IVF build on the hash split; overlap the two chains'
    # driver-side construction jobs from two threads (the per-shard
    # builds inside build_sharded_ivf_index additionally parallelize
    # themselves). Deterministic composition, same entries.
    def _pq():
        return pq_index(
            to_encode, corpus_id=corpus_id, vec_col=vec_col,
            m=m, k=pq_k, scale_bits=scale_bits, hash_fn=hash_fn,
            lloyd_iters=lloyd_iters, assign_kernel=assign_kernel,
        )

    def _shards():
        return build_sharded_ivf_index(
            corpus, corpus_id=corpus_id, vec_col=vec_col, n_shards=n_shards,
            n_lists=n_lists, kmeans_iters=kmeans_iters,
            centroid_budget_bytes=centroid_budget_bytes,
            materialize=materialize, scratch_dir=scratch_dir,
        )

    from concurrent.futures import ThreadPoolExecutor

    # No `with` block: its __exit__ would re-join the threads, blocking a
    # failed build on the still-running sibling training (minutes at scale).
    pool = ThreadPoolExecutor(max_workers=2)
    pq_f, sh_f = pool.submit(_pq), pool.submit(_shards)
    try:
        pq_centroids, codes = pq_f.result()
        shards = sh_f.result()
    except BaseException:
        pool.shutdown(wait=False, cancel_futures=True)
        raise
    pool.shutdown(wait=True)
    codes_arr = _pq_codes_as_array(codes, corpus_id)
    out = []
    for cents, asg in shards:
        entries = asg.join(codes_arr, corpus_id, "left").select(
            corpus_id, vec_col, "list_id", "codes"
        )
        out.append((cents, entries))
    return pq_centroids, out


def sharded_ivfpq_ann_topk(
    queries: DataFrame,
    index: tuple[DataFrame, list[tuple[DataFrame, DataFrame]]],
    *,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 8,
    rerank: int = 0,
    m: int | None = None,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    normalize: bool = True,
    broadcast_queries: bool = True,
    scorer: str = "auto",
) -> DataFrame:
    """Approximate top-k over a sharded IVF-PQ index: the GLOBAL probe
    budget of :func:`sharded_ivf_ann_topk` (best ``n_probe`` lists across
    ALL shards by centroid cosine, probe set localCheckpointed once past
    one shard — the r13 replanning pin) with :func:`ivfpq_ann_topk`'s ADC
    candidate scoring — the per-shard candidate scan reads (id, list_id,
    codes), never the vectors. ONE ADC distance table per query (the
    codebook is shared) rides the checkpointed probe set into every
    shard's broadcast join.

    ``rerank=R``: the global ADC top-``max(R, k)`` per query re-scores
    with exact cosine, reading full vectors per shard for just those
    candidate rows (partition-pruned to the probed lists). Output
    contracts match the flat function: (query_id, neighbor_id, adc_dist,
    rank) without rerank, (…, cosine, rank) with.

    Degenerations (test-pinned): 1 shard ≡ :func:`ivfpq_ann_topk` row for
    row; a probe budget covering every list returns the SAME rows at any
    shard count (the shared codebook makes full-budget ADC distances
    shard-independent). Note the flat path's twin-at-n_probe=1 guarantee
    does NOT shard: the GLOBAL budget ranks centroids across shards, so
    another shard's centroid can outrank the twin's source list at small
    budgets — recovery becomes probabilistic until the budget covers the
    source's list (certain at full budget)."""
    pq_centroids, shards = index
    if not shards:
        raise ValueError("sharded_ivfpq_ann_topk: empty shard list")
    m_i, k_i, w_i = _pq_shape(pq_centroids)
    if m is not None and m != m_i:
        raise ValueError(
            f"sharded_ivfpq_ann_topk: m={m} disagrees with the index (its "
            f"codebook has m={m_i} subspaces) — splat "
            "load_sharded_ivfpq_index's params"
        )
    with_dtab = _pq_query_dtab(
        queries, pq_centroids, query_id=query_id, vec_col=vec_col,
        m=m_i, pq_k=k_i, sub_width=w_i, scale_bits=scale_bits,
        normalize=normalize,
    )
    use = resolve_scorer(scorer, with_dtab, "qv")
    q_slim = with_dtab.select("query_id", "qv")
    probe_parts = []
    for s, (centroids, _entries) in enumerate(shards):
        probe_parts.append(
            _shard_probes(
                q_slim, centroids, n_probe=n_probe, use=use, budget_check=True
            ).withColumn("shard", F.lit(s))
        )
    all_probes = probe_parts[0]
    for p in probe_parts[1:]:
        all_probes = all_probes.unionByName(p)
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("shard"), F.desc("list_id")
    )
    probes = (
        all_probes.withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "shard", "list_id")
        .join(with_dtab.select("query_id", "dtab"), "query_id")
    )
    if len(shards) > 1:
        # same pin as sharded_ivf_ann_topk: every shard branch consumes
        # the ranked probe set; materialize it (dtab included — m × pq_k
        # longs per probe row, still query-batch-sized) so probe work is
        # computed once, not per shard
        probes = probes.localCheckpoint(eager=False)
    adc = F.aggregate(
        F.zip_with(
            F.col("dtab"), F.col("codes"),
            lambda t, c: F.element_at(t, c + F.lit(1)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand_parts = []
    for s, (_centroids, entries) in enumerate(shards):
        p_s = probes.filter(F.col("shard") == s).drop("shard")
        p_side = F.broadcast(p_s) if broadcast_queries else p_s.hint("merge")
        cand_parts.append(
            p_side.join(
                entries.filter(
                    F.col("list_id").isNotNull() & F.col("codes").isNotNull()
                ).select(
                    F.col(corpus_id).alias("neighbor_id"), "list_id", "codes"
                ),
                "list_id",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id", "qv",
                F.lit(s).alias("shard"), "list_id", adc.alias("adc_dist"),
            )
        )
    scored = cand_parts[0]
    for c in cand_parts[1:]:
        scored = scored.unionByName(c)
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(wa))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_dist", "rank")
        )
    top = (
        scored.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= max(rerank, k))
        .select("query_id", "neighbor_id", "qv", "shard", "list_id")
        .localCheckpoint(eager=False)  # consumed once per shard below
    )
    re_parts = []
    for s, (_centroids, entries) in enumerate(shards):
        t_s = top.filter(F.col("shard") == s).drop("shard")
        re_parts.append(
            F.broadcast(t_s).join(
                entries.filter(F.col("list_id").isNotNull()).select(
                    F.col(corpus_id).alias("neighbor_id"), "list_id",
                    F.col(vec_col).alias("cv"),
                ),
                ["list_id", "neighbor_id"],
            )
            .filter(F.size("qv") == F.size("cv"))
            .select(
                "query_id", "neighbor_id",
                cosine_score_col(use).alias("cosine"),
            )
        )
    rescored = re_parts[0]
    for r in re_parts[1:]:
        rescored = rescored.unionByName(r)
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wc))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def persist_sharded_ivfpq_index(
    index: tuple[DataFrame, list[tuple[DataFrame, DataFrame]]],
    path: str,
    *,
    m: int,
    pq_k: int = 16,
    scale_bits: int = 20,
    hash_fn: str = "xx",
    normalize: bool = True,
    mode: str = "error",
) -> None:
    """Write a sharded IVF-PQ index: one complete standalone
    :func:`persist_ivfpq_index` tree per shard under
    ``{path}/shard=<s>/`` — each shard carries its own copy of the
    (m × pq_k — tiny) shared codebook, so every per-shard maintenance
    helper works on a shard directory unmodified — plus a top-level
    manifest with the shard count and the shared training params."""
    pq_centroids, shards = index
    if not shards:
        raise ValueError("persist_sharded_ivfpq_index: empty shard list")
    spark = pq_centroids.sparkSession

    # r14 optimization (guide §2.6): per-shard trees are disjoint
    # directories — write them concurrently (manifest still lands LAST,
    # so a reader can never see a complete manifest over a partial tree).
    def _one(sp):
        s, (cents, entries) = sp
        persist_ivfpq_index(
            (cents, pq_centroids, entries), f"{path}/shard={s:05d}",
            m=m, pq_k=pq_k, scale_bits=scale_bits, hash_fn=hash_fn,
            normalize=normalize, mode=mode,
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(shards), 4)) as pool:
        list(pool.map(_one, enumerate(shards)))
    meta = Row(
        format="sharded_ivfpq", version=1, n_shards=len(shards),
        m=m, pq_k=pq_k, scale_bits=scale_bits, hash_fn=hash_fn,
        normalize=bool(normalize),
    )
    fsio.write_json_dir(f"{path}/meta", meta.asDict(), mode=mode, spark=spark)


def load_sharded_ivfpq_index(
    spark: SparkSession,
    path: str,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
) -> tuple[tuple[DataFrame, list[tuple[DataFrame, DataFrame]]], dict]:
    """Read a :func:`persist_sharded_ivfpq_index` tree back as
    ``((pq_centroids, shard_list), params)`` — splat ``params`` into
    :func:`sharded_ivfpq_ann_topk`. The shared codebook is read from
    shard 0's copy (every shard stores identical values)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivfpq":
        raise ValueError(
            f"load_sharded_ivfpq_index: {path}/meta is not a sharded "
            "IVF-PQ manifest"
        )
    shards = []
    pq_centroids = None
    for s in range(int(meta["n_shards"])):
        (cents, pqc, entries), _params = load_ivfpq_index(
            spark, f"{path}/shard={s:05d}",
            corpus_id=corpus_id, vec_col=vec_col,
        )
        if pq_centroids is None:
            pq_centroids = pqc
        shards.append((cents, entries))
    params = {
        "m": int(meta["m"]), "scale_bits": int(meta["scale_bits"]),
        "hash_fn": meta["hash_fn"], "normalize": bool(meta["normalize"]),
    }
    return (pq_centroids, shards), params


def append_to_sharded_ivfpq_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    corpus_id: str | None = None,
    vec_col: str | None = None,
    dedupe: bool = False,
) -> int:
    """Append a batch to a persisted sharded IVF-PQ tree: route by the
    build's own ``pmod(xxhash64(id), n_shards)`` split, then the
    per-shard :func:`append_to_ivfpq_index` assigns against that shard's
    frozen centroids and encodes against the (shared, per-shard-stored)
    frozen codebook. Same batch-pin and per-shard-scoped ``dedupe``
    economics as :func:`append_to_sharded_ivf_index`."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivfpq":
        raise ValueError(
            f"append_to_sharded_ivfpq_index: {path}/meta is not a sharded "
            "IVF-PQ manifest"
        )
    n_shards = int(meta["n_shards"])
    shard0 = fsio.read_json_dir(f"{path}/shard=00000/meta", spark=spark)
    id_in = corpus_id or shard0["corpus_id"]
    if n_shards > 1:
        new_vectors = new_vectors.localCheckpoint(eager=True)
    total = 0
    for s in range(n_shards):
        part = new_vectors.filter(
            F.pmod(F.xxhash64(F.col(id_in)), F.lit(n_shards)) == s
        )
        total += append_to_ivfpq_index(
            spark, f"{path}/shard={s:05d}", part,
            corpus_id=corpus_id, vec_col=vec_col, dedupe=dedupe,
        )
    return total


def compact_sharded_ivfpq_index(spark: SparkSession, path: str) -> None:
    """Per-shard :func:`compact_ivfpq_index` over a persisted sharded
    IVF-PQ tree."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivfpq":
        raise ValueError(
            f"compact_sharded_ivfpq_index: {path}/meta is not a sharded "
            "IVF-PQ manifest"
        )
    for s in range(int(meta["n_shards"])):
        compact_ivfpq_index(spark, f"{path}/shard={s:05d}")


def repair_sharded_ivfpq_index(spark: SparkSession, path: str) -> bool:
    """Per-shard :func:`repair_ivfpq_index` (every shard visited — a
    maintenance job dying mid-loop can tear more than one swap)."""
    meta = fsio.read_json_dir(f"{path}/meta", spark=spark)
    if meta is None or meta["format"] != "sharded_ivfpq":
        raise ValueError(
            f"repair_sharded_ivfpq_index: {path}/meta is not a sharded "
            "IVF-PQ manifest"
        )
    return any([
        repair_ivfpq_index(spark, f"{path}/shard={s:05d}")
        for s in range(int(meta["n_shards"]))
    ])


def sharded_ivfpq_index_stats(
    index: tuple[DataFrame, list[tuple[DataFrame, DataFrame]]],
    *,
    skew_threshold: float = 4.0,
) -> DataFrame:
    """Per-shard + global occupancy report for a sharded IVF-PQ index —
    the entries tables carry ``list_id``, so this is
    :func:`sharded_ivf_index_stats` over the (centroids, entries)
    pairs verbatim."""
    pq_centroids, shards = index
    return sharded_ivf_index_stats(shards, skew_threshold=skew_threshold)


# --------------------------- hard-negative mining ---------------------------


def mine_hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    method: str = "brute",
    **ann_kwargs,
) -> DataFrame:
    """Hard negatives for retrieval/embedding training: per query, the
    ``k`` most-similar corpus items that are NOT labeled positives — the
    standard contrastive-training data-prep step (easy random negatives
    teach a model nothing once it separates topics; the negatives that
    matter are the near-misses this mines).

    ``positives``: (query_id, corpus_id) labeled pairs. ``method``:
    ``'brute'`` (exact, broadcast queries — the oracle-checkable face) or
    ``'lsh'`` (bucketed candidates at corpus scale). Ranking is dense
    per query AFTER the positive/self exclusion, so the output is always
    the top-k true negatives, not a top-k with holes.

    Shape: the candidate generation is whatever the underlying searcher
    does; the exclusion is one left_anti join against the (slim) label
    pairs; re-ranking is the usual per-query window over ≤ a few·k rows.
    """
    overfetch = k + 1  # self-match occupies one slot in the underlying top-k
    n_pos = None
    if method == "brute":
        # fetch enough that dropping positives+self still leaves k:
        # positives per query are bounded by the label table (small);
        # cap the overfetch at k + max positives per query + 1
        n_pos = (
            positives.groupBy(query_id).count().agg(F.max("count")).collect()[0][0]
        )
        overfetch = k + int(n_pos or 0) + 1
        cand = brute_force_topk(
            queries, corpus, query_id=query_id, corpus_id=corpus_id,
            vec_col=vec_col, k=overfetch,
        )
    elif method == "lsh":
        n_pos = (
            positives.groupBy(query_id).count().agg(F.max("count")).collect()[0][0]
        )
        overfetch = k + int(n_pos or 0) + 1
        cand = lsh_ann_topk(
            queries, corpus, query_id=query_id, corpus_id=corpus_id,
            vec_col=vec_col, k=overfetch, **ann_kwargs,
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    neg = cand.join(
        positives.select(
            F.col(query_id).alias("query_id"),
            F.col(corpus_id).alias("neighbor_id"),
        ),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", 6).alias("cosine"), "neg_rank")
    )
