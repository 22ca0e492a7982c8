"""PageRank pins: exact agreement with a driver-side integer-arithmetic
reference (same fixed-point formula), dangling-mass redistribution, mass
conservation, ranking sanity on known shapes, partition invariance."""

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.graph import pagerank

SCALE = 10**12


def _reference(edges, iterations, damping_pct=85, scale=SCALE):
    """Bit-exact Python replica of the operator's integer recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = ((100 - damping_pct) * scale) // (100 * n)
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += rank[u] // deg[u]
        dang = sum(rank[v] for v in nodes if v not in deg)
        rank = {
            v: base + (damping_pct * (contrib[v] + dang // n)) // 100
            for v in nodes
        }
    return rank


def _run(spark, edges, iterations=5, partitions=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    if partitions:
        df = df.repartition(partitions)
    out = pagerank(df, iterations=iterations)
    return {r["id"]: r["rank_units"] for r in out.collect()}


CHAIN = [(1, 2), (2, 3), (3, 4)]                     # 4 has no out-links
STAR = [(2, 1), (3, 1), (4, 1), (1, 2)]              # everything points at 1
CYCLE = [(1, 2), (2, 3), (3, 1)]


@pytest.mark.parametrize("edges", [CHAIN, STAR, CYCLE], ids=["chain", "star", "cycle"])
def test_matches_integer_reference(spark, edges):
    assert _run(spark, edges) == _reference(edges, 5)


def test_dangling_mass_redistributed(spark):
    # node 4 is a sink; without redistribution its inflow would leak every
    # round and total mass would collapse toward base*n
    got = _run(spark, CHAIN, iterations=10)
    total = sum(got.values())
    assert total > 0.97 * SCALE  # truncation loses <1 unit/term/round only


def test_hub_ranks_highest(spark):
    # the 1<->2 two-cycle oscillates with amplitude decaying x0.7225/round;
    # 24 rounds put the ordering at its fixpoint values
    got = _run(spark, STAR, iterations=24)
    assert got[1] == max(got.values())
    assert got[1] > 2 * got[3]


def test_cycle_is_symmetric(spark):
    got = _run(spark, CYCLE, iterations=7)
    assert len(set(got.values())) == 1  # perfect symmetry, bit-identical


def test_partition_invariance(spark):
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, (i * 11 + 1) % 40) for i in range(40)
    ]
    assert _run(spark, edges, partitions=1) == _run(spark, edges, partitions=13)


def test_empty_edges_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df)


class TestLabelPropagation:
    """Deterministic synchronous LPA: convergence on planted communities,
    tie-break totality, partition invariance."""

    def _lpa(self, spark, edges, **kw):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.graph import label_propagation
        df = spark.createDataFrame(edges, "src long, dst long")
        return {r["id"]: r["label"]
                for r in label_propagation(df, **kw).collect()}

    def test_two_cliques_converge_to_two_communities(self, spark):
        k4a = [(i, j) for i in range(4) for j in range(4) if i < j]
        k4b = [(i + 10, j + 10) for i, j in k4a]
        labels = self._lpa(spark, k4a + k4b, iterations=4)
        assert len({labels[i] for i in range(4)}) == 1
        assert len({labels[i + 10] for i in range(4)}) == 1
        assert labels[0] != labels[10]

    def test_star_adopts_hub_or_leaf_minimum(self, spark):
        # hub 0 with leaves 1..5: after round 1 every leaf holds 0 (their
        # only neighbor) and the hub holds 1 (smallest leaf label); the
        # fixed tie-break makes the outcome exactly reproducible.
        labels = self._lpa(spark, [(0, i) for i in range(1, 6)], iterations=1)
        assert all(labels[i] == 0 for i in range(1, 6))
        assert labels[0] == 1

    def test_partition_invariance(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.graph import label_propagation
        edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
            (i, (i * 7 + 2) % 40) for i in range(40)
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = sorted(tuple(r) for r in label_propagation(df, iterations=3).collect())
        b = sorted(
            tuple(r)
            for r in label_propagation(df.repartition(13), iterations=3).collect()
        )
        assert a == b

    def test_directed_respects_edge_direction(self, spark):
        # 0 -> 1 -> 2 chain, directed: only in-neighbors vote, so node 0
        # (no in-edges) keeps its own label through every round.
        labels = self._lpa(spark, [(0, 1), (1, 2)], iterations=3, directed=True)
        assert labels[0] == 0


class TestTriangleCounts:
    """Degree-ordered triangle counting equals brute force; orientation
    dedup handles hubs, duplicates, self-loops."""

    def _tc(self, spark, edges):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.graph import triangle_counts
        df = spark.createDataFrame(edges, "src long, dst long")
        return {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}

    def test_known_shapes(self, spark):
        # K4: every node is in C(3,2)=3 triangles
        k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
        assert self._tc(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
        # a path has none
        assert self._tc(spark, [(0, 1), (1, 2), (2, 3)]) == {0: 0, 1: 0, 2: 0, 3: 0}

    def test_duplicates_reverses_and_self_loops_ignored(self, spark):
        tri = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
        assert self._tc(spark, tri) == {0: 1, 1: 1, 2: 1}

    def test_hub_graph_equals_brute_force(self, spark):
        import itertools, random
        rng = random.Random(5)
        edges = [(0, i) for i in range(1, 20)]  # hub
        edges += [(rng.randint(1, 19), rng.randint(1, 19)) for _ in range(40)]
        adj = set()
        for a, b in edges:
            if a != b:
                adj.add((min(a, b), max(a, b)))
        want = {n: 0 for n in {x for e in adj for x in e}}
        for x, y, z in itertools.combinations(sorted(want), 3):
            if (x, y) in adj and (y, z) in adj and (x, z) in adj:
                for n in (x, y, z):
                    want[n] += 1
        assert self._tc(spark, edges) == want
