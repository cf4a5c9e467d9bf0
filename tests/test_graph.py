"""Graph operators: integer PageRank over the near-dup graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark.operators import graph


def _pagerank_reference(edge_pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Plain-python replay of the integer nano-rank contract."""
    edges: list[tuple[int, int]] = []
    for a, b in edge_pairs:
        edges.append((a, b))
        edges.append((b, a))
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    init = graph.PR_SCALE // n
    base = (graph.PR_SCALE - graph.PR_DAMP_NUM * graph.PR_SCALE // 100) // n
    r = {v: init for v in deg}
    for _ in range(graph.PR_ITERS):
        acc: dict[int, int] = {v: 0 for v in deg}
        for s, d in edges:
            acc[d] += r[s] // deg[s]
        r = {v: base + (graph.PR_DAMP_NUM * acc[v]) // 100 for v in deg}
    return r


def test_pagerank_matches_python_reference(spark):
    # path + triangle + star: mixed degrees, no symmetry shortcuts
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (5, 7), (5, 8)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    got = {r.doc_id: r.rank_nano for r in graph._pagerank_nano(spark, edges).collect()}
    assert got == _pagerank_reference(pairs)


def test_pagerank_hub_outranks_leaf(spark):
    pairs = [(10, i) for i in range(1, 6)]  # star: 10 is the hub
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    rows = {r.doc_id: r for r in graph._pagerank_nano(spark, edges).collect()}
    assert rows[10].degree == 5
    assert all(rows[10].rank_nano > rows[i].rank_nano for i in range(1, 6))
    # leaves are symmetric → identical integer ranks
    assert len({rows[i].rank_nano for i in range(1, 6)}) == 1


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out = graph._pagerank_nano(spark, edges)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "degree", "rank_nano"]


def test_pagerank_mass_nearly_conserved(spark):
    """Integer division leaks ≤ 1 nano-unit per node per step — total mass
    stays within ITERS × N of the 1e9 scale (the contract's known bias)."""
    out = graph.ext_graph_pagerank(spark, "/root/testdata/sf0.001")
    agg = out.agg(F.sum("rank_nano").alias("m"), F.count("*").alias("n")).collect()[0]
    if agg.n == 0:
        return
    # every DIV floors: per step each node leaks up to deg-1 nano-units of
    # share remainder, so drift scales with edge count — bound at 1%
    assert graph.PR_SCALE * 0.99 <= agg.m <= graph.PR_SCALE
