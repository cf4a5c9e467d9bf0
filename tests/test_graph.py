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


def test_label_prop_crafted(spark):
    """Propagation semantics on a crafted graph: a seed's label floods its
    chain one hop per round, majority beats minority, ties break to the
    lexicographically smallest label, and disconnected unlabeled nodes
    stay NULL. Drives the operator's own loop via `label_propagate`."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import graph as G

    # chain 1-2-3-4 seeded 'en' at 1; triangle 10-11-12 with seeds 'de'(10)
    # and 'aa'(11) -> node 12 sees tie {de, aa} -> 'aa'; isolated pair 20-21
    pairs = [(1, 2), (2, 3), (3, 4), (10, 12), (11, 12), (20, 21)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    seeds = spark.createDataFrame(
        [(1, True, "en"), (2, False, None), (3, False, None), (4, False, None),
         (10, True, "de"), (11, True, "aa"), (12, False, None),
         (20, False, None), (21, False, None)],
        "doc_id long, is_seed boolean, label string",
    )
    labels = G.label_propagate(edges, seeds)
    out = {r.doc_id: r for r in labels.collect()}
    assert (out[2].label, out[2].labeled_at) == ("en", 1)
    assert (out[3].label, out[3].labeled_at) == ("en", 2)
    assert (out[4].label, out[4].labeled_at) == ("en", 3)
    assert (out[12].label, out[12].labeled_at) == ("aa", 1)  # tie -> min
    # seeds clamped; back-propagation onto 10/11 never overwrites them
    assert out[10].label == "de" and out[11].label == "aa"
    assert out[20].label is None and out[21].label is None


def test_label_prop_fixture_and_parity(spark, duck):
    """Fixture: every seed keeps its label and labeled_at=0; non-seeds are
    labeled only if reachable from a seed; plus the driver-style oracle
    comparison."""
    import __spark_entry__ as entrymod
    from tests.conftest import compare_with_oracle

    from boletia_kubernetes_kafka_mongodb_spark.operators import graph as G

    out = G.ext_graph_label_prop(spark, "/root/testdata/sf0.01").collect()
    assert len(out) > 0
    for r in out:
        if r.is_seed:
            assert r.label is not None and r.labeled_at == 0
        if r.label is not None and not r.is_seed:
            assert 1 <= r.labeled_at <= G.LP_ITERS
    labeled = sum(1 for r in out if r.label is not None)
    seeds = sum(1 for r in out if r.is_seed)
    assert labeled >= seeds  # propagation never loses labels
    compare_with_oracle(
        spark, duck,
        entrymod.queries()["ext_graph_label_prop"],
        entrymod.oracle_sql()["ext_graph_label_prop"],
    )


def test_pagerank_three_tiers_bit_equal(spark):
    """The numpy driver fast path, the broadcast loop, and the
    co-partitioned shuffle loop produce IDENTICAL integer ranks (int64
    floor-div ≡ Spark DIV ≥ 0; the tier only changes the physical join
    strategy, never the arithmetic)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import dedup as D

    pairs = D.ext_dedup_ngram_jaccard(spark, "/root/testdata/sf0.01").select(
        "doc_a", "doc_b"
    )
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    a = sorted(map(tuple, graph._pagerank_nano(spark, edges, driver_max_edges=10**9).collect()))
    b = sorted(map(tuple, graph._pagerank_nano(spark, edges, driver_max_edges=0).collect()))
    c = sorted(map(tuple, graph._pagerank_nano(
        spark, edges, driver_max_edges=0, broadcast_nodes_max=0
    ).collect()))
    assert a == b == c and len(a) > 0


def test_label_prop_three_tiers_bit_equal(spark):
    from boletia_kubernetes_kafka_mongodb_spark.operators import dedup as D
    from boletia_kubernetes_kafka_mongodb_spark.operators import graph as G

    sf = "/root/testdata/sf0.01"
    pairs = D.ext_dedup_ngram_jaccard(spark, sf).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    seeds = G.lp_seed_frame(spark, sf, edges)
    a = sorted(map(tuple, G.label_propagate(edges, seeds, driver_max_edges=10**9).collect()))
    b = sorted(map(tuple, G.label_propagate(edges, seeds, driver_max_edges=0).collect()))
    c = sorted(map(tuple, G.label_propagate(
        edges, seeds, driver_max_edges=0, broadcast_nodes_max=0
    ).collect()))
    assert a == b == c and len(a) > 0


def test_pagerank_shuffle_tier_plan_gate(spark):
    """Tier 3's contract, proven on the plan: with the node-broadcast gate
    forced, (a) the per-iteration contribution step contains NO broadcast
    exchange/join, and (b) the cached src-partitioned adjacency is NOT
    re-exchanged — the only exchanges are the node-sized rank side and the
    map-side-combined (dst, sum) aggregation."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(i % 40, (i * 7) % 40) for i in range(600) if i % 40 != (i * 7) % 40],
        "src long, dst long",
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    adj = edges.join(deg, "src").repartition(nparts, "src").persist()
    adj.count()
    try:
        ranks = deg.select(
            F.col("src").alias("doc_id"), F.lit(1000).cast("long").alias("r")
        ).localCheckpoint(eager=True)
        step = graph._pr_contribs(adj, ranks, broadcast_ranks=False)
        step.collect()  # resolve AQE to the final plan
        plan = step._jdf.queryExecution().executedPlan().toString()
        # the ONE-TIME cache build (edges ⋈ deg, repartition) legitimately
        # plans its own joins/exchanges and is printed as the
        # InMemoryRelation subtree — the PER-ITERATION contract applies to
        # the outer plan, everything above the first InMemoryRelation
        outer = plan.split("InMemoryRelation")[0]
        # the rank side enters through a shuffled hash join, never a
        # broadcast (a broadcast plan would print BroadcastHashJoin here)
        assert "ShuffledHashJoin" in outer, plan
        assert "Broadcast" not in outer, plan
        # and the cached adjacency is consumed in place: no src-keyed
        # exchange may appear above the cache scan
        import re

        assert "InMemoryTableScan" in outer, plan
        assert not re.search(r"Exchange hashpartitioning\(src", outer), plan
    finally:
        adj.unpersist()


def test_label_prop_shuffle_tier_plan_gate(spark):
    """Tier-3 contract for the propagation rounds, proven on the plan:
    with the node-broadcast gate forced, the per-round vote step joins
    the frontier via shuffle-hash (never a broadcast) and consumes the
    cached src-partitioned edge frame in place (no src-keyed exchange
    above the cache scan) — the `_pr_contribs` gate, for label prop."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(i % 40, (i * 7) % 40) for i in range(600) if i % 40 != (i * 7) % 40],
        "src long, dst long",
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_p = edges.repartition(nparts, "src").persist()
    edges_p.count()
    try:
        lab = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "fr") for i in range(40)],
            "src_id long, nl string",
        ).localCheckpoint(eager=True)
        step = graph._lp_votes(edges_p, lab, broadcast_frontier=False)
        step.collect()
        plan = step._jdf.queryExecution().executedPlan().toString()
        outer = plan.split("InMemoryRelation")[0]
        assert "ShuffledHashJoin" in outer, plan
        assert "Broadcast" not in outer, plan
        import re

        assert "InMemoryTableScan" in outer, plan
        assert not re.search(r"Exchange hashpartitioning\(src", outer), plan
    finally:
        edges_p.unpersist()


def test_label_prop_incomplete_seed_frame_paths_agree(spark):
    """A vertex present in edges but ABSENT from the seed frame (round-6
    ADVICE): the distributed path silently drops such vertices (they never
    exist in the labels frame), so the driver path must do exactly the
    same — not crash in searchsorted or misattribute votes. The crafted
    graph routes a label THROUGH the missing vertex 99 (2-99, 99-3): with
    99 dropped, 3 must stay unlabeled on both paths."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import graph as G

    pairs = [(1, 2), (2, 99), (99, 3), (4, 5)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    # 99 (mid-chain) and 5 (max id — the out-of-range searchsorted case)
    # are missing from the seed frame
    seeds = spark.createDataFrame(
        [(1, True, "en"), (2, False, None), (3, False, None), (4, True, "fr")],
        "doc_id long, is_seed boolean, label string",
    )
    a = sorted(map(tuple, G.label_propagate(edges, seeds, driver_max_edges=10**9).collect()))
    b = sorted(map(tuple, G.label_propagate(edges, seeds, driver_max_edges=0).collect()))
    assert a == b
    out = {r[0]: r for r in a}
    assert set(out) == {1, 2, 3, 4}          # 99 and 5 dropped, both paths
    assert out[2][2] == "en" and out[3][2] is None
    assert out[4][2] == "fr"


def test_survivor_rank_invariants_and_parity(spark, duck):
    """Each component has exactly one canonical member; the canonical is
    the component's max-rank (tie min-id); components agree with the
    clusters operator; plus the driver-style composed-oracle comparison."""
    import __spark_entry__ as entrymod
    from tests.conftest import compare_with_oracle

    from boletia_kubernetes_kafka_mongodb_spark.operators import dedup as D
    from boletia_kubernetes_kafka_mongodb_spark.operators import graph as G

    sf = "/root/testdata/sf0.01"
    out = G.ext_graph_survivor_rank(spark, sf).collect()
    assert len(out) > 0
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1, comp
        best = max(members, key=lambda m: (m.rank_nano, -m.doc_id))
        assert canon[0].doc_id == best.doc_id
    clusters = {
        r.doc_id: r.component for r in D.ext_dedup_clusters(spark, sf).collect()
    }
    for r in out:
        assert clusters[r.doc_id] == r.component
    compare_with_oracle(
        spark, duck,
        entrymod.queries()["ext_graph_survivor_rank"],
        entrymod.oracle_sql()["ext_graph_survivor_rank"],
    )


def test_pagerank_random_graphs_match_reference(spark):
    """Property: on random undirected graphs the numpy driver path equals
    the plain-python integer reference bit-for-bit (hypothesis over edge
    sets; bounded examples — each builds one small Spark frame)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    pair_st = st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda t: t[0] != t[1])

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.sets(pair_st, min_size=1, max_size=25))
    def run(raw_pairs):
        pairs = sorted({(min(a, b), max(a, b)) for a, b in raw_pairs})
        edges = spark.createDataFrame(
            [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
            "src long, dst long",
        )
        got = {
            r.doc_id: r.rank_nano
            for r in graph._pagerank_nano(spark, edges, driver_max_edges=10**9).collect()
        }
        assert got == _pagerank_reference(pairs)

    run()


def test_graph_ops_empty_graph_safe(spark):
    """Empty edge/seed frames flow through both graph operators' gated
    paths without error and with stable schemas (the zero-near-dup corpus
    case a clean dataset hits on day one)."""
    edges = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([], "doc_id long, is_seed boolean, label string")
    lp = graph.label_propagate(edges, seeds)
    assert lp.count() == 0
    assert [f.name for f in lp.schema.fields] == [
        "doc_id", "is_seed", "label", "labeled_at",
    ]
    pr = graph._pagerank_nano(spark, edges)
    assert pr.count() == 0
    assert [f.name for f in pr.schema.fields] == ["doc_id", "degree", "rank_nano"]


# ---------------------------------------------------------------------------
# round 8: tier-3 super-hub split (dst-partitioned hub cache + bounded
# broadcasts) — the round-7 verdict's named scale-killer
# ---------------------------------------------------------------------------


def _hot_hub_edges(spark):
    """A template-clique shape: vertex 0 is a super-hub adjacent to
    1..200; the tail 201..260 forms a sparse ring. Symmetric."""
    pairs = [(0, i) for i in range(1, 201)] + [
        (200 + i, 200 + (i % 60) + 1) for i in range(1, 61) if 200 + i != 200 + (i % 60) + 1
    ]
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(rows)), "src long, dst long")


def test_pagerank_hub_split_bit_equal(spark):
    """Forcing tier 3 WITH the hub split engaged (hub_degree_min below the
    hub's degree) produces bit-identical ranks to the numpy driver path —
    integer shares keep the per-dst sum order-independent across the
    union of the src-partitioned and dst-partitioned branches."""
    edges = _hot_hub_edges(spark)
    a = sorted(map(tuple, graph._pagerank_nano(spark, edges, driver_max_edges=10**9).collect()))
    b = sorted(map(tuple, graph._pagerank_nano(
        spark, edges, driver_max_edges=0, broadcast_nodes_max=0, hub_degree_min=50
    ).collect()))
    # and with EVERY vertex a hub (main cache empty — pure hub path)
    c = sorted(map(tuple, graph._pagerank_nano(
        spark, edges, driver_max_edges=0, broadcast_nodes_max=0, hub_degree_min=0
    ).collect()))
    assert a == b == c and len(a) > 0


def test_label_prop_hub_split_bit_equal(spark):
    edges = _hot_hub_edges(spark)
    seeds = edges.selectExpr("src AS doc_id").distinct().selectExpr(
        "doc_id",
        "doc_id % 3 = 0 AS is_seed",
        "CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'fr' END) END AS label",
    )
    a = sorted(map(tuple, graph.label_propagate(
        edges, seeds, driver_max_edges=10**9
    ).collect()))
    b = sorted(map(tuple, graph.label_propagate(
        edges, seeds, driver_max_edges=0, broadcast_nodes_max=0, hub_degree_min=50
    ).collect()))
    c = sorted(map(tuple, graph.label_propagate(
        edges, seeds, driver_max_edges=0, broadcast_nodes_max=0, hub_degree_min=0
    ).collect()))
    assert a == b == c and len(a) > 0


def test_hub_split_partition_spread(spark):
    """The point of the split: the hub's adjacency rows spread ~evenly
    across partitions (dst-hash), instead of landing whole in the one
    src-hash partition; and the src-partitioned main cache holds NO hub
    rows. Max per-partition hub rows must be far below the hub degree."""
    edges = _hot_hub_edges(spark)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    main, hub_adj, hubs = graph._hub_split(edges.join(deg, "src"), deg, nparts, 50)
    try:
        assert hub_adj is not None
        assert [r.hub_src for r in hubs.collect()] == [0]
        assert main.where(F.col("src") == 0).count() == 0
        hub_degree = hub_adj.count()
        per_part = (
            hub_adj.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        # 200 rows over 32 dst-hash partitions: max ~ binomial tail, far
        # below the whole-hub-in-one-task 200 of the unsplit layout
        assert per_part <= max(hub_degree // 4, 1), (per_part, hub_degree)
    finally:
        graph._hub_unpersist(main, hub_adj)


def test_hub_split_empty_when_no_hubs(spark):
    """Below-threshold graphs take the EXACT pre-split path: no hub cache,
    no extra plan branches."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    main, hub_adj, hubs = graph._hub_split(edges.join(deg, "src"), deg, 4, 50)
    try:
        assert hub_adj is None and hubs is None
        assert main.count() == 4
    finally:
        graph._hub_unpersist(main, hub_adj)


def test_pagerank_hub_branch_plan_gate(spark):
    """Plan contract of the split contribution step: the non-hub branch
    still enters via ShuffledHashJoin with the src-partitioned cache
    consumed in place (no src-keyed exchange above the cache scan), and
    the hub branch's joins are broadcasts whose builds derive from the
    bounded hub frame (the hub-id semi-join + the hub-rank join) — never
    a broadcast of the full rank frame."""
    import re

    edges = _hot_hub_edges(spark)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    main, hub_adj, hubs = graph._hub_split(edges.join(deg, "src"), deg, nparts, 50)
    try:
        ranks = deg.select(
            F.col("src").alias("doc_id"), F.lit(1000).cast("long").alias("r")
        ).localCheckpoint(eager=True)
        step = graph._pr_contribs(
            main, ranks, broadcast_ranks=False, hub_adj=hub_adj, hubs=hubs
        )
        step.collect()
        plan = step._jdf.queryExecution().executedPlan().toString()
        # plan text prints union branch 1 (main) fully — including its
        # cache-build subtree — before branch 2, so the region above the
        # FIRST InMemoryRelation is exactly the per-iteration main branch
        outer = plan.split("InMemoryRelation")[0]
        # main branch: the rank side enters shuffled-hash, never broadcast,
        # and nothing re-exchanges the src-partitioned adjacency
        assert "ShuffledHashJoin" in outer, plan
        assert "BroadcastHashJoin" not in outer, plan
        assert not re.search(r"Exchange hashpartitioning\(src", outer), plan
        # hub branch in isolation (the exact frames _pr_contribs builds):
        # the hub-rank join is a broadcast whose build derives from the
        # bounded hub frame, consuming the dst-partitioned cache in place
        # — no exchange at all above the cache scan
        hub_ranks = ranks.join(
            F.broadcast(hubs), ranks["doc_id"] == hubs["hub_src"], "left_semi"
        )
        hb = hub_adj.join(
            F.broadcast(hub_ranks), hub_adj["src"] == hub_ranks["doc_id"]
        ).select("dst", F.expr("r DIV d").alias("share"))
        hb.collect()
        hplan = hb._jdf.queryExecution().executedPlan().toString()
        houter = hplan.split("InMemoryRelation")[0]
        assert "BroadcastHashJoin" in houter, hplan
        assert "Exchange hashpartitioning" not in houter, hplan
    finally:
        graph._hub_unpersist(main, hub_adj)


# ---------------------------------------------------------------------------
# optimization round 13: cached-array driver fast paths
# ---------------------------------------------------------------------------


def test_driver_fast_paths_equal_spark_frame_formulation(spark):
    """The cached-array fast paths the sf-dir entry points take in the
    driver tier (collect-once pair arrays, per-graph sym/cc index caches,
    numpy per-component argmax) are row-identical to the original
    Spark-frame composition (symmetric-union frame → _pagerank_nano /
    label_propagate / _connected_components → join + window) on the real
    dataset — the optimization changed the physical path, not one bit of
    the contract."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from boletia_kubernetes_kafka_mongodb_spark.operators import dedup as D
    from boletia_kubernetes_kafka_mongodb_spark.operators import graph as G

    sf = "/root/testdata/sf0.001"
    pairs = G._jaccard_pairs_cache(spark, sf)
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )

    # pagerank: fast path vs _pagerank_nano over the symmetric frame
    fast_pr = sorted(map(tuple, G.ext_graph_pagerank(spark, sf).collect()))
    slow_pr = sorted(map(tuple, G._pagerank_nano(spark, edges).collect()))
    assert fast_pr == slow_pr

    # label prop: fast path vs label_propagate over frame + seed frame
    fast_lp = sorted(map(tuple, G.ext_graph_label_prop(spark, sf).collect()))
    slow_lp = sorted(
        map(
            tuple,
            G.label_propagate(
                edges, G.lp_seed_frame(spark, sf, edges)
            ).collect(),
        )
    )
    assert fast_lp == slow_lp

    # survivor rank: fast path vs the join + window composition
    ranks = G._pagerank_nano(spark, edges).select("doc_id", "rank_nano")
    comp = D._connected_components(spark, pairs, materialized=True).select(
        "doc_id", "component"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("rank_nano"), F.asc("doc_id")
    )
    slow_sr = sorted(
        map(
            tuple,
            comp.join(ranks, "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .select(
                "doc_id",
                "component",
                "rank_nano",
                (F.col("rn") == 1).alias("is_canonical"),
            )
            .collect(),
        )
    )
    fast_sr = sorted(map(tuple, G.ext_graph_survivor_rank(spark, sf).collect()))
    assert fast_sr == slow_sr
