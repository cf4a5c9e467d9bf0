"""Graph analytics over the near-dup document graph (§2.9 extensions).

The near-dup pair graph (nodes = documents, edges = Jaccard ≥ threshold
pairs from the tiled exact kernel in ``dedup.py``) supports more than
cluster collapse: link-analysis centrality ranks the *canonical-ness* of
documents inside large duplicate neighbourhoods — the web-graph quality
prior a CommonCrawl-style curation pipeline uses to pick which near-dup
copy to keep and to weight sampling (PageRank; Brin & Page 1998).

Cross-engine determinism: the power iteration runs in **integer
nano-units** (rank scaled by 1e9 as BIGINT). Each step is

    share(u)   = R(u) DIV deg(u)                 (exact integer)
    R'(v)      = BASE + (85 * Σ_{u→v} share(u)) DIV 100
    BASE       = 150_000_000 DIV N               ((1-d)/N scaled, d=0.85)

All-BIGINT arithmetic makes the per-node sum order-independent and every
iteration bit-identical on any engine — the same trick the admission
ledger uses for seq packing — so the DuckDB oracle replays the *entire*
8-step iteration and the driver hash gates every rank value exactly.
(A float formulation would hash-drift: Σ over in-neighbours is
order-dependent in IEEE doubles, and 6dp rounding can't absorb a
knife-edge half-ulp at the rounding boundary.)

Scale design (100 TB) — THREE gated physical strategies, all bit-equal:

1. **Driver** (≤ ``dedup.DRIVER_CC_MAX_EDGES`` edges): vectorized numpy
   iteration over Arrow-collected edge arrays — milliseconds where the
   whole graph is broadcast-sized anyway.
2. **Broadcast loop** (edges above the gate, nodes ≤
   ``BROADCAST_NODES_MAX``): the adjacency (edge-sized) never moves
   after its one checkpoint — each iteration BROADCASTS the node-sized
   rank frame into a map-side join and reduces contributions with a
   map-side-combined groupBy, so the only per-iteration shuffle is the
   already-combined (dst, sum) frame (measured 30.7 s → ~4 s at sf0.1
   vs the join-shuffle formulation).
3. **Co-partitioned shuffle loop** (nodes above ``BROADCAST_NODES_MAX``
   — the node frame no longer fits one executor): the adjacency is
   hash-repartitioned on ``src`` ONCE and persisted; each iteration
   shuffle-hash-joins the node-sized rank frame against it (the cached
   `InMemoryRelation` keeps its outputPartitioning, so the edge side
   never re-exchanges — verified in the plan gate; PySpark
   `localCheckpoint` would lose it, hence persist for the adjacency).
   Per-iteration cost: two node-sized exchanges (ranks in, combined
   (dst, sum) out), no node-sized broadcasts, build side ≈
   nodes/partitions.

   **Super-hub split (round 8):** hash-partitioning the adjacency by
   ``src`` lands a pathological-degree source key whole in one
   partition — and near-dup graphs produce exactly such hubs
   (boilerplate/template cliques). Sources with degree >
   ``HUB_DEGREE_MIN`` are therefore split out at setup into a SECOND
   cached adjacency partitioned by ``dst`` (a hub's edges spread
   evenly — strictly better than salting, which still leaves D/S rows
   per salt and needs rank-row replication). The hub id list is
   bounded by edges/HUB_DEGREE_MIN (≤ ~25k rows even at 10^11 edges),
   so each iteration extracts the hubs' CURRENT ranks by a broadcast
   semi-join (tiny build — never node-sized) and broadcast-joins that
   hub-rank frame onto the dst-partitioned hub adjacency; the two
   (dst, share) branches union below one map-side-combined groupBy.
   Integer shares make the per-dst sum order-independent, so the
   split path stays bit-equal to every other tier (pinned by a forced
   hot-hub equality test + a partition-spread test).

Rank lineage is truncated every iteration so the plan never grows with
the iteration count. The single driver-side scalar is ``N`` (one
count), the same bounded-collect class as the IVF layout stats.

Reference parity: the reference engine (Go, pcKafka/pcRestaurar) has no
graph operator — this is part of the mandated training-data-pipeline
extension surface (brief: dedup survivor selection / quality priors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup

PR_ITERS = 8            # fixed power-iteration count (state: iter ∈ [0, 8])
PR_DAMP_NUM = 85        # damping d = 85/100 in integer arithmetic
PR_SCALE = 1_000_000_000  # rank unit: 1e-9 (BIGINT nano-ranks)
# node count above which the per-iteration rank/frontier frame stops being
# broadcast and the loops switch to the co-partitioned shuffle-hash tier
# (~100M nodes ≈ a few GB of (id, rank) rows — the executor-memory wall)
BROADCAST_NODES_MAX = 100_000_000
# tier-3 out-degree above which a source's adjacency is split into the
# dst-partitioned hub cache instead of the src-partitioned one (see the
# module docstring): 4M rows ≈ a couple of average partitions at the
# node counts tier 3 exists for, and caps the hub id list at
# edges/4M (~25k rows at 10^11 edges — always broadcastable)
HUB_DEGREE_MIN = 4_000_000

_JACCARD_PAIRS_CACHE: dict = {}


def _jaccard_pairs_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_a, doc_b) exact-Jaccard pair list, kernel-run + checkpointed
    ONCE per (application, dataset signature) — three graph operators
    consume the same edge source, and without the cache each re-runs the
    tiled kernel (~1.5 s at sf0.1) and re-materializes its own checkpoint
    (the `_minhash_band_keys_cache` discipline; content-signature-keyed
    via `dataset_cache_get`)."""
    from ..sources.layouts import dataset_cache_get

    return dataset_cache_get(
        _JACCARD_PAIRS_CACHE,
        spark,
        sf_dir,
        "documents",
        lambda: dedup.ext_dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True),
        tag="graph-pairs",
    )


_PAIR_ARRAYS_CACHE: dict = {}


def _pair_arrays(spark: SparkSession, sf_dir: str):
    """``(n_pairs, arrays)`` for the cached pair list, Arrow-collected ONCE
    per (application, dataset signature); ``arrays`` is the (doc_a, doc_b)
    int64 numpy pair — or None when the graph is beyond the driver tier
    (the gate runs BEFORE any collect, so no code path ever pulls an
    unbounded edge list onto one node).

    Optimization-round rationale (guide §1/§5): all three graph operators'
    driver tiers previously re-collected the edge frame on EVERY
    invocation — `toArrow` of the 4.6M-row symmetric union was ~1.5 s per
    run at sf0.1, dwarfing the actual numpy kernels (~50 ms) — and re-ran
    the gate ``count()`` as a separate job. The pair list is exactly the
    frame `_jaccard_pairs_cache` already pins per dataset, so its count
    and collected form are cached under the same key discipline; the
    symmetric (src, dst) view is two O(n) numpy concatenations."""
    from ..sources.layouts import dataset_cache_get

    def _build():
        import numpy as np

        pairs = _jaccard_pairs_cache(spark, sf_dir)
        n = pairs.count()
        if 2 * n > dedup.DRIVER_CC_MAX_EDGES:
            return (n, None)  # distributed tiers: never collected
        tbl = pairs.toArrow()
        return (
            n,
            (
                tbl.column("doc_a").to_numpy().astype(np.int64, copy=False),
                tbl.column("doc_b").to_numpy().astype(np.int64, copy=False),
            ),
        )

    return dataset_cache_get(
        _PAIR_ARRAYS_CACHE, spark, sf_dir, "documents", _build, tag="graph-pair-arrays"
    )


def _sym_arrays(a, b):
    """Symmetric (src, dst) arrays from one-directional pair arrays —
    the numpy mirror of the ``unionByName`` both-directions frame."""
    import numpy as np

    return np.concatenate([a, b]), np.concatenate([b, a])


_CC_ARRAYS_CACHE: dict = {}


def _cc_arrays_cache(spark: SparkSession, sf_dir: str):
    """(nodes, component) of the pair graph's connected components, run
    once per (application, dataset signature) over the cached pair arrays
    — the min-label pointer-jumping result is a per-graph constant."""
    from ..sources.layouts import dataset_cache_get

    def _build():
        _, arrays = _pair_arrays(spark, sf_dir)
        return dedup._cc_core(*arrays)

    return dataset_cache_get(
        _CC_ARRAYS_CACHE, spark, sf_dir, "documents", _build, tag="graph-cc-arrays"
    )


_SYM_INDEX_CACHE: dict = {}


def _sym_index_cache(spark: SparkSession, sf_dir: str):
    """The driver tier's `_sym_index` (nodes, si, di, deg) built once per
    (application, dataset signature) from the cached pair arrays — the
    searchsorted/bincount constants are per-graph, not per-invocation.
    Returns None outside the driver tier."""
    from ..sources.layouts import dataset_cache_get

    def _build():
        _, arrays = _pair_arrays(spark, sf_dir)
        if arrays is None:
            return (None,)
        return (_sym_index(*_sym_arrays(*arrays)),)

    return dataset_cache_get(
        _SYM_INDEX_CACHE, spark, sf_dir, "documents", _build, tag="graph-sym-index"
    )[0]


def _pagerank_nano(
    spark: SparkSession,
    edges: DataFrame,
    driver_max_edges: int | None = None,
    broadcast_nodes_max: int | None = None,
    hub_degree_min: int | None = None,
) -> DataFrame:
    """(doc_id, degree, rank_nano) from a symmetric (src, dst) edge list.

    ``edges`` must already be symmetric (both directions present) and
    self-loop-free; every vertex therefore has degree ≥ 1 and receives at
    least one contribution per step, so no dangling-mass term is needed.

    Physical strategy by edge count — the `_connected_components` pattern
    (dedup.py): below DRIVER_CC_MAX_EDGES the edge list is broadcast-sized
    and a vectorized numpy scatter-add runs all 8 iterations in
    milliseconds (int64 floor-division ≡ Spark DIV for non-negatives, so
    the two paths are BIT-EQUAL — pinned by a both-paths equality test);
    above it, the distributed loop broadcasts the node-sized rank frame
    into a map-side join per step, so the only per-iteration shuffle is
    the map-side-combined (dst, sum) frame. Rank lineage is eagerly
    checkpointed EVERY iteration — each broadcast build otherwise replays
    the whole chain since the last checkpoint (recompute amplification
    measured at ~4× wall).
    """
    if driver_max_edges is None:
        driver_max_edges = dedup.DRIVER_CC_MAX_EDGES
    # no edge-frame checkpoint here: callers checkpoint the PAIR list and
    # the symmetric union is two cheap scans of it — materializing the
    # doubled frame cost more than every consumer combined (measured 2.9 s
    # vs ~1.6 s of rescans at sf0.1)
    n_edges = edges.count()
    if n_edges == 0:
        return spark.createDataFrame([], "doc_id long, degree long, rank_nano long")
    if n_edges <= driver_max_edges:
        return _pagerank_driver(spark, edges)
    return _pagerank_distributed(
        spark, edges.localCheckpoint(eager=True), broadcast_nodes_max, hub_degree_min
    )


def _edge_arrays(edges: DataFrame):
    """Collect (src, dst) int64 arrays via Arrow — `toPandas` without Arrow
    serializes row-by-row through the JVM (measured ~18 s for 4.6M edges
    at sf0.1; `toArrow` is ~1 s)."""
    import numpy as np

    tbl = edges.toArrow()
    return (
        tbl.column("src").to_numpy().astype(np.int64, copy=False),
        tbl.column("dst").to_numpy().astype(np.int64, copy=False),
    )


def _sym_index(src, dst):
    """(nodes, si, di, deg) index of a symmetric edge array pair — the
    per-graph constants every iteration gathers through, computed once."""
    import numpy as np

    nodes = np.unique(src)  # symmetric edges: src covers every vertex
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    return nodes, si, di, deg


def _pagerank_iter(nodes, si, di, deg):
    """The 8-step integer iteration over a prebuilt `_sym_index` — returns
    a pandas frame (doc_id, degree, rank_nano)."""
    import numpy as np
    import pandas as pd

    n = len(nodes)
    init = PR_SCALE // n
    base = (PR_SCALE - PR_DAMP_NUM * PR_SCALE // 100) // n
    r = np.full(n, init, dtype=np.int64)
    for _ in range(PR_ITERS):
        # share is PER NODE (R(u) DIV deg(u)): one n-sized divide, then a
        # single float64 gather per edge — identical integers to the old
        # per-edge r[si] // deg[si] form at an eighth of the memory
        # traffic (optimization round: the per-edge divide dominated the
        # driver kernel). float64 accumulation is EXACT here: every share
        # and every partial sum is an integer bounded by the 1e9 total
        # mass, far inside 2^53.
        sn = (r // deg).astype(np.float64)
        acc = np.bincount(di, weights=sn[si], minlength=n)
        r = base + (PR_DAMP_NUM * acc.astype(np.int64)) // 100
    return pd.DataFrame({"doc_id": nodes, "degree": deg, "rank_nano": r})


def _pagerank_core(src, dst):
    """The 8-step integer iteration as numpy scatter-adds over symmetric
    (src, dst) edge arrays — returns a pandas frame (doc_id, degree,
    rank_nano). Pure function of the arrays: the Spark-frame driver path
    and the cached-array fast path share these exact bits."""
    return _pagerank_iter(*_sym_index(src, dst))


def _pagerank_driver(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Driver fast path: the 8-step integer iteration as numpy scatter-adds
    over the (broadcast-sized) edge arrays — same contract, same bits."""
    src, dst = _edge_arrays(edges)
    return spark.createDataFrame(
        _pagerank_core(src, dst),
        "doc_id long, degree long, rank_nano long",
    )


def _pr_contribs(
    adj: DataFrame,
    ranks: DataFrame,
    broadcast_ranks: bool,
    hub_adj: DataFrame | None = None,
    hubs: DataFrame | None = None,
) -> DataFrame:
    """One power-iteration reduce: join ranks onto the (src, dst, d)
    adjacency and emit the map-side-combined (dst, Σ share) frame. The
    rank side enters either as a broadcast (tier 2) or as a shuffle-hash
    build side against the pre-partitioned cached adjacency (tier 3) —
    the arithmetic is identical, so the tiers stay bit-equal.

    Tier-3 hub split: when ``hub_adj`` (the dst-partitioned adjacency of
    super-hub sources) is present, the hubs' current ranks are extracted
    by a broadcast semi-join against the bounded ``hubs`` id frame and
    broadcast onto ``hub_adj`` — both broadcast builds are hub-count-
    sized, never node-sized. Integer shares keep the per-dst sum
    order-independent, so the union is bit-equal to the unsplit form."""
    r = F.broadcast(ranks) if broadcast_ranks else ranks.hint("shuffle_hash")
    shares = adj.join(r, adj["src"] == ranks["doc_id"]).select(
        "dst", F.expr("r DIV d").alias("share")
    )
    if hub_adj is not None:
        hub_ranks = ranks.join(
            F.broadcast(hubs), ranks["doc_id"] == hubs["hub_src"], "left_semi"
        )
        shares = shares.unionByName(
            hub_adj.join(F.broadcast(hub_ranks), hub_adj["src"] == hub_ranks["doc_id"])
            .select("dst", F.expr("r DIV d").alias("share"))
        )
    return shares.groupBy("dst").agg(F.sum("share").alias("s"))


def _hub_split(
    adj: DataFrame, deg: DataFrame, nparts: int, hub_degree_min: int
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """Split a joined (src, dst, …) adjacency into the src-partitioned
    main cache and (if any super-hubs exist) the dst-partitioned hub
    cache + the broadcastable hub id frame. Both caches are persisted
    (NOT localCheckpoint — the checkpoint scan reports
    UnknownPartitioning and would re-exchange every iteration); callers
    unpersist via `_hub_unpersist`. One bounded driver scalar: the hub
    count (≤ edges/hub_degree_min by construction)."""
    # persist (not localCheckpoint) so the hub filter runs ONCE — the
    # same frame gates on count, serves every per-iteration broadcast,
    # and is releasable in `_hub_unpersist` (round-8 ADVICE: the old
    # count-then-recheckpoint shape evaluated the filter twice and
    # pinned an unreleasable checkpoint RDD)
    hubs = deg.where(F.col("d") > hub_degree_min).select(
        F.col("src").alias("hub_src")
    ).persist()
    if hubs.count() == 0:
        hubs.unpersist()
        main = adj.repartition(nparts, "src").persist()
        main.count()
        return main, None, None
    main = adj.join(
        F.broadcast(hubs), adj["src"] == hubs["hub_src"], "left_anti"
    ).repartition(nparts, "src").persist()
    hub_adj = adj.join(
        F.broadcast(hubs), adj["src"] == hubs["hub_src"], "left_semi"
    ).repartition(nparts, "dst").persist()
    main.count()
    hub_adj.count()
    return main, hub_adj, hubs


def _hub_unpersist(
    main: DataFrame,
    hub_adj: DataFrame | None,
    hubs: DataFrame | None = None,
) -> None:
    main.unpersist()
    if hub_adj is not None:
        hub_adj.unpersist()
    if hubs is not None:
        hubs.unpersist()


def _pagerank_distributed(
    spark: SparkSession,
    edges: DataFrame,
    broadcast_nodes_max: int | None = None,
    hub_degree_min: int | None = None,
) -> DataFrame:
    """Distributed tiers 2 and 3: see the module docstring for the plan
    shapes. The tier split is on NODE count — the broadcast loop's rank
    frame must fit an executor; past `BROADCAST_NODES_MAX` the loop
    switches to shuffle-hash joins against a once-partitioned cached
    adjacency (persist, not localCheckpoint: the PySpark checkpoint scan
    reports UnknownPartitioning and would re-exchange the edge frame
    every iteration — verified, see the tier-3 plan gate), with
    super-hub sources split into a dst-partitioned cache served by
    bounded broadcasts (`_hub_split`)."""
    if broadcast_nodes_max is None:
        broadcast_nodes_max = BROADCAST_NODES_MAX
    if hub_degree_min is None:
        hub_degree_min = HUB_DEGREE_MIN
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    n = deg.count()
    init = PR_SCALE // n
    base = (PR_SCALE - PR_DAMP_NUM * PR_SCALE // 100) // n  # 150e6 DIV N
    broadcast_tier = n <= broadcast_nodes_max
    hub_adj = hubs = None
    # The adjacency build's join side is EXPLICIT, never estimate-driven:
    # the edge frame descends from a mapInPandas kernel through a
    # localCheckpoint, a chain whose static size estimate Catalyst can
    # wildly understate — at the 435M-edge x10 scale leg the optimizer
    # chose the EDGE side as the broadcast build (a multi-GB driver
    # collect that trips maxResultSize/driver memory before a single
    # iteration runs). deg is node-count-sized: broadcast it inside the
    # tier whose per-iteration broadcasts are node-sized anyway, and
    # shuffle-hash it in tier 3, where node count exceeds what an
    # executor should hold.
    dside = F.broadcast(deg) if broadcast_tier else deg.hint("shuffle_hash")
    if broadcast_tier:
        # adjacency with out-degree attached — reused every iteration
        adj = edges.join(dside, "src").localCheckpoint(eager=True)
    else:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj, hub_adj, hubs = _hub_split(
            edges.join(dside, "src"), deg, nparts, hub_degree_min
        )
    ranks = deg.select(F.col("src").alias("doc_id"), F.lit(init).cast("long").alias("r"))
    for i in range(PR_ITERS):
        contribs = _pr_contribs(
            adj, ranks, broadcast_ranks=broadcast_tier, hub_adj=hub_adj, hubs=hubs
        )
        ranks = contribs.select(
            F.col("dst").alias("doc_id"),
            (F.lit(base) + F.expr(f"({PR_DAMP_NUM} * s) DIV 100")).cast("long").alias("r"),
        ).localCheckpoint(eager=True)
    dg = F.broadcast(deg) if broadcast_tier else deg.hint("shuffle_hash")
    out = ranks.join(dg, ranks["doc_id"] == deg["src"]).select(
        "doc_id", F.col("d").alias("degree"), F.col("r").alias("rank_nano")
    )
    if not broadcast_tier:
        # every iteration's ranks frame is already checkpointed and the
        # final join re-derives deg from the checkpointed edge frame, so
        # the cached adjacency is no longer needed — but the final join
        # is still lazy, so materialize it before dropping the cache
        out = out.localCheckpoint(eager=True)
        _hub_unpersist(adj, hub_adj, hubs)
    return out


def ext_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup Jaccard graph (d=0.85, 8 iterations).

    Edge source: the same tiled exact-Jaccard pairs that feed
    ``ext_dedup_clusters`` — so rank is directly interpretable as
    "centrality inside a duplicate neighbourhood" and the two operators
    compose (rank the members of each component; keep the max-rank copy).

    Output: one row per vertex (documents touched by ≥ 1 near-dup pair)
    with its symmetric degree and the final integer nano-rank.
    """
    # driver tier reads the cached COLLECTED arrays (no per-invocation
    # count/toArrow jobs — guide §1.2/§5: the collects, not the numpy
    # kernel, dominated the old driver path); larger graphs build the
    # symmetric frame from the cached checkpoint exactly as before
    n_pairs, arrays = _pair_arrays(spark, sf_dir)
    if n_pairs == 0:
        return spark.createDataFrame([], "doc_id long, degree long, rank_nano long")
    if arrays is not None:
        return spark.createDataFrame(
            _pagerank_iter(*_sym_index_cache(spark, sf_dir)),
            "doc_id long, degree long, rank_nano long",
        )
    # cached checkpoint BEFORE symmetrizing: the union reads the pairs
    # twice, and the sibling graph ids share the same edge source
    pairs = _jaccard_pairs_cache(spark, sf_dir)
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    return _pagerank_nano(spark, edges)


def _sql_pagerank_ctes() -> str:
    """The deg → nv → pr CTE chain replaying the integer power iteration —
    expects ``edges (src, dst)`` already defined by the caller (the
    `_sql_clusters_ctes` composition pattern). Shared by the PageRank
    oracle and the survivor-rank composed oracle."""
    return f"""deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
        nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
        pr AS (
            SELECT 0 AS iter, src AS doc_id,
                   CAST((SELECT {PR_SCALE} // n FROM nv) AS BIGINT) AS r
            FROM deg
            UNION ALL
            SELECT iter + 1, doc_id,
                   CAST((SELECT {PR_SCALE - PR_DAMP_NUM * PR_SCALE // 100} // n FROM nv)
                        + ({PR_DAMP_NUM} * s) // 100 AS BIGINT) AS r
            FROM (
                SELECT p.iter AS iter, e.dst AS doc_id,
                       SUM(p.r // dg.d) AS s
                FROM pr p
                JOIN deg dg ON dg.src = p.doc_id
                JOIN edges e ON e.src = p.doc_id
                WHERE p.iter < {PR_ITERS}
                GROUP BY p.iter, e.dst
            )
        )"""


def ext_graph_pagerank_oracle() -> str:
    """DuckDB replay of the full integer power iteration: the recursive
    CTE advances one iteration per step (grouped aggregation over the
    working table — every intermediate BIGINT, so the replay is exact,
    not 6dp-close)."""
    pair_sql = dedup.ext_dedup_ngram_jaccard_oracle()
    return f"""
        WITH RECURSIVE pairs AS ({pair_sql}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        {_sql_pagerank_ctes()}
        SELECT p.doc_id, dg.d AS degree, p.r AS rank_nano
        FROM pr p JOIN deg dg ON dg.src = p.doc_id
        WHERE p.iter = {PR_ITERS}
    """


def ext_graph_survivor_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition the graph family exists for: resolve near-dup
    components AND rank their members, then keep the MAX-PAGERANK copy per
    component (tie → min doc_id) — centrality-based survivor selection
    instead of `ext_dedup_clusters`' min-id convention. The curation
    rationale: inside a duplicate neighbourhood the most-connected copy is
    the best-linked canonical version (the web-graph prior), not whichever
    happened to get the smallest id.

    One pair-kernel pass feeds BOTH stages: components via the gated
    connected-components machinery (`dedup._connected_components` — numpy
    pointer-jumping under the edge gate, star contraction above), ranks
    via `_pagerank_nano` (same gate). The final per-component argmax is a
    window over component — component-count-sized, tiny at any scale.

    Oracle: `_sql_clusters_ctes` (pairs/edges/verts/reach) composed with
    `_sql_pagerank_ctes` (deg/nv/pr) under ONE `WITH RECURSIVE` — two
    independent recursive CTEs sharing the same edge list, exactly the
    cross-operator-consistency guarantee a user of both operators needs.
    """
    from pyspark.sql.window import Window

    n_pairs, arrays = _pair_arrays(spark, sf_dir)
    if n_pairs == 0:
        return spark.createDataFrame(
            [], "doc_id long, component long, rank_nano long, is_canonical boolean"
        )
    if arrays is not None:
        # full driver composition: ONE cached collect feeds both kernels,
        # and the per-component argmax is a numpy lexsort instead of a
        # node-sized Spark join + window (guide §1.2 — the old path paid
        # a fresh pair re-checkpoint, two collects and two createDataFrames
        # per invocation for the same bits)
        import numpy as np
        import pandas as pd

        pr = _pagerank_iter(*_sym_index_cache(spark, sf_dir))
        nodes_c, component = _cc_arrays_cache(spark, sf_dir)
        # identical vertex sets: pagerank nodes = unique(sym src) =
        # unique(doc_a ∪ doc_b) = component nodes, both sorted ascending
        rank = pr["rank_nano"].to_numpy()
        order = np.lexsort((nodes_c, -rank, component))
        first = order[np.unique(component[order], return_index=True)[1]]
        canonical = np.zeros(len(nodes_c), dtype=bool)
        canonical[first] = True
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": nodes_c,
                    "component": component,
                    "rank_nano": rank,
                    "is_canonical": canonical,
                }
            ),
            "doc_id long, component long, rank_nano long, is_canonical boolean",
        )
    pairs = _jaccard_pairs_cache(spark, sf_dir)
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    ranks = _pagerank_nano(spark, edges).select("doc_id", "rank_nano")
    comp = dedup._connected_components(
        spark, pairs, materialized=True
    ).select("doc_id", "component")
    w = Window.partitionBy("component").orderBy(
        F.desc("rank_nano"), F.asc("doc_id")
    )
    return (
        comp.join(ranks, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id", "component", "rank_nano", (F.col("rn") == 1).alias("is_canonical")
        )
    )


def ext_graph_survivor_rank_oracle() -> str:
    return f"""
        WITH RECURSIVE {dedup._sql_clusters_ctes()},
        {_sql_pagerank_ctes()},
        comp AS (
            SELECT doc_id, CAST(MIN(root) AS BIGINT) AS component
            FROM reach GROUP BY doc_id
        ),
        ranked AS (
            SELECT c.doc_id, c.component, p.r AS rank_nano,
                   row_number() OVER (PARTITION BY c.component
                                      ORDER BY p.r DESC, c.doc_id) AS rn
            FROM comp c JOIN pr p ON p.doc_id = c.doc_id
            WHERE p.iter = {PR_ITERS}
        )
        SELECT doc_id, component, rank_nano, rn = 1 AS is_canonical FROM ranked
    """


# ---------------------------------------------------------------------------
# semi-supervised label propagation (clamped seeds, majority vote)
# ---------------------------------------------------------------------------

LP_ITERS = 4        # propagation rounds (graph diameter bound for near-dup
                    # neighbourhoods — components are shallow by construction)
LP_SEED_MOD = 3     # doc_id % 3 == 0 rows keep their true label as seeds


def lp_seed_frame(spark: SparkSession, sf_dir: str, edges: DataFrame) -> DataFrame:
    """(doc_id, is_seed, label): near-dup-graph vertices seeded with the
    documents table's ``lang`` on every LP_SEED_MOD-th doc — the 'sparse
    human labels' stand-in. Vertices come from the caller's (already
    checkpointed) edge frame — recomputing the pair kernel for the vertex
    set was measured at ~2× the whole query."""
    from .. import tables

    verts = edges.selectExpr("src AS doc_id").distinct()
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    return verts.join(docs, "doc_id").select(
        "doc_id",
        (F.pmod("doc_id", F.lit(LP_SEED_MOD)) == 0).alias("is_seed"),
        F.when(F.pmod("doc_id", F.lit(LP_SEED_MOD)) == 0, F.col("lang")).alias(
            "label"
        ),
    )


def ext_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the near-dup graph (Zhu &
    Ghahramani 2002, hard-clamp variant): seeds keep their label; each
    round every unlabeled vertex takes the MAJORITY label among its
    labeled neighbours (tie → lexicographically smallest), and newly
    labeled vertices vote in later rounds. The standard cheap way to
    extend sparse human labels (quality ratings, topic tags) across a
    duplicate/similarity structure before training a filter on them.

    Fully deterministic: integer vote counts, total-order tie-break, a
    fixed round count — the oracle replays every round (the recursive CTE
    references the working table twice: previous labels + votes).

    Scale: per round, one join of the edge list against the labeled
    frontier (shuffle on src) and one (dst, label) count — both map-side
    combinable; nothing driver-sized. `labeled_at` records the round each
    vertex acquired its label (0 = seed), making convergence auditable.
    """
    # driver tier: cached arrays + cached seed frame (no per-invocation
    # edge collect, no per-invocation distinct+join+toPandas seed job);
    # the distributed tiers build the symmetric frame exactly as before
    n_pairs, arrays = _pair_arrays(spark, sf_dir)
    if arrays is not None:
        spd, si, di = _lp_driver_state_cache(spark, sf_dir)
        return spark.createDataFrame(
            _label_prop_core(None, None, spd, edge_idx=(si, di)),
            "doc_id long, is_seed boolean, label string, labeled_at int",
        )
    pairs = _jaccard_pairs_cache(spark, sf_dir)
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    return label_propagate(edges, lp_seed_frame(spark, sf_dir, edges))


_LP_SEED_PDF_CACHE: dict = {}


def _lp_driver_state_cache(spark: SparkSession, sf_dir: str):
    """(seed pandas frame, si, di) for the driver tier, built ONCE per
    (application, dataset signature): the vertex set comes from the
    already-collected symmetric edge arrays (numpy unique — no Spark
    distinct shuffle), the documents scan is pruned to it by a broadcast
    join before ONE bounded collect (≤ |vertices| rows, the same bound
    the old verts.join(docs).toPandas() path had — minus its
    per-invocation 4.6M-row distinct shuffle), and the seed-frame edge
    index (`_lp_edge_index`) is a per-graph constant."""
    from ..sources.layouts import dataset_cache_get

    def _build():
        import numpy as np
        import pandas as pd

        from .. import tables

        _, arrays = _pair_arrays(spark, sf_dir)
        src_sym, dst_sym = _sym_arrays(*arrays)
        verts = np.unique(src_sym)
        vdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": verts}), "doc_id long"
        )
        docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
        spd = (
            docs.join(F.broadcast(vdf), "doc_id")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        is_seed = (spd["doc_id"] % LP_SEED_MOD == 0).to_numpy()
        seeds = pd.DataFrame(
            {
                "doc_id": spd["doc_id"].to_numpy(dtype=np.int64),
                "is_seed": is_seed,
                "label": [
                    l if s else None for s, l in zip(is_seed, spd["lang"])
                ],
            }
        )
        si, di = _lp_edge_index(
            seeds["doc_id"].to_numpy(dtype=np.int64), src_sym, dst_sym
        )
        return seeds, si, di

    return dataset_cache_get(
        _LP_SEED_PDF_CACHE, spark, sf_dir, "documents", _build, tag="graph-lp-seeds"
    )


def label_propagate(
    edges: DataFrame,
    seeds: DataFrame,
    driver_max_edges: int | None = None,
    broadcast_nodes_max: int | None = None,
    hub_degree_min: int | None = None,
) -> DataFrame:
    """The propagation loop over any symmetric (src, dst) edge list and
    (doc_id, is_seed, label) seed frame — the testable core (the crafted
    tie-break/flooding fixtures drive exactly this).

    Same three-tier strategy as `_pagerank_nano`: broadcast-sized edge
    lists run the vectorized numpy round loop on the driver (pinned
    bit-equal to the distributed loops by a three-paths test); larger
    graphs run the distributed rounds (frontier broadcast join +
    map-side-combined vote count per round), and past
    `BROADCAST_NODES_MAX` nodes the frontier/winner joins switch to
    shuffle-hash against a once-partitioned cached edge frame."""
    if driver_max_edges is None:
        driver_max_edges = dedup.DRIVER_CC_MAX_EDGES
    if edges.count() <= driver_max_edges:
        return _label_prop_driver(edges, seeds)
    return _label_prop_distributed(
        edges.localCheckpoint(eager=True), seeds, broadcast_nodes_max, hub_degree_min
    )


def _label_prop_driver(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """Driver fast path: vectorized vote rounds over the edge arrays.
    Tie-break = lexicographic label order, realized by encoding labels as
    their rank in the SORTED distinct-label list and lexsorting candidates
    by (dst, -count, code)."""
    spark = seeds.sparkSession
    e_src, e_dst = _edge_arrays(edges)
    spd = seeds.toPandas().sort_values("doc_id").reset_index(drop=True)
    out = _label_prop_core(e_src, e_dst, spd)
    return spark.createDataFrame(
        out, "doc_id long, is_seed boolean, label string, labeled_at int"
    )


def _lp_edge_index(nodes, e_src, e_dst):
    """(si, di) indices of the edge arrays into the seed-frame node list.
    Edge vertices ABSENT from the seed frame are dropped, matching the
    distributed path exactly (there, only seed-frame ids exist in the
    labels frame: absent sources never vote, absent dsts left-join away).
    Without this mask searchsorted returns an out-of-range or wrong
    index for such vertices (round-6 ADVICE)."""
    import numpy as np

    si = np.searchsorted(nodes, e_src).clip(max=len(nodes) - 1)
    di = np.searchsorted(nodes, e_dst).clip(max=len(nodes) - 1)
    covered = (nodes[si] == e_src) & (nodes[di] == e_dst)
    return si[covered], di[covered]


def _label_prop_core(e_src, e_dst, spd, edge_idx=None):
    """The vectorized vote rounds over int64 edge arrays and a seed pandas
    frame (doc_id-sorted) — returns the output pandas frame. Pure function
    of its inputs: the Spark-frame driver path and the cached-array fast
    path share these exact bits. ``edge_idx``: optional precomputed
    (si, di) seed-frame edge index (`_lp_edge_index`) — per-graph
    constants the cached fast path reuses across invocations."""
    import numpy as np
    import pandas as pd

    nodes = spd["doc_id"].to_numpy(dtype=np.int64)
    if len(nodes) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "is_seed": pd.Series(dtype="bool"),
                "label": pd.Series(dtype="object"),
                "labeled_at": pd.Series(dtype="object"),
            }
        )
    uniq = sorted({v for v in spd["label"] if v is not None})
    code_of = {v: k for k, v in enumerate(uniq)}
    lab = np.array(
        [code_of[v] if v is not None else -1 for v in spd["label"]], dtype=np.int64
    )
    labeled_at = np.where(lab >= 0, 0, -1).astype(np.int64)
    if edge_idx is not None:
        si, di = edge_idx
    else:
        si, di = _lp_edge_index(nodes, e_src, e_dst)
    L = max(len(uniq), 1)
    n = len(nodes)
    dense_votes = n * L <= 50_000_000  # (n, L) count matrix memory bound
    for it in range(LP_ITERS):
        mask = lab[si] >= 0
        if not mask.any():
            break
        d, l = di[mask], lab[si[mask]]
        key = d * L + l
        if dense_votes:
            # vote matrix via one bincount; argmax returns the FIRST max,
            # and label codes are sorted-lexicographic, so the tie-break
            # falls out of argmax for free
            cnt = np.bincount(key, minlength=n * L).reshape(n, L)
            got = cnt.max(axis=1) > 0
            win_d = np.nonzero(got)[0]
            win_l = cnt[win_d].argmax(axis=1)
        else:  # sparse fallback: sort-based winner per dst
            uk, ukc = np.unique(key, return_counts=True)
            kd, kl = uk // L, uk % L
            order = np.lexsort((kl, -ukc, kd))
            kd_s, kl_s = kd[order], kl[order]
            first = np.unique(kd_s, return_index=True)[1]
            win_d, win_l = kd_s[first], kl_s[first]
        newly = lab[win_d] < 0
        lab[win_d[newly]] = win_l[newly]
        labeled_at[win_d[newly]] = it + 1
    out = pd.DataFrame(
        {
            "doc_id": nodes,
            "is_seed": spd["is_seed"].to_numpy(),
            "label": [uniq[c] if c >= 0 else None for c in lab],
            # object dtype: an int+None mix would coerce to float64/NaN and
            # be rejected by the IntegerType field
            "labeled_at": pd.Series(
                [int(a) if a >= 0 else None for a in labeled_at], dtype="object"
            ),
        }
    )
    return out


def _lp_votes(
    edges: DataFrame,
    lab: DataFrame,
    broadcast_frontier: bool,
    hub_edges: DataFrame | None = None,
    hubs: DataFrame | None = None,
) -> DataFrame:
    """One propagation round's vote count: join the labeled frontier
    (src_id, nl) onto the edge list and emit the map-side-combined
    (dst, nl, cnt) frame. The frontier enters either as a broadcast
    (tier 2) or as a shuffle-hash build against the pre-partitioned
    cached edge frame (tier 3) — same counts either way, so the tiers
    stay bit-equal (the `_pr_contribs` factoring, plan-gated the same
    way). Tier-3 hub split: super-hub sources vote through the
    dst-partitioned ``hub_edges`` cache via a bounded broadcast of just
    the hubs' frontier rows (`_pr_contribs`' hub branch, for votes —
    counts are order-independent, so the union stays bit-equal)."""
    f = F.broadcast(lab) if broadcast_frontier else lab.hint("shuffle_hash")
    votes = edges.join(f, edges["src"] == lab["src_id"]).select("dst", "nl")
    if hub_edges is not None:
        hub_lab = lab.join(
            F.broadcast(hubs), lab["src_id"] == hubs["hub_src"], "left_semi"
        )
        votes = votes.unionByName(
            hub_edges.join(
                F.broadcast(hub_lab), hub_edges["src"] == hub_lab["src_id"]
            ).select("dst", "nl")
        )
    return votes.groupBy("dst", "nl").agg(F.count(F.lit(1)).alias("cnt"))


def _label_prop_distributed(
    edges: DataFrame,
    seeds: DataFrame,
    broadcast_nodes_max: int | None = None,
    hub_degree_min: int | None = None,
) -> DataFrame:
    """Distributed tiers 2 and 3: see `label_propagate` for the plan
    shapes. Tier 3 (nodes past the broadcast wall) hash-partitions the
    edge frame on ``src`` once and persists it — super-hub sources split
    into a dst-partitioned cache served by bounded broadcasts
    (`_hub_split`); the per-round frontier and winner joins become
    shuffle-hash builds of the node-sized side, so no round ever
    broadcasts a node-sized frame."""
    from pyspark.sql.window import Window

    if broadcast_nodes_max is None:
        broadcast_nodes_max = BROADCAST_NODES_MAX
    if hub_degree_min is None:
        hub_degree_min = HUB_DEGREE_MIN
    broadcast_tier = seeds.count() <= broadcast_nodes_max
    hub_edges = hubs = None
    if not broadcast_tier:
        nparts = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
        edges, hub_edges, hubs = _hub_split(edges, deg, nparts, hub_degree_min)
    labels = seeds.select(
        "doc_id",
        "is_seed",
        "label",
        F.when(F.col("is_seed"), F.lit(0)).cast("int").alias("labeled_at"),
    )
    for i in range(LP_ITERS):
        lab = labels.where(F.col("label").isNotNull()).select(
            F.col("doc_id").alias("src_id"), F.col("label").alias("nl")
        )
        # tier 2: the labeled frontier is node-sized -> broadcast; the only
        # shuffle per round is the map-side-combined (dst, label) count.
        # tier 3: the frontier shuffle-hash-builds against the cached
        # src-partitioned edge frame (no edge re-exchange).
        votes = _lp_votes(
            edges, lab, broadcast_frontier=broadcast_tier,
            hub_edges=hub_edges, hubs=hubs,
        )
        w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("nl"))
        winner = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("dst", F.col("nl").alias("win"))
        )
        wj = F.broadcast(winner) if broadcast_tier else winner.hint("shuffle_hash")
        labels = (
            labels.join(wj, labels["doc_id"] == winner["dst"], "left")
            .select(
                "doc_id",
                "is_seed",
                F.coalesce("label", "win").alias("label"),
                F.coalesce(
                    "labeled_at",
                    F.when(F.col("win").isNotNull(), F.lit(i + 1)),
                ).cast("int").alias("labeled_at"),
            )
        )
        if i % 2 == 1 or not broadcast_tier:
            labels = labels.localCheckpoint(eager=True)
    if not broadcast_tier:
        _hub_unpersist(edges, hub_edges, hubs)
    return labels


def ext_graph_label_prop_oracle() -> str:
    pair_sql = dedup.ext_dedup_ngram_jaccard_oracle()
    return f"""
        WITH RECURSIVE pairs AS ({pair_sql}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        verts AS (SELECT DISTINCT src AS doc_id FROM edges),
        seeds AS (
            SELECT v.doc_id,
                   v.doc_id % {LP_SEED_MOD} = 0 AS is_seed,
                   CASE WHEN v.doc_id % {LP_SEED_MOD} = 0 THEN d.lang END AS label
            FROM verts v JOIN documents d USING (doc_id)
        ),
        lp AS (
            SELECT 0 AS iter, doc_id, is_seed, label,
                   CASE WHEN is_seed THEN 0 END::INTEGER AS labeled_at
            FROM seeds
            UNION ALL
            SELECT p.iter + 1, p.doc_id, p.is_seed,
                   COALESCE(p.label, w.win) AS label,
                   COALESCE(p.labeled_at,
                            CASE WHEN w.win IS NOT NULL
                                 THEN p.iter + 1 END)::INTEGER AS labeled_at
            FROM lp p
            LEFT JOIN (
                SELECT dst, win FROM (
                    SELECT e.dst, q.label AS win,
                           row_number() OVER (
                               PARTITION BY e.dst
                               ORDER BY COUNT(*) DESC, q.label
                           ) AS rn
                    FROM lp q JOIN edges e ON e.src = q.doc_id
                    WHERE q.label IS NOT NULL
                    GROUP BY e.dst, q.label
                ) WHERE rn = 1
            ) w ON w.dst = p.doc_id
            WHERE p.iter < {LP_ITERS}
        )
        SELECT doc_id, is_seed, label, labeled_at
        FROM lp WHERE iter = {LP_ITERS}
    """
