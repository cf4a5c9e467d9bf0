"""Deduplication operators (SURVEY.md §2.9 / BASELINE.json extensions).

Four families over ``documents`` (+ one over ``embeddings``):

- exact        — fingerprint groupBy (hash dedup; keep-min winner)
- n-gram Jaccard — token-set similarity pairs within blocking keys
- MinHash+LSH  — shingle → minhash signature → banded bucket join →
                 candidate pairs → exact-Jaccard verification
- SimHash      — 64-bit bit-majority signature via an Arrow-batched pandas
                 UDF; near-dup = small Hamming distance
- embedding    — cosine near-dup pairs (exact; the LSH scale path is in
                 ``similarity.py``)

Scale design: exact dedup and MinHash banding are the 100 TB paths — both
are groupBy/join on derived keys, shuffling only (key, id) pairs, never
full documents; candidate verification joins back to fetch token sets for
the (tiny) candidate set only. The all-pairs variants are correctness
oracles, blocked on a key (here ``lang``) to bound the quadratic term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .. import tables
from .text import TOKEN_RE, tokens_col

JACCARD_THRESHOLD = 0.5
MINHASH_PERMS = 32          # signature length
LSH_BANDS = 8               # 8 bands × 4 rows — high recall at 0.5 threshold
SHINGLE_N = 3               # word-shingle width
EMBED_DUP_THRESHOLD = 0.45  # cosine near-dup threshold (data max ≈ 0.51)
SIMHASH_MAX_HAMMING = 8


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint; survivor = min doc_id.

    The classic hash-groupBy: shuffle only (fingerprint, doc_id); at 100 TB
    this is one shuffle of ~32 bytes/row. Emits survivor + duplicate count.
    """
    docs = tables.load(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        docs.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").cast("long").alias("survivor_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def ext_dedup_exact_oracle() -> str:
    return r"""
        SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
               CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# n-gram (token-set) Jaccard pairs
# ---------------------------------------------------------------------------

def _packed_corpus(spark: SparkSession, sf_dir: str):
    """(probe frame of doc_ids, broadcast packed build side) for the Jaccard
    probe kernels.

    Tokenization runs ONCE (the collect job); the driver packs each doc's
    distinct token set into a row of uint64 bitmasks over the corpus
    vocabulary and broadcasts doc_id-sorted numpy arrays ``(ids, lang_codes,
    lang_names, masks, sizes)``. Executors index into the pack by
    ``searchsorted`` — the probe scan carries only ``doc_id``, so no text is
    re-tokenized and no task rebuilds the vocabulary. This is exactly a
    broadcast-hash-join build side, built once instead of once per task.
    """
    import numpy as np

    docs = tables.load(spark, sf_dir, "documents", fan=True)
    toks = docs.select(
        "doc_id", "lang", F.array_distinct(tokens_col("text")).alias("toks")
    )
    rows = sorted(toks.collect(), key=lambda r: r.doc_id)
    vocab: dict[str, int] = {}
    for r in rows:
        for t in r.toks:
            vocab.setdefault(t, len(vocab))
    n_words = max(1, (len(vocab) + 63) // 64)
    ids = np.array([r.doc_id for r in rows], dtype=np.int64)
    lang_names, lang_codes = np.unique([r.lang for r in rows], return_inverse=True)
    masks = np.zeros((len(rows), n_words), dtype=np.uint64)
    for i, r in enumerate(rows):
        for t in r.toks:
            j = vocab[t]
            masks[i, j >> 6] |= np.uint64(1) << np.uint64(j & 63)
    from ._pandas_udfs import _popcount_rows

    packed = spark.sparkContext.broadcast(
        (ids, lang_codes, lang_names, masks, _popcount_rows(masks))
    )
    return docs.select("doc_id"), packed


def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by token-set Jaccard ≥ 0.5, blocked by ``lang``.

    The blocking key bounds the quadratic pair space (same-language docs
    only) — the standard exact-verification step of any near-dedup pipeline.

    Physical plan: broadcast-probe. The token-set corpus (small side — one
    row per doc, ~25 tokens each) is tokenized once and packed driver-side
    into uint64 bitmasks (see ``_packed_corpus``); the probe side streams
    only ``doc_id`` through ``mapInPandas`` doing vectorized AND+popcount —
    the same build/probe asymmetry as a broadcast hash join, ~20× faster
    than a 3M-pair expression join of array_intersect calls. The
    sub-quadratic scale path is MinHash-LSH below; this operator is its
    exact verifier.
    """
    from ._pandas_udfs import make_jaccard_probe
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    probe_ids, packed = _packed_corpus(spark, sf_dir)
    schema = StructType(
        [
            StructField("doc_a", LongType(), False),
            StructField("doc_b", LongType(), False),
            StructField("lang", StringType(), False),
            StructField("jaccard", DoubleType(), False),
        ]
    )
    return probe_ids.mapInPandas(
        make_jaccard_probe(packed, JACCARD_THRESHOLD), schema=schema
    )


def ext_dedup_ngram_jaccard_oracle() -> str:
    return f"""
        SELECT doc_a, doc_b, lang, jaccard FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
                   ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / len(list_distinct(a.toks || b.toks)), 6) AS jaccard
            FROM (SELECT doc_id, lang,
                         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
                  FROM documents) a
            JOIN (SELECT doc_id, lang,
                         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
                  FROM documents) b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
        ) WHERE jaccard >= {JACCARD_THRESHOLD}
    """


# ---------------------------------------------------------------------------
# near-dup clusters: connected components + survivor selection
# ---------------------------------------------------------------------------

def ext_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup PAIRS into dedup CLUSTERS and pick survivors.

    Pair-finding alone doesn't dedup — transitive groups must collapse to one
    survivor. Component id = min doc_id reachable through the Jaccard-pair
    graph; survivor = the component's min doc_id (deterministic).

    Physical strategy: the edge list is the *output* of pair-finding — tiny
    relative to the corpus (pairs above a high similarity threshold), so it
    union-finds on the driver in one pass (path compression + union by
    rank), like the build side of a broadcast join. Iterative min-label
    propagation over DataFrames was measured 40× slower on this dense graph
    (join+cache+count per round); at the scale where the edge list itself
    outgrows one node, the standard move is hash-partitioned union-find or
    large-star/small-star label propagation — the pair-finding stages
    (MinHash bands) are unchanged either way.

    Oracle: a DuckDB RECURSIVE CTE computing min reachable root per node.
    """
    import numpy as np
    import pandas as pd

    from ._pandas_udfs import make_jaccard_component_probe

    # fused probe+contraction: each partition scores its docs against the
    # packed broadcast corpus and emits only the (root, node) star edges of
    # its LOCAL components — ≤ |nodes| rows per partition instead of the
    # dense ~460-edges/node pair list; the driver merge below only
    # reconciles components that straddle partitions
    probe_ids, packed = _packed_corpus(spark, sf_dir)
    forest = probe_ids.mapInPandas(
        make_jaccard_component_probe(packed, JACCARD_THRESHOLD),
        schema="doc_a long, doc_b long",
    )
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    edges_pdf = forest.toPandas()
    src = edges_pdf["doc_a"].to_numpy(dtype=np.int64)
    dst = edges_pdf["doc_b"].to_numpy(dtype=np.int64)

    # vectorized min-label propagation with pointer jumping: each round every
    # node takes the min label across its edges, then labels chase their own
    # label's label (doubling). Rounds ≈ log(diameter) — near-dup components
    # are dense, so 2-4 rounds in practice; a per-edge python union-find loop
    # was 2.5s at 2.3M edges, this is ~60ms.
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = label.copy()
        np.minimum.at(label, di, label[si])
        np.minimum.at(label, si, label[di])
        label = np.minimum(label, label[label])  # pointer jumping
        if np.array_equal(label, prev):
            break
    component = nodes[label]

    out = spark.createDataFrame(
        pd.DataFrame({"doc_id": nodes, "component": component})
    )
    return out.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("is_survivor"),
    )


def ext_dedup_clusters_oracle() -> str:
    # reuse the pair query as the edge list, then min-reachable-root per node
    pair_sql = ext_dedup_ngram_jaccard_oracle()
    return f"""
        WITH RECURSIVE pairs AS ({pair_sql}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        verts AS (SELECT DISTINCT src AS doc_id FROM edges),
        reach AS (
            SELECT doc_id, doc_id AS root FROM verts
            UNION
            SELECT e.dst AS doc_id, r.root
            FROM reach r JOIN edges e ON e.src = r.doc_id
        )
        SELECT doc_id,
               CAST(MIN(root) AS BIGINT) AS component,
               (doc_id = MIN(root)) AS is_survivor
        FROM reach
        GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(toks):
    """Word n-gram shingles as strings (higher-order functions, JVM-side).

    Built by zipping SHINGLE_N shifted ``slice`` views of the token array —
    NOT ``transform(sequence(...), i -> slice(toks, i+1, n))``: lambda
    bodies re-evaluate the captured token *expression* per element, so the
    tokenizer regex would run once per shingle per row (the same trap
    measured 30× in ext_text_repetition). Shifted slices reference the
    token expression SHINGLE_N+1 times per row, independent of length.

    Note the slice length: ``size - n + 1`` shingles for ``size ≥ n``, and
    the historical degenerate behavior for short docs (``sequence(0,
    max(size-n, 0))`` always yielded ≥1 index) is preserved by clamping the
    gram count to ≥1 — a sub-n-token doc still contributes its whole text
    as one (short) shingle, which the dedup semantics rely on.
    """
    n = SHINGLE_N
    ng = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    out = F.slice(toks, 1, ng)
    for k in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, 1 + k, ng),
            lambda a, b: F.when(b.isNull(), a).otherwise(F.concat_ws(" ", a, b)),
        )
    return F.array_distinct(out)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → array<long> MinHash signature (MINHASH_PERMS seeded hashes).

    Shuffle-free formulation: string-hash the shingles ONCE into a per-doc
    array, materialize that array as a concrete attribute behind an
    ``explode(array(x))`` Generate barrier, then take each permutation as
    ``array_min(transform(hs, h → xxhash64(h, k)))`` over the bound
    attribute — a pure narrow map.

    Two earlier formulations lost, both measured: (a) computing the 32
    per-seed mins directly over the shingle expression made CollapseProject
    inline the shingle construction (regexp tokenize + slices) into every
    seed's lambda (lambda variables defeat subexpression elimination ⇒
    shingling ran 32×, 7.0s); (b) exploding shingles to rows and taking 32
    ``min()`` aggregates avoided the recompute but paid a 1.5M-row shuffle
    for what is a per-doc-local computation (1.5s). The barrier form hashes
    the same 8-byte values with zero exchange (0.85s at sf0.1) — and at
    100 TB a signature stage that doesn't shuffle at all beats any agg.
    """
    shingle_hashes = F.transform(
        _shingles(tokens_col("text")), lambda s: F.xxhash64(s)
    )
    with_hashes = docs.select(
        "doc_id", F.explode(F.array(shingle_hashes)).alias("hs")
    )
    sig = F.array(
        *[
            F.array_min(F.transform("hs", lambda h: F.xxhash64(h, F.lit(k))))
            for k in range(MINHASH_PERMS)
        ]
    )
    return with_hashes.select("doc_id", sig.alias("sig"))


def ext_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.

    Pipeline (all built-ins): shingle → 32-perm minhash signature → split
    into 8 bands of 4 → hash each band to a bucket key → explode → self-join
    on (band, bucket) → distinct candidate pairs → verify exact shingle
    Jaccard ≥ threshold.

    Scale: the banded join shuffles only (band_hash, doc_id); verification
    re-joins token sets for candidates only — the O(n²) term never
    materializes. Spark-hash-dependent ⇒ rows-only driver check; recall vs
    the exhaustive oracle is asserted in tests/test_dedup.py.
    """
    docs = tables.load(spark, sf_dir, "documents", fan=True)
    sigs = minhash_signatures(docs)
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    # in-bucket pair expansion via groupBy + HOF instead of a self-join:
    # a self-join's two branches each re-execute the whole shingle→minhash
    # subtree (no CSE across join children — measured 2× the work), where
    # the groupBy shuffles the banded keys ONCE and expands the k² pairs
    # per bucket with array lambdas. LSH buckets are tiny by construction
    # (that's the point of banding); a pathological hot bucket at scale is
    # handled the standard way — cap/salt the bucket — before expansion.
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    pair_struct = F.filter(
        F.flatten(
            F.transform(
                "ids",
                lambda x: F.transform(
                    "ids", lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    candidates = (
        buckets.select(F.explode(pair_struct).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # exact-Jaccard verification priced by the CANDIDATE set, not the
    # corpus. The pair list is materialized ONCE via localCheckpoint —
    # referencing the lazy `candidates` frame from two join inputs would
    # re-execute the whole signature→band→bucket chain per branch (measured
    # 2×); at real scale a reliable checkpoint dir replaces local executor
    # storage. Then join the raw doc scan against the distinct member ids
    # FIRST (cheap broadcast semi on doc_id — no text work) and shingle
    # only survivors: the full-corpus second shingling pass this operator
    # used to pay is gone — at 100 TB the verify stage touches |members|
    # documents, period, and each member shingles once however many pairs
    # it joins. (~0.25s slower than the corpus-pass form at sf0.1, where
    # one extra pass over 20k docs is almost free — the trade flips
    # catastrophically in the corpus's favor at any real scale.)
    cand = candidates.localCheckpoint(eager=False)
    sides = cand.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    )
    members = sides.select("doc_id").distinct()
    member_docs = docs.join(F.broadcast(members), "doc_id", "inner")
    shingles_df = member_docs.select(
        "doc_id", _shingles(tokens_col("text")).alias("sh")
    )
    joined = shingles_df.join(F.broadcast(sides), "doc_id", "inner")
    paired = joined.groupBy("doc_a", "doc_b").agg(
        F.first(F.when(F.col("doc_id") == F.col("doc_a"), F.col("sh")), ignorenulls=True).alias("sh_a"),
        F.first(F.when(F.col("doc_id") == F.col("doc_b"), F.col("sh")), ignorenulls=True).alias("sh_b"),
    )
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")),
        6,
    )
    return (
        paired.select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 64-bit SimHash via an Arrow-batched pandas UDF.

    Bit-majority voting over per-token 64-bit hashes is genuinely awkward as
    SQL (64 conditional sums); the idiomatic Spark escape hatch is a
    vectorized pandas UDF over the token-hash arrays — Arrow batches in, one
    numpy popcount-style fold, longs out (SURVEY.md §2.8 policy).
    """
    from ._pandas_udfs import simhash_from_token_hashes

    token_hashes = F.transform(
        F.array_distinct(tokens_col("text")), lambda t: F.xxhash64(t)
    )
    return docs.select(
        "doc_id", "lang", simhash_from_token_hashes(token_hashes).alias("simhash")
    )


SIMHASH_BANDS = 4  # pigeonhole: hamming ≤ 3 < 4 ⇒ ≥1 of 4 16-bit bands equal


def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance ≤ SIMHASH_MAX_HAMMING.

    Pairs blocked by ``lang``, pruned by pigeonhole banding: the 64-bit
    signature splits into 4 disjoint 16-bit bands, and hamming ≤ 3 forces at
    least one band to match exactly — so bucketing on (lang, band, bits) is
    LOSSLESS candidate pruning, not an approximation. Candidates expand
    in-bucket (groupBy + array lambdas — a self-join would re-execute the
    signature UDF per branch AND materialize the lang-blocked n² pair
    space); the Hamming verify is ``bit_count(a XOR b)``, a JVM intrinsic.
    Spark-hash + UDF dependent ⇒ rows-only driver check; behavior asserted
    against a python reference in tests/test_dedup.py.
    """
    docs = tables.load(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs)
    band_keys = F.array(
        *[
            F.shiftright("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF))
            for b in range(SIMHASH_BANDS)
        ]
    )
    banded = sigs.select(
        "doc_id", "lang", "simhash", F.posexplode(band_keys).alias("band", "bits")
    )
    buckets = (
        banded.groupBy("lang", "band", "bits")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("members"))
        .where(F.size("members") > 1)
    )
    pair_struct = F.filter(
        F.flatten(
            F.transform(
                "members",
                lambda x: F.transform(
                    "members",
                    lambda y: F.struct(
                        x["doc_id"].alias("doc_a"),
                        y["doc_id"].alias("doc_b"),
                        x["simhash"].alias("sig_a"),
                        y["simhash"].alias("sig_b"),
                    ),
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    candidates = (
        buckets.select(F.explode(pair_struct).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.sig_a", "p.sig_b")
        .distinct()
    )
    return (
        candidates.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs over the vector dim).

    Physical plan: broadcast-probe matmul. The (N×D) corpus matrix is small
    (embeddings are the dim side); it is collected, L2-normalized, captured
    by value, and each partition's rows do one numpy matmul against it —
    the vectorized Arrow path instead of millions of per-pair expression
    folds. Exact all-pairs is the verification oracle; the sub-quadratic
    scale path is the LSH/IVF bucketing in ``similarity.py``.
    """
    import numpy as np

    from ._pandas_udfs import make_cosine_pairs_probe
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb = tables.load(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    matrix = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    ids = spark.sparkContext.broadcast([r.vec_id for r in rows])
    matrix = spark.sparkContext.broadcast(matrix)
    schema = StructType(
        [
            StructField("vec_a", LongType(), False),
            StructField("vec_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )
    return emb.select("vec_id", "embedding").mapInPandas(
        make_cosine_pairs_probe(ids, matrix, EMBED_DUP_THRESHOLD), schema=schema
    )


def ext_dedup_embedding_oracle() -> str:
    return f"""
        SELECT vec_a, vec_b, cosine FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE cosine >= {EMBED_DUP_THRESHOLD}
    """


CONTAINMENT_THRESHOLD = 0.8


def ext_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by token-set CONTAINMENT ≥ 0.8, blocked by ``lang``.

    Containment = |A∩B| / min(|A|,|B|): the asymmetric companion to
    ``ext_dedup_ngram_jaccard`` that flags a short document subsumed by a
    longer one — the quote/boilerplate-extraction case Jaccard's
    union-normalization hides. Same broadcast bitmask probe, same blocking,
    same exact-verification role next to the MinHash scale path.
    """
    from ._pandas_udfs import make_containment_probe
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    probe_ids, packed = _packed_corpus(spark, sf_dir)
    schema = StructType(
        [
            StructField("doc_a", LongType(), False),
            StructField("doc_b", LongType(), False),
            StructField("lang", StringType(), False),
            StructField("containment", DoubleType(), False),
        ]
    )
    return probe_ids.mapInPandas(
        make_containment_probe(packed, CONTAINMENT_THRESHOLD), schema=schema
    )


def ext_dedup_containment_oracle() -> str:
    return f"""
        SELECT doc_a, doc_b, lang, containment FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
                   ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / LEAST(len(a.toks), len(b.toks)), 6) AS containment
            FROM (SELECT doc_id, lang,
                         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
                  FROM documents) a
            JOIN (SELECT doc_id, lang,
                         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
                  FROM documents) b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE len(a.toks) > 0 AND len(b.toks) > 0
        ) WHERE containment >= {CONTAINMENT_THRESHOLD}
    """
