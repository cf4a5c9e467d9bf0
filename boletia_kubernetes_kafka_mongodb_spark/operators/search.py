"""Keyword search / relevance ranking over ``documents`` (SURVEY.md §2.9).

A training-data pipeline needs retrieval as much as dedup: BM25 keyword
search (targeted corpus audits, eval-set mining) and per-document TF-IDF
keyterms (topic tagging, domain mixing). Both are pure relational plans —
the scoring math is closed-form arithmetic over term statistics, so
everything stays in native Column expressions / whole-stage codegen.

Scale notes (100 TB):
- BM25 never explodes the corpus: per-term tf is a narrow ``filter`` HOF
  over each doc's token array (the query term set is tiny and fixed), the
  corpus-level statistics (df per term, avgdl) aggregate to |terms|+1 rows
  and come back via broadcast joins, and the final top-k is a
  ``TakeOrderedAndProject`` bounded heap — no global sort, one full scan.
- TF-IDF does the canonical one-(doc,token)-shuffle wordcount, derives the
  document-frequency table FROM the materialized tf frame (no second corpus
  scan), and ranks per-doc over the aggregated frame only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import tables
from .text import TOKEN_RE, tokens_col

# Fixed audit query — tokens known to occur in the synthetic corpus.
BM25_QUERY_TERMS = ("spark", "shuffle", "broadcast")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15

TFIDF_TOPK = 3


def ext_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k documents for a fixed query term set.

    Plan shape: one corpus scan computes per-doc length and per-term tf as
    narrow HOFs (no explode, no shuffle); two tiny aggregates (N+avgdl: one
    row; df per term: |terms| rows, built from the SAME scan's tf columns so
    the corpus is read once) broadcast back; score is closed-form
    arithmetic; top-k via sort+limit = bounded per-task heaps.

    Uses the Lucene/ATIRE idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` which is
    non-negative even for terms in more than half the corpus.
    """
    docs = tables.load(spark, sf_dir, "documents", fan=True)
    toks = tokens_col("text")

    def term_eq(term):
        # one-arg closure: a default-arg lambda would have arity 2 and make
        # pyspark pass the array INDEX as the second parameter
        return lambda x: x == F.lit(term)

    base = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        *[
            F.size(F.filter(toks, term_eq(t))).cast("double").alias(f"tf_{i}")
            for i, t in enumerate(BM25_QUERY_TERMS)
        ],
        # base feeds the stats aggregate AND the scored output — materialize
        # once so the scan + per-term filter HOFs run a single time
    ).localCheckpoint(eager=False)
    # corpus stats: one row — N, avgdl, df per term (from the same frame)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(BM25_QUERY_TERMS))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(BM25_QUERY_TERMS)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(BM25_K1 + 1.0) / denom
    return (
        scored.select(
            "doc_id",
            F.round(score, 6).alias("bm25"),
            F.col("dl").cast("long").alias("n_tokens"),
        )
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )


def ext_bm25_search_oracle() -> str:
    terms_sql = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS DOUBLE) AS dl,
                   regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
            FROM documents
        ),
        tf AS (
            SELECT b.doc_id, b.dl, q.term,
                   CAST(len(list_filter(b.toks, x -> x = q.term)) AS DOUBLE) AS tf
            FROM base b CROSS JOIN (SELECT unnest([{terms_sql}]) AS term) q
        ),
        stats AS (
            SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs,
                   (SELECT AVG(dl) FROM base) AS avgdl
            FROM base
        ),
        df AS (
            SELECT term, CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df
            FROM tf GROUP BY term
        ),
        scored AS (
            SELECT t.doc_id, MAX(t.dl) AS dl,
                   SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * t.tf * {BM25_K1 + 1.0}
                       / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * t.dl / s.avgdl))
                   ) AS bm25
            FROM tf t JOIN df d USING (term) CROSS JOIN stats s
            GROUP BY t.doc_id
        )
        SELECT doc_id, ROUND(bm25, 6) AS bm25, CAST(dl AS BIGINT) AS n_tokens
        FROM scored WHERE ROUND(bm25, 6) > 0
        ORDER BY bm25 DESC, doc_id ASC LIMIT {BM25_TOPK}
    """


def ext_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF keyterms per document (topic tags for domain mixing).

    One (doc_id, token) shuffle builds the tf frame; document frequency and
    N derive FROM that frame (no second corpus pass) and join back on token
    — the df side is pre-aggregated to one row per token, so the join is
    skew-proof. The per-doc ranking window runs over the aggregated frame
    (≤ distinct-tokens-per-doc rows), never over raw token occurrences.
    idf = ln((1+N)/(1+df)) + 1 (sklearn smooth form, strictly positive);
    tf is the raw in-doc count. Deterministic tie-break (score desc, token
    asc) keeps the hash stable.
    """
    docs = tables.load(spark, sf_dir, "documents", fan=True)
    tf = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        # tf feeds BOTH the df derivation and the scoring join — without
        # the checkpoint the tokenize+explode+agg subtree executes once
        # per join branch (no CSE across children; the unigram/bigram/
        # importance lesson, applied here in the optimization round —
        # at 100 TB the second branch is a second full corpus pass)
        .localCheckpoint(eager=False)
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    df_frame = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(df_frame, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOPK)
        .select(
            "doc_id",
            "rank",
            "token",
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


def ext_tfidf_terms_oracle() -> str:
    return f"""
        WITH tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
                FROM documents
            )
            GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token
        ),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
            SELECT t.doc_id, t.token,
                   t.tf * (ln((1.0 + n.n_docs) / (1.0 + d.df)) + 1.0) AS tfidf
            FROM tf t JOIN df d USING (token) CROSS JOIN n
        )
        SELECT doc_id, rank, token, ROUND(tfidf, 6) AS tfidf FROM (
            SELECT doc_id, token, tfidf,
                   CAST(row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf DESC, token ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {TFIDF_TOPK}
    """


RRF_K = 60        # standard reciprocal-rank-fusion constant
HYBRID_TOPK = 10


def ext_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 keyword ranking with the dense-vector
    cosine ranking by Reciprocal Rank Fusion (Cormack et al. 2009) —
    score(d) = Σ 1/(K + rank_i(d)) over the rankers that returned d. The
    standard two-tower serving shape: lexical and semantic candidates are
    produced independently (each with its own scale path), and fusion runs
    on the RANK-SIZED frames only, so it costs nothing at corpus scale.

    doc_id ≡ vec_id joins the `documents` and `embeddings` modalities (the
    fixture's shared key space). Full-outer fusion: a doc found by only one
    ranker still scores. Deterministic tie-break (score desc, id asc).
    """
    from .similarity import ext_topk_similarity

    bm = ext_bm25_search(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .alias("rank_bm25"),
    )
    vec = ext_topk_similarity(spark, sf_dir).select(
        F.col("vec_id").alias("id"), F.col("rank").alias("rank_vec")
    )
    fused = bm.join(vec, "id", "full_outer").select(
        "id",
        "rank_bm25",
        "rank_vec",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return (
        fused.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
            ),
        )
        .where(F.col("rank") <= HYBRID_TOPK)
        .select("rank", "id", "rrf", "rank_bm25", "rank_vec")
    )


def ext_hybrid_search_rrf_oracle() -> str:
    from .similarity import ext_topk_similarity_oracle

    return f"""
        WITH bm_base AS (SELECT * FROM ({ext_bm25_search_oracle()})),
        bm AS (
            SELECT doc_id AS id,
                   CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
                       AS rank_bm25
            FROM bm_base
        ),
        vec AS (
            SELECT vec_id AS id, rank AS rank_vec
            FROM ({ext_topk_similarity_oracle()})
        ),
        fused AS (
            SELECT COALESCE(bm.id, vec.id) AS id, rank_bm25, rank_vec,
                   ROUND(COALESCE(1.0 / ({RRF_K} + rank_bm25), 0.0)
                         + COALESCE(1.0 / ({RRF_K} + rank_vec), 0.0), 6) AS rrf
            FROM bm FULL OUTER JOIN vec ON bm.id = vec.id
        )
        SELECT rank, id, rrf, rank_bm25, rank_vec FROM (
            SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, id ASC) AS INTEGER)
                          AS rank
            FROM fused
        ) WHERE rank <= {HYBRID_TOPK}
    """


# standing queries for percolation: (query_id, terms, min_hits)
PERCOLATE_QUERIES = (
    (1, ("spark", "shuffle"), 2),
    (2, ("broadcast", "join"), 2),
    (3, ("stream", "window", "state"), 2),
)


def _percolate_frame(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(q, list(t), m) for q, t, m in PERCOLATE_QUERIES],
        "query_id int, terms array<string>, min_hits int",
    )


def ext_percolate_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation — REVERSE search: a registry of standing keyword queries
    is matched against every document (the publish-subscribe search shape:
    saved searches, alerting rules, routing filters). A query fires when at
    least ``min_hits`` of its terms occur in the document.

    Plan: the query registry is tiny by nature → broadcast; matching is a
    narrow map per (doc × query) via ``array_intersect`` on the doc's
    distinct-token array against the query's term array — no explode of
    corpus tokens, no shuffle at all (the registry cross joins in at
    |queries| rows). At 100 TB this pipelines over the scan; a
    million-query registry would flip to the inverted form (explode query
    terms, join on token) — the `ext_text_sentiment` lexicon shape.
    """
    docs = tables.load(spark, sf_dir, "documents", fan=True)
    return percolate(docs, _percolate_frame(spark))


def percolate(docs: DataFrame, registry: DataFrame) -> DataFrame:
    """The match pipeline itself — ONE definition shared by the batch query
    and the streaming twin (`streaming/corpus.percolate_stream`), so the
    semantics the stream≡batch test pins cannot drift between them."""
    toks = F.array_distinct(tokens_col("text"))
    hits = F.size(F.array_intersect(F.col("toks"), F.col("terms")))
    return (
        docs.select("doc_id", toks.alias("toks"))
        .crossJoin(F.broadcast(registry))
        .select(
            "doc_id",
            "query_id",
            hits.alias("n_hits"),
            (hits >= F.col("min_hits")).alias("matched"),
        )
        .where(F.col("matched"))
        .select("doc_id", "query_id", "n_hits")
    )


def ext_percolate_match_oracle() -> str:
    # DuckDB list literal syntax: ['a', 'b'] — python repr of a str list
    vals = ", ".join(
        f"({q}, {list(t)!r}, {m})" for q, t, m in PERCOLATE_QUERIES
    )
    return f"""
        WITH reg(query_id, terms, min_hits) AS (VALUES {vals}),
        d AS (
            SELECT doc_id,
                   list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
            FROM documents
        )
        SELECT d.doc_id, reg.query_id,
               CAST(len(list_intersect(d.toks, reg.terms)) AS INTEGER) AS n_hits
        FROM d CROSS JOIN reg
        WHERE len(list_intersect(d.toks, reg.terms)) >= reg.min_hits
    """
