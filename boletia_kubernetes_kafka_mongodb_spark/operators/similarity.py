"""Similarity search over the ``embeddings`` table (SURVEY.md §2.9).

- ``ext_topk_similarity`` — brute-force cosine top-k: the exact baseline.
  Dot products via ``zip_with``/``aggregate`` higher-order functions (JVM,
  no UDF); top-k via ``row_number`` with a deterministic tie-break.
- ``ext_ann_lsh_topk`` — the scale path: sign-random-projection LSH buckets
  + multi-probe, searching only vectors sharing ≥1 band with the query.
  At 100 TB the bucket join replaces the full scan; here the candidate set
  is verified ⊇-correct against brute force in tests.
- ``ext_ann_ivf_topk`` — IVF variant: k-means-free deterministic coarse
  quantizer (vectors assigned to nearest of √n seed centroids chosen by
  vec_id), probe the query's nearest ``IVF_NPROBE`` centroids only.

All cosine math is promoted to double before summation so the DuckDB oracle
(double list ops) agrees to ~1e-15; outputs round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import tables

TOPK = 10
QUERY_VEC_ID = 0
# 6 planes × 8 bands: for a cosine-0.45 neighbor (θ≈63°, per-plane agree
# p≈0.65) band-collision ≈ 0.65^6 ≈ 0.074 ⇒ recall ≈ 1-(1-0.074)^8 ≈ 0.46,
# while a random pair (p=0.5) collides ≈ 11.8% ⇒ ~88% of the corpus pruned.
# This synthetic corpus has no strong near-dups (max cosine ≈ 0.51), so the
# operating point is deliberately recall-leaning.
LSH_PLANES = 6      # hyperplanes per band
LSH_BANDS_ANN = 8   # bands (multi-probe)
IVF_NLIST = 16      # coarse centroids
IVF_NPROBE = 4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b, norm_a, norm_b):
    return _dot(a, b) / (norm_a * norm_b)


def _with_norm(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", "label", "embedding", F.sqrt(_dot("embedding", "embedding")).alias("norm")
    )


def ext_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors of the query vector (vec_id=0).

    Plan shape: 1-row broadcast (query) × full scan (corpus) → narrow map →
    ``row_number`` over a single global window of k candidates. At scale the
    window is the only ordering step and operates on per-partition top-k
    prefilters if extended; the scan itself never shuffles.
    """
    emb = _with_norm(tables.fan_out(tables.load(spark, sf_dir, "embeddings"), spark))
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    scored = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine("embedding", F.col("q_emb"), F.col("norm"), F.col("q_norm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select("rank", "vec_id", "label", "cosine")
    )


def ext_topk_similarity_oracle() -> str:
    return f"""
        SELECT rank, vec_id, label, cosine FROM (
            SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank,
                   vec_id, label, cosine
            FROM (
                SELECT e.vec_id, e.label,
                       ROUND(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS cosine
                FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
                WHERE e.vec_id != {QUERY_VEC_ID}
            )
        ) WHERE rank <= {TOPK}
    """


N_BATCH_QUERIES = 8
BATCH_TOPK = 3


def ext_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched similarity search: top-k neighbors for a query SET.

    The realistic serving shape — N query vectors against the corpus in one
    pass: broadcast the (tiny) query set, score corpus×queries, then a
    ``row_number`` window PARTITIONED BY query (per-key windows parallelize;
    the single-query variant's global window is the only serial point).
    """
    emb = _with_norm(tables.fan_out(tables.load(spark, sf_dir, "embeddings"), spark))
    queries = emb.where(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine("embedding", F.col("q_emb"), F.col("norm"), F.col("q_norm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BATCH_TOPK)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def ext_topk_batch_oracle() -> str:
    return f"""
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT q.vec_id AS query_id,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                                            / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                               * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) DESC,
                                               e.vec_id ASC) AS rank,
                   e.vec_id,
                   ROUND(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS cosine
            FROM embeddings e
            CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}) q
            WHERE e.vec_id != q.vec_id
        ) WHERE rank <= {BATCH_TOPK}
    """


def _with_band_codes(emb: DataFrame) -> DataFrame:
    """Append band0..bandN sign-random-projection codes via one Arrow pass.

    Hyperplane weights are deterministic ±1s derived from md5(band:plane:dim)
    parity — reproducible across runs with no stored model. One numpy matmul
    per batch ((rows × D) @ (D × bands·planes)) replaces bands·planes
    per-row expression folds.
    """
    from pyspark.sql.types import LongType, StructField

    n_bands, n_planes = LSH_BANDS_ANN, LSH_PLANES

    def add_codes(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        H = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            if H is None:
                dim = X.shape[1]
                H = np.empty((n_bands * n_planes, dim))
                for j in range(n_bands * n_planes):
                    for d in range(dim):
                        h = hashlib.md5(f"{j}:{d}".encode()).digest()[0]
                        H[j, d] = 1.0 if h % 2 == 0 else -1.0
            bits = (X @ H.T) >= 0  # (rows, bands*planes)
            powers = 1 << np.arange(n_planes, dtype=np.int64)
            out = pdf.copy()
            for b in range(n_bands):
                seg = bits[:, b * n_planes : (b + 1) * n_planes]
                out[f"band{b}"] = (seg * powers).sum(axis=1).astype(np.int64)
            yield out

    # fresh StructType: StructType.add would MUTATE the input df's cached
    # schema object and desync it from the JVM plan
    from pyspark.sql.types import StructType

    schema = StructType(
        list(emb.schema.fields)
        + [StructField(f"band{b}", LongType(), False) for b in range(n_bands)]
    )
    return emb.mapInPandas(add_codes, schema=schema)


def ext_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-random-projection LSH with multi-probe bands.

    Candidates = vectors sharing ≥1 of 4 12-bit band codes with the query;
    exact cosine re-ranking on candidates only. At 100 TB: band codes are
    precomputed/bucketed at write time, the probe is a 4-way bucket lookup —
    the full-corpus scan disappears. Approximate ⇒ rows-only driver check;
    recall vs brute force asserted in tests/test_similarity.py.
    """
    emb = _with_norm(tables.fan_out(tables.load(spark, sf_dir, "embeddings"), spark))
    banded = _with_band_codes(emb.select("vec_id", "label", "embedding", "norm"))
    band_cols = [f"band{b}" for b in range(LSH_BANDS_ANN)]
    q = banded.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        *[F.col(c).alias(f"q_{c}") for c in band_cols],
    )
    probe = banded.where(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(q))
    match_any = None
    for c in band_cols:
        m = F.col(c) == F.col(f"q_{c}")
        match_any = m if match_any is None else (match_any | m)
    candidates = probe.where(match_any)
    scored = candidates.select(
        "vec_id",
        "label",
        F.round(_cosine("embedding", F.col("q_emb"), F.col("norm"), F.col("q_norm")), 6).alias(
            "cosine"
        ),
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select("rank", "vec_id", "label", "cosine")
    )


def ext_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via an IVF coarse quantizer.

    Centroids = the IVF_NLIST lowest-vec_id vectors (a deterministic,
    training-free stand-in for k-means — the *plan shape* is what matters:
    assign each vector to its nearest centroid (broadcast NL×D), probe only
    the query's IVF_NPROBE nearest lists). Approximate ⇒ rows-only driver
    check; recall asserted in tests.
    """
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    centroids = emb.where(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
        F.col("norm").alias("cent_norm"),
    )
    # assign: argmax cosine over broadcast centroids
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn(
            "cent_sim", _cosine("embedding", F.col("cent_emb"), F.col("norm"), F.col("cent_norm"))
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("cent_sim").desc(), F.col("cent_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "norm", "cent_id")
    )
    q = assigned.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    # probe lists: the query's IVF_NPROBE nearest centroids
    q_lists = (
        centroids.crossJoin(F.broadcast(q))
        .withColumn("sim", _cosine(F.col("cent_emb"), F.col("q_emb"), F.col("cent_norm"), F.col("q_norm")))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("sim").desc(), F.col("cent_id"))))
        .where(F.col("rn") <= IVF_NPROBE)
        .select("cent_id")
    )
    candidates = assigned.join(F.broadcast(q_lists), "cent_id").where(
        F.col("vec_id") != QUERY_VEC_ID
    )
    scored = candidates.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(_cosine("embedding", F.col("q_emb"), F.col("norm"), F.col("q_norm")), 6).alias("cosine"),
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select("rank", "vec_id", "label", "cosine")
    )
