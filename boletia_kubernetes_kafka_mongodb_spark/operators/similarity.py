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
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
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


def _lsh_bucket_cols(emb_col):
    """Sign-random-projection band hashes, seeds via xxhash64 of (plane, dim).

    The 'random' hyperplane components are xxhash64-derived pseudo-random
    ±weights — deterministic, computed inline, never materialized.
    """
    def plane_dot(band: int, plane: int):
        # component p of hyperplane = ±1 from hash parity — cheap and unbiased
        return F.aggregate(
            F.zip_with(
                emb_col,
                F.sequence(F.lit(0), F.size(emb_col) - 1),
                lambda x, i: x.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(band * 1000 + plane), i), 2) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bands = []
    for band in range(LSH_BANDS_ANN):
        bits = [
            F.when(plane_dot(band, p) >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p)
            for p in range(LSH_PLANES)
        ]
        code = bits[0]
        for b_ in bits[1:]:
            code = code + b_
        bands.append(code.cast("long").alias(f"band{band}"))
    return bands


def ext_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-random-projection LSH with multi-probe bands.

    Candidates = vectors sharing ≥1 of 4 12-bit band codes with the query;
    exact cosine re-ranking on candidates only. At 100 TB: band codes are
    precomputed/bucketed at write time, the probe is a 4-way bucket lookup —
    the full-corpus scan disappears. Approximate ⇒ rows-only driver check;
    recall vs brute force asserted in tests/test_similarity.py.
    """
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    banded = emb.select("vec_id", "label", "embedding", "norm", *_lsh_bucket_cols(F.col("embedding")))
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
