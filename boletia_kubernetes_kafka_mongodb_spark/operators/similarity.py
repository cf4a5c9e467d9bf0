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

import pandas as pd

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


_QUERY_VEC_CACHE: dict = {}


def query_vector(spark: SparkSession, sf_dir: str):
    """The fixed probe vector (vec_id = QUERY_VEC_ID) as a numpy array,
    fetched once per (application, dataset signature) — every ANN serve
    needs it, and re-running the 1-row pushdown scan per probe bills a
    whole Spark job to each query for a value that cannot change while the
    dataset doesn't."""
    import numpy as np

    from ..sources.layouts import dataset_cache_get

    def _fetch():
        emb = tables.load(spark, sf_dir, "embeddings")
        return np.asarray(
            emb.where(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()[0],
            dtype=np.float64,
        )

    return dataset_cache_get(_QUERY_VEC_CACHE, spark, sf_dir, "embeddings", _fetch)


def ext_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors of the query vector (vec_id=0).

    Plan shape: 1-row broadcast (query) × full scan (corpus) → narrow map →
    ``row_number`` over a single global window of k candidates. At scale the
    window is the only ordering step and operates on per-partition top-k
    prefilters if extended; the scan itself never shuffles.
    """
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings", fan=True))
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
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings", fan=True))
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


def _hyperplanes(dim: int) -> list[list[float]]:
    """Deterministic ±1 sign-random-projection hyperplanes.

    Weights derive from md5(plane:dim) parity — reproducible across runs and
    sessions with no stored model, so the same function serves the
    driver-side query signature and the corpus-side expression.
    """
    import hashlib

    rows = []
    for j in range(LSH_BANDS_ANN * LSH_PLANES):
        rows.append(
            [
                1.0 if hashlib.md5(f"{j}:{d}".encode()).digest()[0] % 2 == 0 else -1.0
                for d in range(dim)
            ]
        )
    return rows


def ext_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-random-projection LSH, served from the write-time
    band-bucket layout.

    Candidates = vectors agreeing with the query on ALL planes of ≥1 of the
    8 bands. The band codes are precomputed at write time
    (``sources/layouts.write_srp_band_layout``: embeddings replicated once
    per band, Hive-partitioned by ``srp_bucket``); the probe reads ONLY the
    query's 8 bucket partitions — partition pruning at planning time, the
    full-corpus scan from rounds 1-2 is gone (that form survives below as
    ``ann_lsh_topk_scan``, the index-free fallback the layout path is
    equivalence-tested against). Exact cosine re-rank on candidates only.

    Oracle-backed (round 3): unlike MinHash banding (seeded with Spark's
    xxhash64), the SRP hyperplanes derive from md5 parity — fully
    engine-independent — so DuckDB recomputes the same band codes,
    candidate set and re-rank (`ext_ann_lsh_topk_oracle`). The one
    cross-engine float hazard is the SIGN of a hyperplane dot product
    computed by numpy matmul (layout/scan side, pairwise summation) vs
    `list_dot_product` (oracle, sequential): a dot within ~1e-13 of zero
    could flip — probability ~1e-14 per (vector, plane) on this data;
    accepted and documented. Recall vs brute force additionally asserted
    in tests/test_similarity.py.
    """
    from ..sources import layouts

    path = ensure_srp_layout(spark, sf_dir)
    return layouts.ann_lsh_topk_over_layout(spark, sf_dir, path)


def _sql_rerank_topk(cand_cte: str) -> str:
    """Shared oracle tail for the three ANN probes: exact rounded-cosine
    re-rank of ``cand_cte`` (a CTE with a ``vec_id`` column) against the
    query vector, row_number tie-broken on vec_id — ONE definition so a
    tie-break or rounding-grain change cannot drift between oracles."""
    return f"""scored AS (
            SELECT e.vec_id, e.label,
                   ROUND(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS cosine
            FROM embeddings e
            JOIN {cand_cte} ON {cand_cte}.vec_id = e.vec_id
            CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        )
        SELECT rank, vec_id, label, cosine FROM (
            SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank, *
            FROM scored
        ) WHERE rank <= {TOPK}"""


def ext_ann_lsh_topk_oracle() -> str:
    """DuckDB re-derivation of the full SRP pipeline: md5-parity hyperplane
    weights -> per-band sign codes -> candidates sharing >=1 band with the
    query -> exact rounded-cosine re-rank (same tie-breaks).

    BAKES dim = 64 (DuckDB's generate_series cannot take a subquery bound);
    the Spark side derives dim from data, so a re-dimensioned fixture would
    silently desynchronize — tests/test_similarity.py pins dim == 64 at
    every SF to make that loud."""
    p, b, qid, dim = LSH_PLANES, LSH_BANDS_ANN, QUERY_VEC_ID, 64
    return f"""
        WITH planes AS (
            SELECT j, list(CASE WHEN CAST(concat('0x', substr(md5(j || ':' || d), 1, 2)) AS INTEGER) % 2 = 0
                                THEN 1.0 ELSE -1.0 END ORDER BY d) AS w
            FROM generate_series(0, {b * p - 1}) t1(j), generate_series(0, {dim - 1}) t2(d)
            GROUP BY j
        ),
        bits AS (
            SELECT e.vec_id, p.j // {p} AS band, p.j % {p} AS plane,
                   (list_dot_product(e.embedding::DOUBLE[], p.w) >= 0) AS bit
            FROM embeddings e CROSS JOIN planes p
        ),
        codes AS (
            SELECT vec_id, band,
                   CAST(SUM(CASE WHEN bit THEN 1 << plane ELSE 0 END) AS BIGINT) AS code
            FROM bits GROUP BY vec_id, band
        ),
        qcodes AS (SELECT band, code FROM codes WHERE vec_id = {qid}),
        cand AS (
            SELECT DISTINCT c.vec_id
            FROM codes c JOIN qcodes q ON c.band = q.band AND c.code = q.code
            WHERE c.vec_id != {qid}
        ),
        {_sql_rerank_topk("cand")}
    """


def _srp_layout_path(sf_dir: str) -> str:
    import os
    import tempfile

    from ..sources.layouts import dataset_cache_key

    key = dataset_cache_key(sf_dir, "embeddings")
    # LAYOUT_FMT version in the path: a quantizer/banding CODE change must
    # invalidate on-disk layouts built by older code (the dataset key alone
    # only tracks DATA changes)
    return os.path.join(tempfile.gettempdir(), f"boletia_srp_layout_v2_{key}")


def ensure_srp_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write the SRP band-bucket layout for ``sf_dir`` if absent (checked
    via parquet's ``_SUCCESS``), and return its path — the one-time
    indexing cost; every probe afterwards is an 8-partition pruned scan."""
    import os

    from ..sources import layouts

    path = _srp_layout_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        layouts.write_srp_band_layout(spark, sf_dir, path)
    return path


def ann_lsh_topk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-free SRP-LSH serving path (full scan + in-row band filter).

    The query's sign bits are computed driver-side from the deterministic
    hyperplane matrix; the corpus side is a single vectorized Arrow-batched
    boolean UDF (numpy matmul). Exists as the no-index fallback and as the
    reference ``ext_ann_lsh_topk``'s layout path must exactly match.
    """
    import numpy as np

    emb = tables.load(spark, sf_dir, "embeddings")
    # the query's sign bits are one D-dim vector × the hyperplane matrix —
    # computed driver-side (a 1-row parquet read with vec_id pushdown)
    q_vec = query_vector(spark, sf_dir)
    H = _hyperplanes(len(q_vec))
    q_bits = [bool(b) for b in (np.asarray(H) @ q_vec >= 0)]
    q_norm = float(np.sqrt(q_vec @ q_vec))

    # corpus-side probe: ONE vectorized Arrow-batched boolean UDF — a
    # (rows × D) @ (D × 48) numpy matmul per batch, then per-band
    # all-planes-agree / any-band-agrees reductions. Expressing the 48 dot
    # products as zip_with/aggregate HOFs instead keeps the plan JVM-only
    # but pays ~1µs per interpreted lambda element (48·D per row — measured
    # 2-4s at sf0.1); the matmul is memory-bandwidth-bound and the single
    # UDF column transfers only `embedding` in and one boolean out. No
    # fan_out: the per-row work is trivial, so natural file splits carry
    # the parallelism at scale.
    H_np = np.asarray(H)
    qb_np = np.asarray(q_bits)
    n_bands, n_planes = LSH_BANDS_ANN, LSH_PLANES

    @F.pandas_udf("boolean")
    def band_match(emb_s: pd.Series) -> pd.Series:
        X = np.array([np.asarray(e, dtype=np.float64) for e in emb_s])
        if X.size == 0:
            return pd.Series([], dtype=bool)
        agree = ((X @ H_np.T) >= 0) == qb_np
        return pd.Series(agree.reshape(-1, n_bands, n_planes).all(axis=2).any(axis=1))

    candidates = _with_norm(
        emb.where(F.col("vec_id") != QUERY_VEC_ID).where(band_match("embedding"))
    )
    q = spark.createDataFrame(
        [(q_vec.tolist(), q_norm)], "q_emb: array<double>, q_norm: double"
    )
    scored = candidates.crossJoin(F.broadcast(q)).select(
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


def exact_topk_over_candidates(spark: SparkSession, candidates: DataFrame, q_vec) -> DataFrame:
    """Exact rounded-cosine top-k of ``candidates`` (vec_id, label,
    embedding) against ``q_vec`` — the shared scoring tail of the IVF-family
    serves (round-5: replaces the crossJoin + per-element ``aggregate`` fold
    + global window over EVERY probed row).

    Kernel shape = FAISS IVFFlat's scan: each Arrow batch is scored with ONE
    numpy matmul and emits only its top-k rows (a bounded heap per batch),
    so the global sort sees ≤ k rows per batch instead of the whole probed
    list — the x1/x3/x10 scaling study measured the old per-row fold +
    full-probe sort as the one serve-path term that grew linearly (p=0.73).
    The OUTPUT is unchanged: global top-k of per-batch top-k is exactly the
    top-k over all probed rows (k candidates survive from any batch that
    could contain a winner), same 6dp rounding, same (cosine DESC, vec_id
    ASC) tie-break — so `_sql_rerank_topk` oracles hold as-is. numpy-matmul
    vs DuckDB ``list_dot_product`` parity at 6dp is the same contract the
    k-means / IVF-assignment kernels already rely on.

    Closure rule: captures only numpy arrays / ints (never package symbols —
    the driver imports this module from an arbitrary cwd; workers cannot
    import the package).
    """
    import numpy as np

    q = np.asarray(q_vec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))
    k = TOPK

    def make_score_kernel():
        def score(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
                )
                cos = np.round(
                    (X @ q) / (np.sqrt((X * X).sum(axis=1)) * qn), 6
                )
                ids = pdf["vec_id"].to_numpy()
                # lexsort: last key is primary — (-cos) asc == cosine desc,
                # vec_id asc breaks ties (the oracle's row_number order)
                order = np.lexsort((ids, -cos))[:k]
                yield pd.DataFrame(
                    {
                        "vec_id": ids[order],
                        "label": pdf["label"].to_numpy()[order],
                        "cosine": cos[order],
                    }
                )

        return score

    partial = candidates.select("vec_id", "label", "embedding").mapInPandas(
        make_score_kernel(), "vec_id long, label int, cosine double"
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "vec_id", "label", "cosine")
    )


def ext_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via an IVF coarse quantizer, served from the write-time
    partitioned layout.

    The IVF index is a STORAGE property: embeddings persist partitioned by
    their coarse-quantizer list id (``sources/layouts.write_ivf_layout``,
    built lazily once per sf_dir here), and the probe reads only the
    query's IVF_NPROBE nearest lists — partition pruning at planning time,
    zero per-row filtering, the parquet analogue of a FAISS IVF index. This
    replaces the round-1 form that re-assigned the FULL corpus through a
    pandas UDF on every query (kept below as ``ann_ivf_topk_scan``, the
    index-free fallback and the reference the layout path is tested
    against). Oracle-backed (round 3): centroids are deterministic
    (vec_id < IVF_NLIST) and the assignment rounds cosine similarities to
    6dp BEFORE the argmax on both engines, so DuckDB re-derives the
    identical lists, probe set and re-rank (`ext_ann_ivf_topk_oracle`).
    Recall asserted in tests, partition pruning pinned in
    tests/test_layouts.py.
    """
    from ..sources import layouts

    path = ensure_ivf_layout(spark, sf_dir)
    return layouts.ann_topk_over_layout(spark, sf_dir, path)


def ext_ann_ivf_topk_oracle() -> str:
    """DuckDB re-derivation of the IVF probe: deterministic centroids
    (vec_id < IVF_NLIST), cosine assignment with 6dp rounding before the
    argmax (identical to the layout quantizer), probe the query's
    IVF_NPROBE nearest lists, exact rounded-cosine re-rank."""
    nl, npb, qid = IVF_NLIST, IVF_NPROBE, QUERY_VEC_ID
    cos = """ROUND(list_dot_product(e.embedding::DOUBLE[], c.cvec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"""
    return f"""
        WITH cent AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
            FROM embeddings WHERE vec_id < {nl}
        ),
        sims AS (
            SELECT e.vec_id, c.cid, {cos} AS sim
            FROM embeddings e CROSS JOIN cent c
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, cid ASC) AS rk
                FROM sims
            ) WHERE rk = 1
        ),
        qprobe AS (
            SELECT cid FROM (
                SELECT cid, row_number() OVER (ORDER BY sim DESC, cid ASC) AS rk
                FROM sims WHERE vec_id = {qid}
            ) WHERE rk <= {npb}
        ),
        cand AS (
            SELECT a.vec_id FROM assign a JOIN qprobe USING (cid)
            WHERE a.vec_id != {qid}
        ),
        {_sql_rerank_topk("cand")}
    """


def ext_ann_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN over the IVF layout (round 5): the N_BATCH_QUERIES
    query set served from ONE partition-pruned scan — the ANN counterpart
    of ``ext_topk_batch``'s brute-force batch (same query set, same
    output shape, same tie-breaks).

    The batch-inference serve shape at 100 TB: resolve each query's
    IVF_NPROBE lists driver-side (a NL×NQ numpy product over the cached
    centroid matrix), scan the UNION of probe partitions once, and score
    every batch with ONE (rows × queries) matmul — each row's (16×NQ)
    probe-membership mask decides which queries it may serve. Per batch,
    only the per-query top-k survives (the bounded-heap discipline of
    ``exact_topk_over_candidates``), so the final per-query windows sort
    ≤ k rows per batch, not the probed lists. Amortization is the point:
    N queries cost one scan + one matmul column each, not N scans.

    Oracle: the single-query IVF CTE program generalized — the same
    ``sims`` frame ranks every query's probe lists (queries are corpus
    rows), candidates join assignment × per-query probes, exact rounded
    re-rank partitioned by query.
    """
    import numpy as np

    from ..sources import layouts

    path = ensure_ivf_layout(spark, sf_dir)
    _, C, c_norm = layouts.ivf_assignment_udf(spark, sf_dir)
    emb = tables.load(spark, sf_dir, "embeddings")
    qrows = sorted(
        emb.where(F.col("vec_id") < N_BATCH_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    Q = np.array([r.embedding for r in qrows], dtype=np.float64)  # (NQ, D)
    q_norms = np.sqrt((Q * Q).sum(axis=1))
    nq, k = Q.shape[0], BATCH_TOPK
    # per-query probe lists: 6dp-rounded centroid sims, stable argsort —
    # identical rule to ivf_probe_lists / the oracle's row_number
    sims = np.round((C @ Q.T) / (c_norm[:, None] * q_norms[None, :]), 6)
    probe_mask = np.zeros((C.shape[0], nq), dtype=bool)
    for q in range(nq):
        for lst in np.argsort(-sims[:, q], kind="stable")[:IVF_NPROBE]:
            probe_mask[lst, q] = True
    union = sorted(int(l) for l in np.nonzero(probe_mask.any(axis=1))[0])

    cand = layouts.read_ivf_probe(spark, path, union).select(
        "vec_id", "embedding", "ivf_list"
    )

    def make_batch_kernel():
        def score(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
                )
                ids = pdf["vec_id"].to_numpy()
                lists = pdf["ivf_list"].to_numpy()
                cos = np.round(
                    (X @ Q.T) / (np.sqrt((X * X).sum(axis=1))[:, None] * q_norms[None, :]),
                    6,
                )  # (rows, NQ)
                mask = probe_mask[lists]  # row may serve query iff its list is probed
                mask &= ids[:, None] != np.arange(nq)[None, :]  # self-exclusion
                out_q, out_id, out_cos = [], [], []
                for q in range(nq):
                    rows = np.nonzero(mask[:, q])[0]
                    if rows.size == 0:
                        continue
                    order = rows[np.lexsort((ids[rows], -cos[rows, q]))][:k]
                    out_q.extend([q] * len(order))
                    out_id.extend(ids[order].tolist())
                    out_cos.extend(cos[order, q].tolist())
                if out_q:
                    yield pd.DataFrame(
                        {
                            "query_id": np.array(out_q, dtype=np.int64),
                            "vec_id": np.array(out_id, dtype=np.int64),
                            "cosine": np.array(out_cos),
                        }
                    )

        return score

    partial = cand.mapInPandas(
        make_batch_kernel(), "query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def ext_ann_ivf_batch_oracle() -> str:
    """DuckDB re-derivation: the single-query IVF probe program with the
    query dimension kept — per-query probe ranks come from the same
    ``sims`` frame (queries are corpus rows vec_id < NQ), candidates =
    assignment × per-query probe lists, exact rounded-cosine re-rank
    partitioned by query with the standard tie-break."""
    nl, npb = IVF_NLIST, IVF_NPROBE
    nq, k = N_BATCH_QUERIES, BATCH_TOPK
    cos = """ROUND(list_dot_product(e.embedding::DOUBLE[], c.cvec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"""
    return f"""
        WITH cent AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
            FROM embeddings WHERE vec_id < {nl}
        ),
        sims AS (
            SELECT e.vec_id, c.cid, {cos} AS sim
            FROM embeddings e CROSS JOIN cent c
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, cid ASC) AS rk
                FROM sims
            ) WHERE rk = 1
        ),
        qprobe AS (
            SELECT qid, cid FROM (
                SELECT vec_id AS qid, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, cid ASC) AS rk
                FROM sims WHERE vec_id < {nq}
            ) WHERE rk <= {npb}
        ),
        cand AS (
            SELECT p.qid, a.vec_id
            FROM assign a JOIN qprobe p USING (cid)
            WHERE a.vec_id != p.qid
        ),
        scored AS (
            SELECT c.qid AS query_id, e.vec_id,
                   ROUND(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS cosine
            FROM cand c
            JOIN embeddings e ON e.vec_id = c.vec_id
            JOIN embeddings q ON q.vec_id = c.qid
        )
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id ASC) AS rank,
                   vec_id, cosine
            FROM scored
        ) WHERE rank <= {k}
    """


def ext_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit for the IVF ANN serve — the accuracy-audit family
    member for similarity search (the `ext_dedup_minhash_accuracy` /
    `ext_quality_calibration` pattern: every approximate operator ships
    with a driver-checked measurement of what the approximation costs).

    Per batch query: |ANN top-k ∩ exact top-k| / k, where the ANN side is
    the partition-pruned IVF batch serve (`ext_ann_ivf_batch`) and the
    exact side is the brute-force batch (`ext_topk_batch`) — the two
    operators a user would actually compare, invoked through their own
    code paths so the audit can never drift from what serves. Queries the
    probe missed entirely surface as recall 0 rows, not absent rows.

    Determinism: both sides rank by 6dp-rounded cosine with the identical
    (cosine DESC, vec_id ASC) tie-break, so the intersection count is
    exact cross-engine and the audit carries a full value-hash oracle
    (both CTE programs composed under one WITH).

    Scale: the ANN side is the pruned probe; the exact side is the
    brute-force reference — necessarily one linear scan per audit, which
    is the honest price of measuring recall (run on a sampled query set
    in production; here the fixed batch IS the sample).
    """
    ann = ext_ann_ivf_batch(spark, sf_dir).select(
        "query_id", "vec_id", F.lit(1).alias("_hit")
    )
    exact = ext_topk_batch(spark, sf_dir).select("query_id", "vec_id")
    # optimization round 13 (guide §2.4): the exact side previously fed
    # TWO branches (the hits inner join and the per-query list-size
    # denominator), so the brute-force reference scan — the audit's one
    # expensive pass — executed once per branch. One LEFT join of the
    # (rank-sized, broadcast) ANN list onto the exact list now computes
    # both in a single aggregation: every exact row counts toward k, the
    # matched ones toward hits. Denominator semantics unchanged (the
    # exact side's ACTUAL per-query list size, round-7 ADVICE).
    return (
        exact.join(F.broadcast(ann), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.count("_hit").cast("long").alias("hits"),
        )
        .select(
            "query_id",
            "k",
            "hits",
            F.round(
                F.col("hits").cast("double") / F.col("k").cast("double"), 6
            ).alias("recall"),
        )
    )


def ext_ann_recall_audit_oracle() -> str:
    """The two batch CTE programs composed under one WITH (DuckDB allows a
    nested WITH as a CTE body), joined on (query_id, vec_id). The
    denominator is the exact side's actual per-query list size (round-7
    ADVICE), mirroring the engine."""
    return f"""
        WITH ann AS ({ext_ann_ivf_batch_oracle()}),
        exact AS ({ext_topk_batch_oracle()}),
        hits AS (
            SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS h
            FROM ann a JOIN exact e
              ON e.query_id = a.query_id AND e.vec_id = a.vec_id
            GROUP BY a.query_id
        )
        SELECT q.query_id,
               q.k,
               COALESCE(h.h, 0) AS hits,
               ROUND(CAST(COALESCE(h.h, 0) AS DOUBLE)
                     / CAST(q.k AS DOUBLE), 6) AS recall
        FROM (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h ON h.query_id = q.query_id
    """


# NDCG rank discounts 1/log2(i+1), i = 1..BATCH_TOPK, quantized to BIGINT
# nano-units ONCE in python — both the Spark expression and the oracle SQL
# embed the SAME integer literals, so no engine evaluates a transcendental
# and the discounted sums are order-independent integer arithmetic.
_NDCG_DISC_NANO = tuple(
    int(round(1e9 / __import__("math").log2(i + 1)))
    for i in range(1, BATCH_TOPK + 1)
)
_NDCG_IDEAL_PREFIX = tuple(
    sum(_NDCG_DISC_NANO[: i + 1]) for i in range(len(_NDCG_DISC_NANO))
)


def ext_ann_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k ranking-quality audit for the IVF ANN serve — the audit
    family member `ext_ann_recall_audit` doesn't cover: recall asks "did
    the right ids surface", NDCG asks "did they surface in the right
    ORDER, weighted toward the top" — the number a retrieval stack reports
    next to recall before shipping an index.

    Relevance is the label signal the fixture carries (binary: a
    retrieved vector is relevant iff it shares the query vector's
    ``label`` — the `ext_knn_label_transfer` convention). Per batch
    query: DCG@k over the ANN ranking with 1/log2(rank+1) discounts,
    normalized by the ideal DCG given the corpus's actual relevant count
    (min(k, R_q) top slots filled). Queries the probe missed entirely
    surface as ndcg 0 rows; queries with NO relevant vector anywhere in
    the corpus surface with NULL ndcg (undefined, and visibly so, on
    both engines).

    Determinism: the discounts are BIGINT nano-unit literals generated
    once and embedded in BOTH engines' programs (no runtime log2
    anywhere), so DCG/IDCG are order-independent integer sums and the
    final value is ONE IEEE-exact division, 6dp. Scale: the ANN side is
    the pruned probe serve; relevance joins are a broadcast of the
    NQ-row query-label frame plus one label-equality count per query —
    no brute-force reference scan at all (cheaper than the recall audit,
    which is the point: NDCG-with-labels audits CAN run on every
    deployment batch).
    """
    emb = tables.load(spark, sf_dir, "embeddings")
    labels = emb.where(F.col("embedding").isNotNull()).select("vec_id", "label")
    qlab = labels.where(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    ann = ext_ann_ivf_batch(spark, sf_dir).select("query_id", "rank", "vec_id")
    disc = F.element_at(
        F.lit(list(_NDCG_DISC_NANO)).cast("array<long>"), F.col("rank")
    )
    dcg = (
        ann.join(F.broadcast(qlab), "query_id")
        .join(labels, "vec_id")
        .select(
            "query_id",
            (F.col("label") == F.col("qlabel")).cast("long").alias("rel"),
            disc.alias("disc"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(F.col("rel") * F.col("disc")).cast("long").alias("dcg_n"),
            F.sum("rel").cast("long").alias("n_relevant_retrieved"),
        )
    )
    # corpus relevant pool per query (self excluded): one broadcast
    # label-equality count — NQ × corpus narrow compare, no distances
    rq = (
        labels.join(F.broadcast(qlab), labels["label"] == qlab["qlabel"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_relevant"))
    )
    ideal = F.element_at(
        F.lit(list(_NDCG_IDEAL_PREFIX)).cast("array<long>"),
        F.least(F.col("n_relevant"), F.lit(BATCH_TOPK)).cast("int"),
    )
    return (
        qlab.select("query_id")
        .join(F.broadcast(rq), "query_id", "left")
        .join(F.broadcast(dcg), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce("n_relevant_retrieved", F.lit(0))
            .cast("long")
            .alias("n_relevant_retrieved"),
            F.when(
                F.coalesce("n_relevant", F.lit(0)) > 0,
                F.round(
                    F.coalesce("dcg_n", F.lit(0)).cast("double")
                    / ideal.cast("double"),
                    6,
                ),
            ).alias("ndcg"),
        )
    )


def ext_ann_ndcg_audit_oracle() -> str:
    disc_rows = ", ".join(
        f"({i + 1}, {d})" for i, d in enumerate(_NDCG_DISC_NANO)
    )
    prefix_rows = ", ".join(
        f"({i + 1}, {p})" for i, p in enumerate(_NDCG_IDEAL_PREFIX)
    )
    return f"""
        WITH ann AS ({ext_ann_ivf_batch_oracle()}),
        disc(rank, d) AS (VALUES {disc_rows}),
        ideal(m, idcg_n) AS (VALUES {prefix_rows}),
        labels AS (
            SELECT vec_id, label FROM embeddings WHERE embedding IS NOT NULL
        ),
        qlab AS (
            SELECT vec_id AS query_id, label AS qlabel
            FROM labels WHERE vec_id < {N_BATCH_QUERIES}
        ),
        dcg AS (
            SELECT a.query_id,
                   CAST(SUM(CASE WHEN l.label = q.qlabel THEN dc.d ELSE 0 END)
                        AS BIGINT) AS dcg_n,
                   CAST(SUM(CASE WHEN l.label = q.qlabel THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_relevant_retrieved
            FROM ann a
            JOIN qlab q ON q.query_id = a.query_id
            JOIN labels l ON l.vec_id = a.vec_id
            JOIN disc dc ON dc.rank = a.rank
            GROUP BY a.query_id
        ),
        rq AS (
            SELECT q.query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
            FROM labels l JOIN qlab q ON l.label = q.qlabel
            WHERE l.vec_id <> q.query_id
            GROUP BY q.query_id
        )
        SELECT q.query_id,
               COALESCE(r.n_relevant, 0) AS n_relevant,
               COALESCE(d.n_relevant_retrieved, 0) AS n_relevant_retrieved,
               CASE WHEN COALESCE(r.n_relevant, 0) > 0 THEN
                   ROUND(CAST(COALESCE(d.dcg_n, 0) AS DOUBLE)
                         / CAST(i.idcg_n AS DOUBLE), 6)
               END AS ndcg
        FROM qlab q
        LEFT JOIN rq r ON r.query_id = q.query_id
        LEFT JOIN dcg d ON d.query_id = q.query_id
        LEFT JOIN ideal i
          ON i.m = LEAST(COALESCE(r.n_relevant, 0), {BATCH_TOPK})
    """


def _ivf_layout_path(sf_dir: str) -> str:
    import os
    import tempfile

    from ..sources.layouts import dataset_cache_key

    # content-signature key: a regenerated embeddings table invalidates the
    # layout (path-only keys serve stale indexes silently)
    key = dataset_cache_key(sf_dir, "embeddings")
    # v2: assignment rounds similarities to 6dp before argmax (cross-engine
    # determinism) — older layouts used unrounded argmax
    return os.path.join(tempfile.gettempdir(), f"boletia_ivf_layout_v2_{key}")


def ensure_ivf_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write the IVF-partitioned embedding layout for ``sf_dir`` if it isn't
    already on disk (checked via parquet's ``_SUCCESS`` marker), and return
    its path. The write is the one-time indexing cost every vector index
    pays; every subsequent probe is a pruned scan."""
    import os

    from ..sources import layouts

    path = _ivf_layout_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        layouts.write_ivf_layout(spark, sf_dir, path)
    return path


def ann_ivf_topk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-free IVF serving path (full scan + in-row list filter).

    Centroids = the IVF_NLIST lowest-vec_id vectors (a deterministic,
    training-free stand-in for k-means — the *plan shape* is what matters:
    assign each vector to its nearest centroid via one vectorized Arrow UDF
    against the driver-collected NL×D centroid matrix, probe only the
    query's IVF_NPROBE nearest lists). Exists as the no-index fallback and
    as the reference ``ext_ann_ivf_topk``'s layout path must exactly match.
    """
    import numpy as np

    emb = tables.load(spark, sf_dir, "embeddings")
    # centroid matrix is IVF_NLIST × D — collect it driver-side (a tiny
    # pushdown scan) and resolve the probe lists there too; shipping a
    # 16-row dim table through crossJoin+window cost two shuffles and two
    # window sorts for what is a (16×D)@(D,) numpy product
    cent = sorted(
        emb.where(F.col("vec_id") < IVF_NLIST).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    C = np.array([r.embedding for r in cent], dtype=np.float64)  # (NL, D)
    c_norm = np.sqrt((C * C).sum(axis=1))
    q_vec = query_vector(spark, sf_dir)
    q_norm = float(np.sqrt(q_vec @ q_vec))
    # the query's IVF_NPROBE nearest centroids (ties → lowest cent_id, same
    # as the former row_number(ORDER BY sim DESC, cent_id) formulation);
    # rounded to 6dp first — cross-engine determinism, see assignment UDF
    c_sims = np.round((C @ q_vec) / (c_norm * q_norm), 6)
    probe = sorted(np.argsort(-c_sims, kind="stable")[:IVF_NPROBE].tolist())

    @F.pandas_udf("long")
    def assign(emb_s: pd.Series) -> pd.Series:
        X = np.array([np.asarray(e, dtype=np.float64) for e in emb_s])
        if X.size == 0:
            return pd.Series([], dtype="int64")
        sims = (X @ C.T) / (np.sqrt((X * X).sum(axis=1))[:, None] * c_norm)
        # rounded before argmax (cross-engine determinism); argmax returns
        # the FIRST max ⇒ lowest cent_id on ties (C is vec_id-ordered),
        # matching the window tie-break
        return pd.Series(np.argmax(np.round(sims, 6), axis=1).astype("int64"))

    candidates = emb.where(F.col("vec_id") != QUERY_VEC_ID).where(
        assign("embedding").isin(probe)
    )
    return exact_topk_over_candidates(spark, candidates, q_vec)


# ---------------------------------------------------------------------------
# IVF index refresh under corpus growth (round 10)
# ---------------------------------------------------------------------------

_IVF_STANDING_QUANT_CACHE: dict = {}


def _ivf_standing_quantizer(spark: SparkSession, sf_dir: str):
    """The FROZEN coarse quantizer of the standing index: centroids are the
    IVF_NLIST lowest non-null vec_ids of the STANDING corpus (the non-test
    hash splits — the corpus that existed when the index was built), with
    centroid id = rank position (the `kmeans_init_centroids` derivation
    applied to the IVF family). Same 6dp-rounded cosine argmax as
    ``_build_ivf_quantizer``; cached per (application, dataset signature).

    Freezing is the point of a refresh: arriving vectors are assigned by
    the quantizer that PLACED the existing billions of rows — re-deriving
    centroids from the grown corpus would silently re-home standing
    partitions and turn a cheap append into a full re-index
    (`ext_embed_drift` firing is the signal that the frozen geometry has
    expired and a true re-cluster is due)."""
    import numpy as np

    from .sampling import split_assignment
    from ..sources.layouts import dataset_cache_get

    def _build():
        emb = tables.load(spark, sf_dir, "embeddings")
        cent = (
            emb.where(
                F.col("embedding").isNotNull()
                & (split_assignment("vec_id") != "test")
            )
            .orderBy("vec_id")
            .limit(IVF_NLIST)
            .select("embedding")
            .collect()
        )
        C = np.array([r.embedding for r in cent], dtype=np.float64)
        c_norm = np.sqrt((C * C).sum(axis=1))

        # closure rule: capture only numpy arrays (never package symbols)
        @F.pandas_udf("long")
        def assign(emb_s: pd.Series) -> pd.Series:
            import numpy as np

            X = np.array([np.asarray(e, dtype=np.float64) for e in emb_s])
            if X.size == 0:
                return pd.Series([], dtype="int64")
            sims = (X @ C.T) / (np.sqrt((X * X).sum(axis=1))[:, None] * c_norm)
            return pd.Series(np.argmax(np.round(sims, 6), axis=1).astype("int64"))

        return assign, C, c_norm

    return dataset_cache_get(
        _IVF_STANDING_QUANT_CACHE, spark, sf_dir, "embeddings", _build,
        tag="standing",
    )


def _ivf_refresh_path(sf_dir: str) -> str:
    import os
    import tempfile

    from ..sources.layouts import dataset_cache_key

    key = dataset_cache_key(sf_dir, "embeddings")
    return os.path.join(tempfile.gettempdir(), f"boletia_ivf_refresh_v1_{key}")


def ensure_refreshed_ivf_layout(spark: SparkSession, sf_dir: str) -> str:
    """The nightly index-maintenance job, materialized once per dataset:

    1. BUILD — the standing corpus (non-test hash splits, the
       ``ext_dedup_incremental`` convention for "yesterday's data") is
       written partitioned by its frozen-quantizer list id, exactly
       ``write_ivf_layout``'s shape.
    2. REFRESH — the arriving batch (test split) is assigned by the SAME
       frozen quantizer and APPENDED: each new vector lands in its
       ``ivf_list=<k>/`` directory; no standing row is rewritten. At
       100 TB this is the step that runs nightly — cost is the batch
       size, never the index size.
    3. COMPACT — ``compact_layout`` collapses the append's small files so
       probe scans keep one task per file (the maintenance job every
       incremental sink needs).

    The refreshed layout serves through the same partition-pruned probe
    path as the one-shot layout, and equals a from-scratch rebuild under
    the same frozen quantizer row-for-row (pinned in tests — appends
    must place vectors exactly where a rebuild would)."""
    import os

    from .sampling import split_assignment
    from ..sources import layouts

    path = _ivf_refresh_path(sf_dir)
    marker = os.path.join(path, "_REFRESHED")
    if os.path.exists(marker):
        return path
    assign, _, _ = _ivf_standing_quantizer(spark, sf_dir)
    emb = tables.load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    layouts._invalidate_layout(path)
    # build: static overwrite clears any partial prior attempt
    (
        emb.where(split_assignment("vec_id") != "test")
        .withColumn("ivf_list", assign("embedding"))
        .write.mode("overwrite")
        .partitionBy("ivf_list")
        .parquet(path)
    )
    # refresh: frozen-quantizer assignment of the arriving batch, appended
    (
        emb.where(split_assignment("vec_id") == "test")
        .withColumn("ivf_list", assign("embedding"))
        .write.mode("append")
        .partitionBy("ivf_list")
        .parquet(path)
    )
    layouts._invalidate_layout(path)
    layouts.compact_layout(spark, path)
    layouts._invalidate_layout(path)
    with open(marker, "w") as f:
        f.write("build+append+compact complete\n")
    return path


def ext_ann_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index refresh manifest — the round-9 verdict's one remaining
    LLM-pipeline gap: incremental maintenance of the IVF layout as the
    corpus grows. Runs the build→append→compact job
    (``ensure_refreshed_ivf_layout``) and emits, per IVF list, the
    refresh bookkeeping read back FROM THE REFRESHED LAYOUT ITSELF:
    ``(ivf_list, n_standing, n_added, n_total)`` — standing/added
    membership recomputed from the hash split of the stored key, so a
    misplaced append (wrong partition, dropped row, double write) breaks
    the cross-engine hash. Output is NLIST rows.

    Oracle: DuckDB re-derives the frozen standing-corpus centroids
    (rank-position ids over the non-test split's lowest vec_ids), the
    6dp-rounded cosine argmax assignment of the FULL grown corpus, and
    the same per-list split counts — the refreshed physical layout must
    agree with the declarative statement of what a rebuild would hold.

    Serving and acceptance live on the composed surface: the refreshed
    layout serves through the same partition-pruned probe path
    (``ann_topk_over_refreshed``), and the standing recall/NDCG audits
    are the acceptance gate a deployment runs before promoting the
    refreshed index."""
    from .sampling import split_assignment
    from ..sources import layouts

    path = ensure_refreshed_ivf_layout(spark, sf_dir)
    lay = layouts.read_layout(spark, path)
    is_new = split_assignment("vec_id") == "test"
    return (
        lay.select(F.col("ivf_list").cast("int").alias("ivf_list"), is_new.alias("is_new"))
        .groupBy("ivf_list")
        .agg(
            F.sum(F.when(F.col("is_new"), 0).otherwise(1)).cast("long").alias("n_standing"),
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_added"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
    )


def ext_ann_index_refresh_oracle() -> str:
    from .sampling import TRAIN_PCT, VAL_PCT, _oracle_key_hash

    nl = IVF_NLIST
    old_pct = TRAIN_PCT + VAL_PCT
    h = _oracle_key_hash("vec_id")
    cos = """ROUND(list_dot_product(e.embedding::DOUBLE[], c.cvec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"""
    return f"""
        WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
                   embedding::DOUBLE[] AS cvec
            FROM (
                SELECT vec_id, embedding FROM embeddings
                WHERE embedding IS NOT NULL AND {h} % 100 < {old_pct}
                ORDER BY vec_id LIMIT {nl}
            )
        ),
        sims AS (
            SELECT e.vec_id, c.cid, {cos} AS sim
            FROM embeddings e CROSS JOIN cent c
            WHERE e.embedding IS NOT NULL
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, cid ASC) AS rk
                FROM sims
            ) WHERE rk = 1
        )
        SELECT CAST(cid AS INTEGER) AS ivf_list,
               CAST(SUM(CASE WHEN {h} % 100 < {old_pct} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_standing,
               CAST(SUM(CASE WHEN {h} % 100 >= {old_pct} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_added,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM assign GROUP BY cid
    """


def ann_topk_over_refreshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ext_ann_ivf_topk`` semantics served from the REFRESHED layout:
    probe lists come from the frozen standing quantizer, the scan is
    partition-pruned to them, scoring is the shared bounded-top-k matmul
    kernel. Arriving vectors are first-class the moment the append
    commits — they live in real partitions, not a side table."""
    import numpy as np

    from ..sources import layouts

    path = ensure_refreshed_ivf_layout(spark, sf_dir)
    _, C, c_norm = _ivf_standing_quantizer(spark, sf_dir)
    q_vec = query_vector(spark, sf_dir)
    q_norm = float(np.sqrt(q_vec @ q_vec))
    c_sims = np.round((C @ q_vec) / (c_norm * q_norm), 6)
    probe = sorted(np.argsort(-c_sims, kind="stable")[:IVF_NPROBE].tolist())
    candidates = (
        layouts.read_ivf_probe(spark, path, probe)
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", "embedding")
    )
    return exact_topk_over_candidates(spark, candidates, q_vec)


# --- staged index promotion (recall-gated rebase as a driver-attested op) ---

PROMOTE_K = 5        # recall@k of the audit
PROMOTE_NQ = 4       # probe queries (lowest non-null vec_ids)
PROMOTE_MIN_HITS = 10  # promote iff hits >= this, i.e. recall >= 0.5 of K*NQ

_PROMOTE_CACHE: dict = {}


def _promote_new_quantizer(spark: SparkSession, sf_dir: str):
    """The CANDIDATE re-clustering's quantizer: IVF_NLIST lowest ODD
    non-null vec_ids, cid = rank position — deterministically different
    geometry from the standing quantizer (vec_id < IVF_NLIST), so the
    audit measures a genuine re-index, and SQL-rederivable so the oracle
    can re-run the whole promotion decision."""
    import numpy as np

    emb = tables.load(spark, sf_dir, "embeddings")
    rows = (
        emb.where(F.col("embedding").isNotNull() & (F.col("vec_id") % 2 == 1))
        .orderBy("vec_id")
        .limit(IVF_NLIST)
        .select("embedding")
        .collect()
    )
    return np.array([r.embedding for r in rows], dtype=np.float64)


def _make_assign_udf(C, farthest: bool = False):
    """Arrow-batched assignment to the nearest (or, for the poisoned
    candidate, the FARTHEST) of the captured centroids — 6dp-rounded
    cosine before the arg pick, ties to the lowest cid, the cross-engine
    convention every IVF oracle here uses."""
    import numpy as np

    C = np.asarray(C, dtype=np.float64)
    c_norm = np.sqrt((C * C).sum(axis=1))

    @F.pandas_udf("long")
    def assign(emb_s: pd.Series) -> pd.Series:
        import numpy as np

        X = np.array([np.asarray(e, dtype=np.float64) for e in emb_s])
        if X.size == 0:
            return pd.Series([], dtype="int64")
        sims = np.round(
            (X @ C.T) / (np.sqrt((X * X).sum(axis=1))[:, None] * c_norm), 6
        )
        pick = np.argmin(sims, axis=1) if farthest else np.argmax(sims, axis=1)
        return pd.Series(pick.astype("int64"))

    return assign


def _serve_hits_at_k(cand_df: DataFrame, C_new, qids, Q, k: int, nprobe: int) -> int:
    """Σ_q |served top-k ∩ exact top-k| over a staged candidate frame —
    the promotion audit's metric, computed DISTRIBUTED: one mapInPandas
    matmul pass emits per-partition top-k for BOTH sides (exact = all
    candidate rows; served = rows whose ivf_list is in the query's
    nprobe-nearest lists under the CANDIDATE quantizer), then one window
    reduces partials and one join counts the intersection. The only
    driver transfer is the final count — the shape that still works when
    the candidate is the full 100 TB index (probe resolution is an
    NL×NQ numpy product over the driver-held centroid matrix, the same
    economics as ``ext_ann_ivf_batch``)."""
    import numpy as np

    C = np.asarray(C_new, dtype=np.float64)
    c_norm = np.sqrt((C * C).sum(axis=1))
    Q = np.asarray(Q, dtype=np.float64)
    q_norms = np.sqrt((Q * Q).sum(axis=1))
    qid_arr = np.asarray(qids, dtype=np.int64)
    nq = Q.shape[0]
    sims = np.round((C @ Q.T) / (c_norm[:, None] * q_norms[None, :]), 6)
    probe_mask = np.zeros((C.shape[0], nq), dtype=bool)
    for q in range(nq):
        for lst in np.argsort(-sims[:, q], kind="stable")[:nprobe]:
            probe_mask[lst, q] = True

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            ids = pdf["vec_id"].to_numpy()
            lists = pdf["ivf_list"].to_numpy().astype(np.int64)
            cos = np.round(
                (X @ Q.T)
                / (np.sqrt((X * X).sum(axis=1))[:, None] * q_norms[None, :]),
                6,
            )
            notself = ids[:, None] != qid_arr[None, :]
            out_q, out_id, out_cos, out_side = [], [], [], []
            for q in range(nq):
                rows = np.nonzero(notself[:, q])[0]
                if rows.size == 0:
                    continue
                order = rows[np.lexsort((ids[rows], -cos[rows, q]))][:k]
                out_q.extend([q] * len(order))
                out_id.extend(ids[order].tolist())
                out_cos.extend(cos[order, q].tolist())
                out_side.extend([0] * len(order))
                srows = rows[probe_mask[lists[rows], q]]
                sorder = srows[np.lexsort((ids[srows], -cos[srows, q]))][:k]
                out_q.extend([q] * len(sorder))
                out_id.extend(ids[sorder].tolist())
                out_cos.extend(cos[sorder, q].tolist())
                out_side.extend([1] * len(sorder))
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.array(out_q, dtype=np.int64),
                        "vec_id": np.array(out_id, dtype=np.int64),
                        "cosine": np.array(out_cos),
                        "side": np.array(out_side, dtype=np.int32),
                    }
                )

    partial = cand_df.select("vec_id", "embedding", "ivf_list").mapInPandas(
        kernel, "query_id long, vec_id long, cosine double, side int"
    )
    w = Window.partitionBy("side", "query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    top = (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("side", "query_id", "vec_id")
    )
    exact = top.where(F.col("side") == 0).select("query_id", "vec_id")
    served = top.where(F.col("side") == 1).select("query_id", "vec_id")
    return exact.join(served, ["query_id", "vec_id"]).count()


def ext_ann_index_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged, recall-gated index promotion as a driver-attested operator
    (round-11 verdict #3): drive ``IncrementalIvfIndex.rebase(df,
    audit=...)`` (`sources/layouts.py`) through BOTH decision branches
    against a live index and emit, per candidate, the audit verdict AND
    the post-decision committed manifest read back FROM THE INDEX ITSELF.

    Protocol (attempted in this order against one index):

    1. Standing index: the corpus assigned by the standing quantizer
       (vec_id < IVF_NLIST centroids), committed as the serving base.
    2. POISONED candidate: re-assignment under the NEW quantizer
       (lowest-odd-vec_id centroids) to each vector's FARTHEST list —
       a broken re-clustering. The staged audit's recall@PROMOTE_K over
       PROMOTE_NQ probe queries collapses (probes look at nearest lists)
       → rejected; the committed manifest must still be the STANDING
       assignment.
    3. GOOD candidate: nearest-list assignment under the same new
       quantizer → passes the audit → promoted; the committed manifest
       must be the NEW assignment.

    The manifest fingerprint ``Σ vec_id·(ivf_list+1)`` is
    assignment-sensitive, so a wrong decision in either direction (a
    rejected candidate leaking in, an accepted one not landing) breaks
    the cross-engine hash. Decision rule is integer (hits ≥
    PROMOTE_MIN_HITS of PROMOTE_K·PROMOTE_NQ) — no float threshold at
    the branch. The oracle re-derives quantizers, assignments, pruned
    serve paths, recall and both decisions declaratively in SQL.

    Scale: the audit is the distributed two-sided top-k of
    ``_serve_hits_at_k`` (exact side = one scan of the candidate — the
    honest price of measuring recall, run on a sampled query set in
    production); everything committed moves through the pointer-file
    protocol (crash-atomic, power-loss-durable after round 11/12)."""
    from ..sources.layouts import dataset_cache_get

    def build():
        import shutil
        import tempfile

        import numpy as np

        from ..sources import layouts

        emb = tables.load(spark, sf_dir, "embeddings")
        corpus = emb.where(F.col("embedding").isNotNull()).select(
            "vec_id", "label", "embedding"
        )
        assign_std, _, _ = layouts.ivf_assignment_udf(spark, sf_dir)
        C_new = _promote_new_quantizer(spark, sf_dir)
        qrows = sorted(
            corpus.orderBy("vec_id")
            .limit(PROMOTE_NQ)
            .select("vec_id", "embedding")
            .collect(),
            key=lambda r: r.vec_id,
        )
        qids = [r.vec_id for r in qrows]
        Q = np.array([r.embedding for r in qrows], dtype=np.float64)

        audit_hits: list[int] = []

        def audit(cand) -> bool:
            hits = (
                0
                if cand is None
                else _serve_hits_at_k(cand, C_new, qids, Q, PROMOTE_K, IVF_NPROBE)
            )
            audit_hits.append(int(hits))
            return hits >= PROMOTE_MIN_HITS

        def manifest(idx):
            row = idx.read().agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.countDistinct("ivf_list").cast("long").alias("l"),
                F.sum(
                    F.col("vec_id") * (F.col("ivf_list").cast("long") + F.lit(1))
                )
                .cast("long")
                .alias("fp"),
            ).first()
            return int(row.n), int(row.l), int(row.fp)

        work = tempfile.mkdtemp(prefix="boletia_promote_")
        try:
            idx = layouts.IncrementalIvfIndex(spark, work)
            idx.init_base(corpus.withColumn("ivf_list", assign_std("embedding")))
            out = []
            for name, farthest in (("poisoned", True), ("good", False)):
                cand = corpus.withColumn(
                    "ivf_list", _make_assign_udf(C_new, farthest=farthest)("embedding")
                )
                promoted = idx.rebase(cand, audit=audit)
                hits = audit_hits[-1]
                n, nlists, fp = manifest(idx)
                out.append(
                    {
                        "candidate": name,
                        "audited_hits": hits,
                        "audited_recall": round(hits / float(PROMOTE_K * PROMOTE_NQ), 6),
                        "decision": "promoted" if promoted else "rejected",
                        "committed_rows": n,
                        "committed_lists": nlists,
                        "committed_fprint": fp,
                    }
                )
            return out
        finally:
            shutil.rmtree(work, ignore_errors=True)

    rows = dataset_cache_get(
        _PROMOTE_CACHE, spark, sf_dir, "embeddings", build, tag="ann_promote"
    )
    return spark.createDataFrame(
        rows,
        "candidate string, audited_hits long, audited_recall double, "
        "decision string, committed_rows long, committed_lists long, "
        "committed_fprint long",
    )


def ext_ann_index_promote_oracle() -> str:
    """DuckDB re-derivation of the full promotion protocol: standing and
    candidate quantizers (rank-position centroid rules), nearest/farthest
    6dp-cosine assignments, per-query nprobe probe lists, pruned-serve
    vs exact top-k recall, the integer promote/reject decision, and the
    post-decision committed manifest each branch must leave behind."""
    nl, npb, k, nq = IVF_NLIST, IVF_NPROBE, PROMOTE_K, PROMOTE_NQ
    denom = k * nq
    min_hits = PROMOTE_MIN_HITS

    def cos(a: str, b: str) -> str:
        return f"""ROUND(list_dot_product({a}, {b})
                 / (sqrt(list_dot_product({a}, {a}))
                    * sqrt(list_dot_product({b}, {b}))), 6)"""

    return f"""
        WITH corpus AS (
            SELECT vec_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        stdcent AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
            FROM embeddings WHERE vec_id < {nl}
        ),
        newcent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
                   embedding::DOUBLE[] AS cvec
            FROM (
                SELECT vec_id, embedding FROM embeddings
                WHERE embedding IS NOT NULL AND vec_id % 2 = 1
                ORDER BY vec_id LIMIT {nl}
            )
        ),
        assign_std AS (
            SELECT vec_id, cid FROM (
                SELECT c.vec_id, s.cid,
                       row_number() OVER (PARTITION BY c.vec_id
                                          ORDER BY {cos('c.v', 's.cvec')} DESC,
                                                   s.cid ASC) AS rk
                FROM corpus c CROSS JOIN stdcent s
            ) WHERE rk = 1
        ),
        sims_new AS (
            SELECT c.vec_id, n.cid, {cos('c.v', 'n.cvec')} AS sim
            FROM corpus c CROSS JOIN newcent n
        ),
        assign_good AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, cid ASC) AS rk
                FROM sims_new
            ) WHERE rk = 1
        ),
        assign_poison AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim ASC, cid ASC) AS rk
                FROM sims_new
            ) WHERE rk = 1
        ),
        queries AS (
            SELECT vec_id AS query_id, v AS qv
            FROM corpus ORDER BY vec_id LIMIT {nq}
        ),
        qprobe AS (
            SELECT query_id, cid FROM (
                SELECT q.query_id, n.cid,
                       row_number() OVER (PARTITION BY q.query_id
                                          ORDER BY {cos('q.qv', 'n.cvec')} DESC,
                                                   n.cid ASC) AS rk
                FROM queries q CROSS JOIN newcent n
            ) WHERE rk <= {npb}
        ),
        pair AS (
            SELECT q.query_id, c.vec_id, {cos('c.v', 'q.qv')} AS cs
            FROM corpus c CROSS JOIN queries q
            WHERE c.vec_id != q.query_id
        ),
        exact_k AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cs DESC, vec_id ASC) AS rk
                FROM pair
            ) WHERE rk <= {k}
        ),
        served_good AS (
            SELECT query_id, vec_id FROM (
                SELECT p.query_id, p.vec_id,
                       row_number() OVER (PARTITION BY p.query_id
                                          ORDER BY p.cs DESC, p.vec_id ASC) AS rk
                FROM pair p
                JOIN assign_good a ON a.vec_id = p.vec_id
                JOIN qprobe pr ON pr.query_id = p.query_id AND pr.cid = a.cid
            ) WHERE rk <= {k}
        ),
        served_poison AS (
            SELECT query_id, vec_id FROM (
                SELECT p.query_id, p.vec_id,
                       row_number() OVER (PARTITION BY p.query_id
                                          ORDER BY p.cs DESC, p.vec_id ASC) AS rk
                FROM pair p
                JOIN assign_poison a ON a.vec_id = p.vec_id
                JOIN qprobe pr ON pr.query_id = p.query_id AND pr.cid = a.cid
            ) WHERE rk <= {k}
        ),
        stats AS (
            SELECT
              (SELECT CAST(COUNT(*) AS BIGINT) FROM served_good s
                 JOIN exact_k e ON e.query_id = s.query_id
                              AND e.vec_id = s.vec_id) AS hits_good,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM served_poison s
                 JOIN exact_k e ON e.query_id = s.query_id
                              AND e.vec_id = s.vec_id) AS hits_poison,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_rows,
              (SELECT CAST(COUNT(DISTINCT cid) AS BIGINT) FROM assign_std)
                  AS lists_std,
              (SELECT CAST(COUNT(DISTINCT cid) AS BIGINT) FROM assign_good)
                  AS lists_good,
              (SELECT CAST(COUNT(DISTINCT cid) AS BIGINT) FROM assign_poison)
                  AS lists_poison,
              (SELECT CAST(SUM(vec_id * (cid + 1)) AS BIGINT) FROM assign_std)
                  AS fp_std,
              (SELECT CAST(SUM(vec_id * (cid + 1)) AS BIGINT) FROM assign_good)
                  AS fp_good,
              (SELECT CAST(SUM(vec_id * (cid + 1)) AS BIGINT) FROM assign_poison)
                  AS fp_poison
        )
        SELECT 'poisoned' AS candidate,
               hits_poison AS audited_hits,
               ROUND(CAST(hits_poison AS DOUBLE) / {denom}, 6) AS audited_recall,
               CASE WHEN hits_poison >= {min_hits}
                    THEN 'promoted' ELSE 'rejected' END AS decision,
               n_rows AS committed_rows,
               CASE WHEN hits_poison >= {min_hits}
                    THEN lists_poison ELSE lists_std END AS committed_lists,
               CASE WHEN hits_poison >= {min_hits}
                    THEN fp_poison ELSE fp_std END AS committed_fprint
        FROM stats
        UNION ALL
        SELECT 'good',
               hits_good,
               ROUND(CAST(hits_good AS DOUBLE) / {denom}, 6),
               CASE WHEN hits_good >= {min_hits}
                    THEN 'promoted' ELSE 'rejected' END,
               n_rows,
               CASE WHEN hits_good >= {min_hits}
                    THEN lists_good ELSE lists_std END,
               CASE WHEN hits_good >= {min_hits}
                    THEN fp_good ELSE fp_std END
        FROM stats
    """


KNN_BLOCKS = 8  # tile degree for the exact 1-NN join


def ext_knn_label_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-NN label transfer: every vector's nearest neighbor (cosine)
    and whether the neighbor's class label agrees — the weak-supervision /
    label-propagation primitive, and the standard embedding-quality probe
    (neighborhood label purity).

    Physical plan: the same block-tile shape as ``dedup.ext_dedup_embedding``
    — vectors replicate to their (i ≤ j) tiles via explode, each tile emits
    its per-vector best candidate from one numpy matmul
    (``make_knn_tile_kernel``), and a groupBy max on (cosine, −neighbor_id)
    reduces tile candidates to the global 1-NN. All-pairs compute tiled to
    (N/B)² tasks, (B+1)/2 × shuffle replication, no driver collect, and the
    final reduce shuffles one candidate row per (vector, tile) — not the
    pair space. Ties break to the lowest neighbor id on the ROUNDED cosine,
    matching the oracle window exactly.
    """
    from ._pandas_udfs import make_knn_tile_kernel
    from .dedup import _block_degree

    emb = tables.load(spark, sf_dir, "embeddings")
    B = _block_degree(sf_dir, "embeddings", floor=KNN_BLOCKS)
    # null vectors can't participate in cosine — drop before the kernel
    v = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", "label", "embedding",
        F.pmod("vec_id", F.lit(B)).cast("int").alias("blk"),
    )
    as_a = v.select(
        F.col("blk").alias("pi"),
        F.explode(F.sequence("blk", F.lit(B - 1))).alias("pj"),
        "vec_id", "label", "embedding",
        F.lit("a").alias("side"),
    )
    # guard blk > 0: sequence(0, -1) would count DOWN, not produce empty
    as_b = v.where(F.col("blk") > 0).select(
        F.explode(F.sequence(F.lit(0), F.col("blk") - 1)).alias("pi"),
        F.col("blk").alias("pj"),
        "vec_id", "label", "embedding",
        F.lit("b").alias("side"),
    )
    candidates = as_a.unionByName(as_b).groupBy("pi", "pj").applyInPandas(
        make_knn_tile_kernel(),
        schema="vec_id long, label int, nn_vec_id long, nn_label int, cosine double",
    )
    best = candidates.groupBy("vec_id", "label").agg(
        F.max(
            F.struct(
                F.col("cosine"),
                (-F.col("nn_vec_id")).alias("neg_nn"),
                F.col("nn_label").alias("nn_label"),
            )
        ).alias("b")
    )
    return best.select(
        "vec_id",
        "label",
        (-F.col("b.neg_nn")).alias("nn_vec_id"),
        F.col("b.nn_label").alias("nn_label"),
        F.col("b.cosine").alias("cosine"),
        (F.col("label") == F.col("b.nn_label")).alias("label_match"),
    )


def ext_knn_label_transfer_oracle() -> str:
    return """
        SELECT vec_id, label, nn_vec_id, nn_label, cosine,
               (label = nn_label) AS label_match
        FROM (
            SELECT e.vec_id, e.label, n.vec_id AS nn_vec_id, n.label AS nn_label,
                   ROUND(list_dot_product(e.embedding::DOUBLE[], n.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(n.embedding::DOUBLE[], n.embedding::DOUBLE[]))), 6) AS cosine,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], n.embedding::DOUBLE[])
                                      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                         * sqrt(list_dot_product(n.embedding::DOUBLE[], n.embedding::DOUBLE[]))), 6) DESC,
                                n.vec_id ASC
                   ) AS rn
            FROM embeddings e JOIN embeddings n ON e.vec_id != n.vec_id
        ) WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# int8 embedding quantization (the storage-compression fidelity report)
# ---------------------------------------------------------------------------

QUANT_LEVELS = 127  # symmetric int8: q ∈ [-127, 127]


def ext_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 symmetric quantization fidelity: scale = max|x|/127,
    q_i = round(x_i/scale), and the report compares x against the
    reconstruction q·scale — cosine fidelity and MSE. This is the audit a
    pipeline runs before shipping embeddings at a quarter of the storage
    (fp32 → int8 is the standard 100 TB-scale vector-store move); the
    decision to quantize is exactly "is cos_fidelity acceptably close to 1".

    All math is native higher-order functions on doubles — one narrow map,
    no shuffle, no UDF; both engines round half-away-from-zero so even the
    quantized codes agree bit-for-bit cross-engine.
    """
    emb = tables.load(spark, sf_dir, "embeddings", fan=True)
    base = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    s = base.select(
        "vec_id",
        "x",
        (
            F.array_max(F.transform("x", lambda v: F.abs(v))) / QUANT_LEVELS
        ).alias("scale"),
    )
    rec = F.transform(
        "x", lambda v: F.round(v / F.col("scale"), 0) * F.col("scale")
    )
    d = s.where(F.col("scale") > 0).select(
        "vec_id",
        "scale",
        _dot("x", rec).alias("dot_xr"),
        F.sqrt(_dot("x", "x")).alias("norm_x"),
        F.sqrt(_dot(rec, rec)).alias("norm_r"),
        F.aggregate(
            F.zip_with("x", rec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sq_err"),
        F.size("x").alias("dim"),
    )
    return d.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(F.col("dot_xr") / (F.col("norm_x") * F.col("norm_r")), 6).alias(
            "cos_fidelity"
        ),
        F.round(F.col("sq_err") / F.col("dim"), 9).alias("mse"),
    )


def ext_embed_quantize_oracle() -> str:
    return f"""
        WITH s AS (
            SELECT vec_id, embedding::DOUBLE[] AS x,
                   list_max(list_transform(embedding::DOUBLE[], v -> abs(v)))
                       / {QUANT_LEVELS} AS scale
            FROM embeddings WHERE embedding IS NOT NULL
        ), d AS (
            SELECT vec_id, scale, x,
                   list_transform(x, v -> round(v / scale) * scale) AS rec
            FROM s WHERE scale > 0
        )
        SELECT vec_id,
               ROUND(scale, 6) AS scale,
               ROUND(list_dot_product(x, rec)
                     / (sqrt(list_dot_product(x, x)) * sqrt(list_dot_product(rec, rec))), 6)
                   AS cos_fidelity,
               ROUND(list_sum(list_transform(list_zip(x, rec),
                                             p -> (p[1] - p[2]) * (p[1] - p[2])))
                     / len(x), 9) AS mse
        FROM d
    """


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (deterministic Rademacher matrix)
# ---------------------------------------------------------------------------

RP_IN_DIM = 64   # fixture embedding width (validated per-row; mismatches drop)
RP_OUT_DIM = 8   # projected width: 8× storage/compute reduction


def rp_sign_matrix() -> list[list[float]]:
    """The ±1 Rademacher projection matrix, md5-derived so it is a plain
    literal on BOTH engines (the `minhash_perm_constants` pattern) — no
    RNG state anywhere. Achlioptas 2003: a dense ±1 matrix satisfies the
    JL lemma with the same distortion bound as Gaussian entries."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"rp:{j}:{i}".encode()).digest()[0] & 1 else -1.0
            for i in range(RP_IN_DIM)
        ]
        for j in range(RP_OUT_DIM)
    ]


def ext_embed_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction: 64-d → 8-d via a
    deterministic Rademacher matrix, y_j = Σ_i x_i·s_ji / √m.

    The standard preprocessing step before sketch-heavy stages — SRP-LSH,
    brute-force rerank on narrow vectors, or shipping embeddings at 1/8th
    the bytes. The norm_ratio column is the per-vector JL distortion
    witness (≈ 1 ± ε): the audit a pipeline runs to decide whether the
    narrow representation is safe to serve, exactly like
    `ext_embed_quantize`'s cos_fidelity for int8.

    One narrow map over the scan — 8 fold expressions per row, no
    shuffle, no UDF; the projected coordinates are rounded at 6dp and the
    norm ratio is computed FROM the rounded coordinates so both engines
    square identical inputs in an identical left-to-right sum.
    """
    emb = tables.load(spark, sf_dir, "embeddings", fan=True)
    base = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") == RP_IN_DIM)
    ).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    signs = rp_sign_matrix()
    # optimization round 13 (guide §7.3, driver time): the 8 fold columns
    # each carried a 64-literal sign array — ~500 py4j round-trips (~0.7 s)
    # per invocation when built as Column objects. Each is now ONE `F.expr`
    # parse of the identical tree (`D` suffixes keep every literal a
    # double, exactly what `F.lit(float)` produced); values pinned equal to
    # the Column form by test_embed_project_expr_matches_column_form.
    sqrt_m_sql = f"sqrt({float(RP_OUT_DIM)}D)"
    proj_cols = []
    for j in range(RP_OUT_DIM):
        srow = ", ".join(f"{s}D" for s in signs[j])
        proj_cols.append(
            F.expr(
                f"round(aggregate(zip_with(x, array({srow}), (a, b) -> a * b), "
                f"0.0D, (acc, v) -> acc + v) / {sqrt_m_sql}, 6)"
            ).alias(f"p{j}")
        )
    out = base.select(
        "vec_id",
        F.expr(
            "sqrt(aggregate(transform(x, v -> v * v), 0.0D, (acc, v) -> acc + v))"
        ).alias("norm_x"),
        *proj_cols,
    )
    ysq = " + ".join(f"p{j} * p{j}" for j in range(RP_OUT_DIM))
    return out.select(
        "vec_id",
        *[f"p{j}" for j in range(RP_OUT_DIM)],
        F.expr(
            f"CASE WHEN norm_x > 0 THEN round(sqrt({ysq}) / norm_x, 6) END"
        ).alias("norm_ratio"),
    )


def ext_embed_project_oracle() -> str:
    signs = rp_sign_matrix()
    proj = ", ".join(
        "ROUND(list_reduce(list_prepend(0.0, list_transform(list_zip(x, "
        f"[{', '.join(str(s) for s in signs[j])}]), p -> p[1] * p[2])), "
        f"(acc, v) -> acc + v) / sqrt({float(RP_OUT_DIM)}), 6) AS p{j}"
        for j in range(RP_OUT_DIM)
    )
    ysq = " + ".join(f"p{j} * p{j}" for j in range(RP_OUT_DIM))
    return f"""
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS x
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(embedding) = {RP_IN_DIM}
        ),
        pr AS (
            SELECT vec_id,
                   sqrt(list_reduce(list_prepend(0.0,
                        list_transform(x, v -> v * v)), (acc, v) -> acc + v))
                       AS norm_x,
                   {proj}
            FROM base
        )
        SELECT vec_id, {', '.join(f'p{j}' for j in range(RP_OUT_DIM))},
               CASE WHEN norm_x > 0
                    THEN ROUND(sqrt({ysq}) / norm_x, 6)
               END AS norm_ratio
        FROM pr
    """


# ---------------------------------------------------------------------------
# product-quantization ANN (ADC scoring + exact re-rank)
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_KS = 16        # centroids per subspace
PQ_TRAIN = 2048   # bounded training sample (constant-size driver state)
PQ_ITERS = 8      # Lloyd iterations
PQ_RERANK = 100   # ADC shortlist size for exact re-ranking


def _pq_codebooks(spark: SparkSession, sf_dir: str):
    """Train PQ codebooks on a BOUNDED deterministic sample (hash-ordered
    limit — the standard reservoir recipe: codebook quality needs only a
    constant-size sample regardless of corpus size, so this driver state is
    O(M·Ks·dim), never O(corpus)). Vectors are L2-normalized first so ADC
    inner products are cosines. Deterministic throughout: hash-ordered
    sample, evenly-spaced init, fixed Lloyd iteration count — no RNG.

    Cached per (application, sf_dir) like `_kmeans_fit`: the codebooks are
    the index's model artifact — trained once when the index is built,
    served by every query."""
    import numpy as np

    from ..sources.layouts import dataset_cache_get

    return dataset_cache_get(
        _KMEANS_FIT_CACHE,
        spark,
        sf_dir,
        "embeddings",
        lambda: _pq_codebooks_build(spark, sf_dir),
        tag="pq",
    )


def _pq_codebooks_build(spark: SparkSession, sf_dir: str):
    import numpy as np

    emb = tables.load(spark, sf_dir, "embeddings")
    hash_key = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    rows = (
        emb.where(F.col("embedding").isNotNull())
        .orderBy(hash_key, "vec_id")
        .limit(PQ_TRAIN)
        .select("embedding")
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.maximum(norms, 1e-12)
    dim = X.shape[1]
    sub = dim // PQ_M
    books = np.empty((PQ_M, PQ_KS, sub))
    for m in range(PQ_M):
        Xm = X[:, m * sub : (m + 1) * sub]
        # exact integer arithmetic — linspace's float stepping can land
        # 1 ulp below an exact integer and truncate to index-1 for some n,
        # silently desynchronizing the oracle, which shares this closed form
        init_idx = [((len(Xm) - 1) * k) // (PQ_KS - 1) for k in range(PQ_KS)]
        C = Xm[init_idx].copy()
        # 6dp rounding of assignment distances and centroid means per
        # iteration: the same engine-determinism contract as _kmeans_fit —
        # summation-order drift vanishes under the rounding grain, so a
        # DuckDB recursive CTE re-derives byte-identical codebooks
        for _ in range(PQ_ITERS):
            d2 = np.round(((Xm[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
            assign = d2.argmin(axis=1)
            for k in range(PQ_KS):
                members = Xm[assign == k]
                if len(members):
                    C[k] = np.round(members.mean(axis=0), 6)
        books[m] = C
    return books


def ext_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via product quantization with asymmetric-distance scoring —
    the FAISS-style memory-bound scale path: each (normalized) vector
    compresses to M=8 one-byte codes, a query builds an M×Ks lookup table
    of partial inner products, and scoring any vector is M table lookups
    instead of a D-dim dot product (8 adds vs 64 mults — and 8 bytes vs
    256: the whole 100 TB corpus's codes fit a few TB of RAM).

    Plan: encoding is one Arrow-batched UDF pass (write-time cost in a real
    deployment, like the IVF layout); ADC scoring is NATIVE — the lookup
    tables become literal arrays and the score is a codegen'd chain of
    element_at adds; shortlist by score (single bounded window), exact
    cosine re-rank on PQ_RERANK survivors only. Oracle-backed (round 3);
    recall vs brute force asserted in tests.
    """
    emb = tables.load(spark, sf_dir, "embeddings", fan=True)
    cand = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "label", "embedding")
    )
    return _pq_adc_topk(spark, sf_dir, cand, PQ_RERANK)


def _pq_adc_topk(
    spark: SparkSession, sf_dir: str, cand: DataFrame, rerank: int
) -> DataFrame:
    """Shared PQ serve tail (used by ``ext_ann_pq_topk`` over the full
    corpus and ``ext_ann_ivfpq_topk`` over the IVF-probed lists): encode
    ``cand`` (vec_id, label, embedding) with the trained codebooks, ADC-score
    natively against the query's lookup tables, shortlist ``rerank`` rows,
    exact rounded-cosine re-rank."""
    import numpy as np

    books = _pq_codebooks(spark, sf_dir)
    q_vec = query_vector(spark, sf_dir)
    q_unit = q_vec / np.linalg.norm(q_vec)
    dim = len(q_vec)
    sub = dim // PQ_M
    # ADC lookup tables: T[m][k] = <q_m, C[m][k]>
    T = np.stack(
        [books[m] @ q_unit[m * sub : (m + 1) * sub] for m in range(PQ_M)]
    )

    books_b = books  # closed over by value (pickled into the UDF)

    @F.pandas_udf("array<int>")
    def encode(emb_s: pd.Series) -> pd.Series:
        X = np.array([np.asarray(e, dtype=np.float64) for e in emb_s])
        if X.size == 0:
            return pd.Series([], dtype=object)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), PQ_M), dtype=np.int32)
        for m in range(PQ_M):
            Xm = X[:, m * sub : (m + 1) * sub]
            # rounded-before-argmin: same cross-engine contract as training
            d2 = np.round(
                ((Xm[:, None, :] - books_b[m][None, :, :]) ** 2).sum(axis=2), 6
            )
            codes[:, m] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    coded = cand.select(
        "vec_id", "label", "embedding", encode("embedding").alias("codes")
    )
    # native ADC: per-subspace literal lookup arrays, element_at chain
    score = None
    for m in range(PQ_M):
        tbl = F.array(*[F.lit(float(v)) for v in T[m]])
        term = F.element_at(tbl, F.element_at("codes", m + 1) + 1)
        score = term if score is None else score + term
    # adc rounded to 6dp before ranking: the lookup-table entries are
    # engine-computed dots (~1e-14 cross-engine drift); rounding makes the
    # shortlist ordering deterministic (ties -> vec_id asc)
    shortlist = (
        coded.withColumn("adc", F.round(score, 6))
        .withColumn(
            "adc_rank",
            F.row_number().over(
                Window.orderBy(F.col("adc").desc(), F.col("vec_id").asc())
            ),
        )
        .where(F.col("adc_rank") <= rerank)
    )
    qdf = spark.createDataFrame(
        [(q_vec.tolist(), float(np.linalg.norm(q_vec)))],
        "q_emb: array<double>, q_norm: double",
    )
    exact = _with_norm(shortlist.select("vec_id", "label", "embedding")).crossJoin(
        F.broadcast(qdf)
    )
    scored = exact.select(
        "vec_id",
        "label",
        F.round(
            _cosine("embedding", F.col("q_emb"), F.col("norm"), F.col("q_norm")), 6
        ).alias("cosine"),
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select("rank", "vec_id", "label", "cosine")
    )


def _sql_pq_chain(corpus_pred: str, rerank: int) -> str:
    """The PQ oracle CTE chain (hash-ordered bounded sample -> per-subspace
    Lloyd codebooks via recursive CTE -> candidate encode -> ADC scores ->
    ``shortlist``), shared by ``ext_ann_pq_topk_oracle`` (full corpus) and
    ``ext_ann_ivfpq_topk_oracle`` (corpus restricted to the IVF probe set
    via ``corpus_pred``). Caller prefixes ``WITH RECURSIVE`` and appends
    the rerank tail."""
    # sub = 8 BAKED (dim 64 / PQ_M 8) — same fixture-dim contract as the
    # SRP oracle, pinned by tests/test_similarity.py
    m_, ks, iters, sub, train, qid = (
        PQ_M, PQ_KS, PQ_ITERS, 8, PQ_TRAIN, QUERY_VEC_ID
    )
    dist = ("ROUND(list_reduce(list_transform(list_zip(xm, book_in[k]), "
            "p -> (p[1]-p[2])*(p[1]-p[2])), (acc,v) -> acc+v), 6)")
    norm = ("GREATEST(sqrt(list_reduce(list_transform(embedding::DOUBLE[], "
            "w -> w*w), (a,b) -> a+b)), 1e-12)")
    return f"""sample AS (
            SELECT row_number() OVER (ORDER BY hkey, vec_id) AS rid, xn
            FROM (
                SELECT vec_id,
                       CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hkey,
                       list_transform(embedding::DOUBLE[], v -> v / {norm}) AS xn
                FROM embeddings WHERE embedding IS NOT NULL
                ORDER BY hkey, vec_id LIMIT {train}
            )
        ),
        subsamp AS (
            SELECT m.m, s.rid, s.xn[m.m * {sub} + 1 : m.m * {sub} + {sub}] AS xm
            FROM sample s, generate_series(0, {m_ - 1}) m(m)
        ),
        n_s AS (SELECT COUNT(*) AS n FROM sample),
        init AS (
            SELECT m, list(xm ORDER BY k) AS book
            FROM (
                SELECT ss.m, g.k, ss.xm
                FROM generate_series(0, {ks - 1}) g(k), n_s
                JOIN subsamp ss
                  ON ss.rid = ((n_s.n - 1) * g.k) // {ks - 1} + 1
            ) GROUP BY m
        ),
        train AS (
            SELECT m, 0 AS iter, book FROM init
            UNION ALL
            SELECT t.m, t.iter + 1, nxt.book
            FROM train t, LATERAL (
                SELECT list(COALESCE(n2.c, t.book[g.k + 1]) ORDER BY g.k) AS book
                FROM generate_series(0, {ks - 1}) g(k)
                LEFT JOIN (
                    SELECT cl, list(mv ORDER BY d) AS c
                    FROM (
                        SELECT cl, d, ROUND(AVG(v), 6) AS mv
                        FROM (
                            SELECT cl, unnest(xm) AS v,
                                   generate_subscripts(xm, 1) AS d
                            FROM (
                                SELECT xm, list_position(dl, list_min(dl)) - 1 AS cl
                                FROM (
                                    SELECT xm,
                                           [{dist} for k in generate_series(1, {ks})] AS dl
                                    FROM (SELECT ss.xm AS xm, t.book AS book_in
                                          FROM subsamp ss WHERE ss.m = t.m)
                                )
                            )
                        ) GROUP BY cl, d
                    ) GROUP BY cl
                ) n2 ON n2.cl = g.k
            ) nxt
            WHERE t.iter < {iters}
        ),
        books AS (SELECT m, book FROM train WHERE iter = {iters}),
        qn AS (
            SELECT list_transform(embedding::DOUBLE[], v -> v / {norm}) AS q
            FROM embeddings WHERE vec_id = {qid}
        ),
        corpus AS (
            SELECT vec_id, label, embedding,
                   list_transform(embedding::DOUBLE[], v -> v / {norm}) AS xn
            FROM embeddings
            WHERE vec_id != {qid} AND embedding IS NOT NULL {corpus_pred}
        ),
        corpus_sub AS (
            SELECT c.vec_id, b.m, c.xn[b.m * {sub} + 1 : b.m * {sub} + {sub}] AS xm,
                   b.book AS book_in
            FROM corpus c, books b
        ),
        codes AS (
            SELECT vec_id, m, list_position(dl, list_min(dl)) AS code1
            FROM (SELECT vec_id, m, [{dist} for k in generate_series(1, {ks})] AS dl
                  FROM corpus_sub)
        ),
        adc AS (
            SELECT cd.vec_id, ROUND(SUM(
                       list_dot_product(q.q[cd.m * {sub} + 1 : cd.m * {sub} + {sub}],
                                        b.book[cd.code1])), 6) AS adc
            FROM codes cd JOIN books b USING (m), qn q
            GROUP BY cd.vec_id
        ),
        shortlist AS (
            SELECT vec_id FROM (
                SELECT vec_id, row_number() OVER (ORDER BY adc DESC, vec_id ASC) AS rk
                FROM adc
            ) WHERE rk <= {rerank}
        )"""


def ext_ann_pq_topk_oracle() -> str:
    """DuckDB re-derivation of the full PQ pipeline: hash-ordered bounded
    sample -> per-subspace Lloyd codebooks (recursive CTE, one lockstep
    row per subspace, 6dp-rounded distances and means) -> corpus encode
    (rounded argmin) -> ADC scores (rounded before ranking) -> exact
    re-rank of the shortlist."""
    return f"""
        WITH RECURSIVE {_sql_pq_chain("", PQ_RERANK)},
        {_sql_rerank_topk("shortlist")}
    """


IVFPQ_RERANK = 50  # ADC shortlist within the probed lists (≤ PQ_RERANK:
                   # the coarse quantizer already pruned ~3/4 of the corpus)


def ext_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the real 100 TB ANN serve shape (the FAISS
    IVFPQ index, as storage + plan properties): the coarse quantizer prunes
    the scan to the query's IVF_NPROBE list PARTITIONS (directory-level
    pruning via the write-time layout, `sources/layouts.write_ivf_layout`),
    PQ ADC scores only the survivors (M table lookups per vector — the
    memory-bound fast scan), and the exact re-rank touches IVFPQ_RERANK
    rows. Per-query cost at scale: (nprobe/nlist)·corpus code reads + a
    constant re-rank — no full-corpus stage anywhere.

    Both stages are engine-deterministic (6dp-rounded IVF assignment;
    6dp-rounded PQ training/encode/ADC), so the full oracle is the
    composition of the two existing CTE programs
    (`ext_ann_ivfpq_topk_oracle`). Partition pruning plan-gated and recall
    vs brute force asserted in tests/test_similarity.py.
    """
    from ..sources import layouts

    path = ensure_ivf_layout(spark, sf_dir)
    probe = layouts.ivf_probe_lists(spark, sf_dir)
    cand = (
        layouts.read_ivf_probe(spark, path, probe)
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "label", "embedding")
    )
    return _pq_adc_topk(spark, sf_dir, cand, IVFPQ_RERANK)


def ext_ann_ivfpq_topk_oracle() -> str:
    """Composition of the IVF candidate CTEs (deterministic centroids,
    6dp-rounded assignment, nprobe nearest lists) with the PQ chain
    (codebooks -> encode -> ADC -> shortlist) restricted to the probed
    lists, then the shared exact re-rank tail."""
    nl, npb, qid = IVF_NLIST, IVF_NPROBE, QUERY_VEC_ID
    cos = """ROUND(list_dot_product(e.embedding::DOUBLE[], c.cvec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"""
    ivf_head = f"""cent AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
            FROM embeddings WHERE vec_id < {nl}
        ),
        csims AS (
            SELECT e.vec_id, c.cid, {cos} AS sim
            FROM embeddings e CROSS JOIN cent c
        ),
        cassign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, cid ASC) AS rk
                FROM csims
            ) WHERE rk = 1
        ),
        qprobe AS (
            SELECT cid FROM (
                SELECT cid, row_number() OVER (ORDER BY sim DESC, cid ASC) AS rk
                FROM csims WHERE vec_id = {qid}
            ) WHERE rk <= {npb}
        ),
        ivfcand AS (
            SELECT a.vec_id FROM cassign a JOIN qprobe USING (cid)
            WHERE a.vec_id != {qid}
        )"""
    pred = "AND vec_id IN (SELECT vec_id FROM ivfcand)"
    return f"""
        WITH RECURSIVE {ivf_head},
        {_sql_pq_chain(pred, IVFPQ_RERANK)},
        {_sql_rerank_topk("shortlist")}
    """


# ---------------------------------------------------------------------------
# distributed k-means (the iterative-DataFrame-algorithm pattern)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5


_KMEANS_ASSIGN_UDF = None


def _kmeans_assign():
    """Arrow-batched assign kernel: one (rows × K) numpy distance computation
    per batch → (cluster, sqdist). Centroids arrive as a LITERAL ARRAY
    COLUMN rather than a closure: Spark pays a multi-second warmup per
    DISTINCT pickled UDF (measured 2.4 s), so a closure-over-C kernel
    re-pays it every Lloyd iteration — ONE shared UDF with per-iteration
    literals runs iterations at ~0.6 s. numpy argmin takes the LOWEST index
    on ties, the deterministic tie-break the recipe specifies. Created
    lazily (module import must not require an active SparkSession — the
    DDL return type parses through the JVM) and cached for the worker-reuse
    win above."""
    global _KMEANS_ASSIGN_UDF
    if _KMEANS_ASSIGN_UDF is not None:
        return _KMEANS_ASSIGN_UDF

    @F.pandas_udf("struct<cluster:int, sqdist:double>")
    def assign(emb_s: pd.Series, c_s: pd.Series) -> pd.DataFrame:
        import numpy as np
        import pandas as pd

        X = np.array([np.asarray(e, dtype=np.float64) for e in emb_s])
        if X.size == 0:
            return pd.DataFrame({"cluster": [], "sqdist": []})
        C = np.asarray(c_s.iloc[0], dtype=np.float64).reshape(KMEANS_K, -1)
        # 6dp rounding BEFORE the argmin makes the assignment identical
        # under any float summation order — the cross-engine determinism
        # that lets the fit carry an exact recursive-CTE oracle
        d2 = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
        cl = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": cl.astype("int32"), "sqdist": d2[np.arange(len(cl)), cl]}
        )

    _KMEANS_ASSIGN_UDF = assign
    return assign


def _centroid_col(C_arr):
    # ONE array Literal node, not F.array over K×dim F.lit nodes: the
    # 512-node expression tree costs ~0.4 s of analysis/codegen per
    # iteration (measured; 5 iters 5.4 s → 3.4 s with the single literal)
    import numpy as np

    return F.lit([float(v) for v in np.asarray(C_arr).flatten()])


_KMEANS_PARTIALS_FN = None


def _kmeans_partials():
    """Shared mapInPandas kernel fusing assign + per-partition partial sums.

    Same shared-kernel discipline as `_kmeans_assign` (centroids arrive in
    the ``c`` literal column, the function object is created once so its
    pickle — and Spark's per-distinct-UDF warmup — is paid once across all
    Lloyd iterations). Emits ≤ K rows per partition: (cluster, count,
    elementwise sum vector)."""
    global _KMEANS_PARTIALS_FN
    if _KMEANS_PARTIALS_FN is not None:
        return _KMEANS_PARTIALS_FN

    def partials(batches):
        import numpy as np
        import pandas as pd

        sums: dict[int, object] = {}
        counts: dict[int, int] = {}
        C = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if C is None:
                C = np.asarray(pdf["c"].iloc[0], dtype=np.float64).reshape(
                    KMEANS_K, -1
                )
            X = np.array([np.asarray(e, dtype=np.float64) for e in pdf["x"]])
            # same 6dp-rounded assignment as _kmeans_assign (oracle contract)
            d2 = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
            cl = d2.argmin(axis=1)
            for k in np.unique(cl):
                m = cl == k
                counts[k] = counts.get(k, 0) + int(m.sum())
                prev = sums.get(k)
                s = X[m].sum(axis=0)
                sums[k] = s if prev is None else prev + s
        ks = sorted(counts)
        if not ks:
            # EMPTY partition: yield nothing. Yielding a zero-row frame
            # here crashes Arrow — pandas types the empty "s" column
            # float64, which has no list<double> conversion
            # (ArrowNotImplementedError). Never hit at the fixture sizes
            # (one parquet split, all partitions non-empty); found by
            # scaling.py's 10x run, where the bigger scan produces empty
            # splits.
            return
        yield pd.DataFrame(
            {
                "cluster": pd.array(ks, dtype="int32"),
                "n": [counts[k] for k in ks],
                "s": [sums[k].tolist() for k in ks],
            }
        )

    _KMEANS_PARTIALS_FN = partials
    return partials


_KMEANS_FIT_CACHE: dict = {}


def _kmeans_fit(spark: SparkSession, sf_dir: str):
    """Run KMEANS_ITERS Lloyd iterations; return (base frame, centroids).

    Deterministic: init = lowest-vec_id points, fixed iteration count.
    Each iteration is one distributed assign (narrow map against broadcast
    literal centroids) + one K-group aggregation whose K×(dim+1) result is
    the ONLY thing the driver ever holds.

    The fitted model is cached per (application, sf_dir) — same rationale
    as the CDC message-log cache: three operators (cluster report, label
    assignments, SemDeDup prune) SERVE the same trained model, and a
    deployment trains once and serves many; re-running Lloyd per query
    would measure training three times and serving once. First call pays
    the full fit.
    """
    from ..sources.layouts import dataset_cache_get

    return dataset_cache_get(
        _KMEANS_FIT_CACHE,
        spark,
        sf_dir,
        "embeddings",
        lambda: _kmeans_fit_build(spark, sf_dir),
        tag="fit",
    )


def _kmeans_fit_build(spark: SparkSession, sf_dir: str):
    import numpy as np

    # no fan_out: a 5000-row × 64-dim frame fans into 64 micro Arrow
    # batches whose per-task overhead dwarfs the trivial kernel work
    emb = tables.load(spark, sf_dir, "embeddings")
    init = (
        emb.where(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(KMEANS_K)
        .select("embedding")
        .collect()
    )
    C = np.array([r[0] for r in init], dtype=np.float64)
    x = F.transform("embedding", lambda v: v.cast("double"))
    base = emb.where(F.col("embedding").isNotNull()).select("vec_id", x.alias("x"))
    # iterative working set: materialize ONCE so the 5 Lloyd passes read
    # executor-local partitions instead of re-scanning parquet and re-casting
    # per iteration — the same persist-the-training-frame discipline every
    # iterative Spark algorithm uses at scale (lineage also stops growing
    # with the iteration count)
    base = base.localCheckpoint(eager=False)
    for _ in range(KMEANS_ITERS):
        # fused assign + per-partition partial sums in ONE Arrow pass (the
        # treeAggregate shape MLlib's KMeans uses): only ≤ partitions×K
        # (cluster, count, sumvec) rows ever leave the executors. On a
        # 1000-executor run you'd add one groupBy(cluster) combine level
        # before the collect; locally the partial frame is tiny.
        partials = (
            base.withColumn("c", _centroid_col(C))
            .mapInPandas(_kmeans_partials(), "cluster int, n long, s array<double>")
            .collect()
        )
        sums = np.zeros_like(C)
        counts = np.zeros(KMEANS_K)
        for r in partials:
            sums[r["cluster"]] += np.asarray(r["s"])
            counts[r["cluster"]] += r["n"]
        nonzero = counts > 0
        # centroid means rounded to 6dp: the per-iteration state the oracle
        # reproduces exactly (summation-order drift « the rounding grain)
        C[nonzero] = np.round(sums[nonzero] / counts[nonzero, None], 6)
    return base, C


def ext_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embeddings table as an ITERATIVE DataFrame
    algorithm — the pattern every iterative workload (clustering, label
    propagation, PageRank) uses on Spark: per-iteration state that must
    stay driver-sized (K×dim centroids) broadcasts into a distributed
    assign step, and the reduce producing the next state is a K-group
    aggregation over the corpus. The corpus never leaves the executors;
    5 iterations = 5 scans + 5 aggregations, each independently parallel.

    Deterministic assignments (lowest-vec_id init, fixed iterations,
    lowest-id argmin tie-break). Oracle-backed (round 3): squared
    distances AND per-iteration centroid means round to 6dp on both
    engines — summation-order float drift (~1e-12) vanishes under the
    rounding grain, so a DuckDB RECURSIVE CTE carrying the centroid list
    as state (the BPE-oracle pattern) re-derives the identical fit
    (`ext_kmeans_embeddings_oracle`); python-reference equality test on
    the assignments additionally pins the recipe.

    Output: per-cluster size and mean within-cluster squared distance.
    """
    base, C = _kmeans_fit(spark, sf_dir)
    return (
        base.select(_kmeans_assign()("x", _centroid_col(C)).alias("a"))
        .select(F.col("a.cluster").alias("cluster"), F.col("a.sqdist").alias("sqdist"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("sqdist"), 6).alias("mean_sqdist"),
        )
        .orderBy("cluster")
    )


def _kmeans_cte_sql() -> str:
    """Shared RECURSIVE-CTE body re-deriving the Lloyd fit in DuckDB —
    state row carries the K centroid vectors as a list (the BPE-oracle
    pattern); used by both the cluster-report oracle and the SemDeDup
    oracle so fit and consumers can never drift."""
    k, iters = KMEANS_K, KMEANS_ITERS
    dist = ("ROUND(list_reduce(list_transform(list_zip(x, cents_in[k]), "
            "p -> (p[1]-p[2])*(p[1]-p[2])), (acc,v) -> acc+v), 6)")
    return f"""
        emb AS (
            SELECT vec_id, embedding::DOUBLE[] AS x
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        init AS (
            SELECT list(x ORDER BY vec_id) AS cents
            FROM (SELECT vec_id, x FROM emb ORDER BY vec_id LIMIT {k})
        ),
        fit AS (
            SELECT 0 AS iter, cents FROM init
            UNION ALL
            SELECT f.iter + 1, nxt.cents
            FROM fit f, LATERAL (
                SELECT list(COALESCE(n.c, f.cents[g.k + 1]) ORDER BY g.k) AS cents
                FROM generate_series(0, {k - 1}) g(k)
                LEFT JOIN (
                    SELECT cl, list(mv ORDER BY d) AS c
                    FROM (
                        SELECT cl, d, ROUND(AVG(v), 6) AS mv
                        FROM (
                            SELECT cl, unnest(x) AS v,
                                   generate_subscripts(x, 1) AS d
                            FROM (
                                SELECT x, list_position(dl, list_min(dl)) - 1 AS cl
                                FROM (
                                    SELECT x,
                                           [{dist} for k in generate_series(1, {k})] AS dl
                                    FROM (SELECT e2.x AS x, f.cents AS cents_in
                                          FROM emb e2)
                                )
                            )
                        )
                        GROUP BY cl, d
                    )
                    GROUP BY cl
                ) n ON n.cl = g.k
            ) nxt
            WHERE f.iter < {iters}
        ),
        final AS (SELECT cents FROM fit WHERE iter = {iters}),
        assigned AS (
            SELECT vec_id, list_position(dl, list_min(dl)) - 1 AS cluster,
                   list_min(dl) AS sqdist
            FROM (
                SELECT vec_id, x, [{dist} for k in generate_series(1, {k})] AS dl
                FROM (SELECT e2.vec_id, e2.x, f.cents AS cents_in
                      FROM emb e2, final f)
            )
        )"""


def ext_kmeans_embeddings_oracle() -> str:
    """DuckDB re-derivation of the full Lloyd fit (see `_kmeans_cte_sql`)."""
    return f"""
        WITH RECURSIVE {_kmeans_cte_sql()}
        SELECT CAST(cluster AS INTEGER) AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(sqdist), 6) AS mean_sqdist
        FROM assigned GROUP BY cluster
    """


def ext_semdedup_oracle() -> str:
    """SemDeDup oracle: k-means CTE for the assignments, within-cluster
    6dp-rounded pairwise cosines, then the per-cluster greedy keep scan as
    a recursive CTE whose state row carries the kept-id list (all clusters
    advance in lockstep, one rank per recursion step)."""
    thr = SEMDEDUP_THRESHOLD
    return f"""
        WITH RECURSIVE {_kmeans_cte_sql()},
        ranked AS (
            SELECT a.cluster, a.vec_id, e.x,
                   CASE WHEN sqrt(list_reduce(list_transform(e.x, v -> v * v),
                                              (acc, v) -> acc + v)) = 0
                        THEN 1.0
                        ELSE sqrt(list_reduce(list_transform(e.x, v -> v * v),
                                              (acc, v) -> acc + v)) END AS nrm,
                   row_number() OVER (PARTITION BY a.cluster
                                      ORDER BY a.vec_id) AS rn
            FROM assigned a JOIN emb e USING (vec_id)
        ),
        pairs AS (
            SELECT r1.cluster, r1.vec_id AS a, r2.vec_id AS b,
                   ROUND(list_dot_product(r1.x, r2.x) / (r1.nrm * r2.nrm), 6) AS sim
            FROM ranked r1
            JOIN ranked r2 ON r1.cluster = r2.cluster AND r2.vec_id < r1.vec_id
        ),
        greedy AS (
            SELECT cluster, rn, vec_id, TRUE AS keep,
                   CAST(NULL AS DOUBLE) AS max_sim_kept, [vec_id] AS kept_ids
            FROM ranked WHERE rn = 1
            UNION ALL
            SELECT g.cluster, r.rn, r.vec_id,
                   (l.ms IS NULL OR l.ms <= {thr}) AS keep, l.ms,
                   CASE WHEN l.ms IS NULL OR l.ms <= {thr}
                        THEN list_append(g.kept_ids, r.vec_id)
                        ELSE g.kept_ids END
            FROM greedy g
            JOIN ranked r ON r.cluster = g.cluster AND r.rn = g.rn + 1,
            LATERAL (
                SELECT MAX(p.sim) AS ms
                FROM pairs p
                WHERE p.cluster = g.cluster AND p.a = r.vec_id
                  AND list_contains(g.kept_ids, p.b)
            ) l
        )
        SELECT CAST(cluster AS INTEGER) AS cluster, vec_id, keep, max_sim_kept
        FROM greedy
    """


def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster) under the same deterministic recipe — exposed for
    the python-reference equality test."""
    base, C = _kmeans_fit(spark, sf_dir)
    return base.select(
        "vec_id",
        _kmeans_assign()("x", _centroid_col(C)).getField("cluster").alias("cluster"),
    )


def ext_kmeans_assign_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion to ``ext_kmeans_embeddings``: per-cluster
    assignment counts under the DETERMINISTIC INIT centroids (the K
    lowest-vec_id vectors — Lloyd iteration 0), computed with engine-stable
    arithmetic so the driver's exact value-hash gate applies.

    The fitted model stays rows-only (float summation order in the
    centroid means is engine-specific), but the assign step itself — the
    part that serves at corpus scale — is exactly checkable: squared
    distance is a LEFT FOLD over zip(x, c) on both engines (Spark
    ``F.aggregate``, DuckDB ``list_reduce`` — IEEE ops in identical order
    are bit-identical), rounded to 6 dp BEFORE the argmin, ties to the
    lowest cluster id. Plan: broadcast the K-row centroid side, one narrow
    distance map, one per-vec window, one K-group count — no corpus
    shuffle beyond the final K-row aggregate.
    """
    emb = tables.load(spark, sf_dir, "embeddings")
    return _kmeans_init_assign(emb).groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def kmeans_init_centroids(emb: DataFrame) -> DataFrame:
    """(cluster, cvec): the DETERMINISTIC INIT centroids — identical
    derivation to `_kmeans_fit`'s init (review fix): the K lowest NON-NULL
    vec_ids with cluster = rank-1 — `vec_id < K` would silently diverge
    from the fit on non-contiguous ids or null embeddings."""
    x = F.transform("embedding", lambda v: v.cast("double"))
    wc = Window.orderBy("vec_id")
    return (
        emb.where(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(KMEANS_K)
        .select(
            (F.row_number().over(wc) - 1).cast("int").alias("cluster"),
            x.alias("cvec"),
        )
    )


def kmeans_assign_with(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cluster): engine-stable nearest-centroid assignment of any
    embeddings frame against a given (cluster, cvec) frame — broadcast
    K-row centroids, one narrow distance map, 6dp-rounded argmin with
    lowest-cluster tie-break. Batch operators pass the init centroids;
    the streaming drift twin passes the frozen offline frame."""
    x = F.transform("embedding", lambda v: v.cast("double"))
    # same isNotNull filter as the fit's base frame: a null embedding has
    # NULL distance to every centroid and would otherwise land on cluster 0
    # by tie-break luck on both engines
    pts = emb.where(F.col("embedding").isNotNull()).select("vec_id", x.alias("x"))
    sqd = F.round(
        F.aggregate(
            F.zip_with("x", "cvec", lambda a, c: (a - c) * (a - c)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        6,
    )
    scored = pts.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cluster", sqd.alias("sqdist")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sqdist").asc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "cluster")
    )


def _kmeans_init_assign(emb: DataFrame) -> DataFrame:
    """(vec_id, cluster) under the deterministic init centroids — the
    engine-stable assignment shared by `ext_kmeans_assign_counts` and the
    embedding drift monitor (`ext_embed_drift`)."""
    return kmeans_assign_with(emb, kmeans_init_centroids(emb))


def _kmeans_assign_cte_sql() -> str:
    """Shared DuckDB CTE body producing the same (vec_id, cluster) frame."""
    k = KMEANS_K
    return f"""
        cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                   embedding::DOUBLE[] AS cvec
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT {k})
        ), d AS (
            SELECT e.vec_id, c.cluster,
                   ROUND(list_reduce(
                       list_transform(
                           list_zip(e.embedding::DOUBLE[], c.cvec),
                           p -> (p[1] - p[2]) * (p[1] - p[2])
                       ),
                       (acc, v) -> acc + v
                   ), 6) AS sqdist
            FROM embeddings e CROSS JOIN cent c
            WHERE e.embedding IS NOT NULL
        ), r AS (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sqdist ASC, cluster ASC) AS rk
            FROM d
        ), assign AS (
            SELECT vec_id, cluster FROM r WHERE rk = 1
        )"""


def ext_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space population drift per hash split — the embedding-side
    companion to the quality filter's `ext_quality_psi` (round 9): PSI of
    each split's CLUSTER-ASSIGNMENT distribution against the whole-corpus
    distribution, over the K deterministic-init k-means cells. The
    standard "did today's embedding batch move?" reading for a vector
    pipeline: cheap (K-cell histograms, not pairwise distances),
    model-free, and sensitive to modality/source shifts that per-dim
    stats miss. A drifted split invalidates ANN layouts and trained
    filters built on the fit-time geometry.

    Composition: the engine-stable assignment shared with
    `ext_kmeans_assign_counts` (broadcast K centroids, one narrow
    distance map, argmin at 6dp) feeds the SAME PSI core as the text
    monitor (`text.quality_psi_from_binned` — deterministic ln, BIGINT
    nano-unit contributions, smoothed BIGINT counts), with bins = K
    cluster cells and the low-sample gate scaled to 20·K. One corpus
    pass; everything after is splits × K rows. Oracle: the shared
    assignment CTE + the split CASE + the same PSI term program —
    the monitor replays from the programs it composes.
    """
    from .sampling import split_assignment
    from .text import quality_psi_from_binned

    emb = tables.load(spark, sf_dir, "embeddings")
    # two consumers (baseline histogram + per-split bins): materialize once
    assign = _kmeans_init_assign(emb).localCheckpoint(eager=False)
    n = assign.count()
    fit_bin = assign.groupBy(F.col("cluster").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    binned = assign.select(
        split_assignment("vec_id").alias("grp"), F.col("cluster").alias("bin")
    )
    return quality_psi_from_binned(binned, fit_bin, n, bins=KMEANS_K).select(
        F.col("grp").alias("split"), "n", "psi", "drifted", "low_sample"
    )


def ext_embed_drift_oracle() -> str:
    from .sampling import TRAIN_PCT, VAL_PCT, _oracle_key_hash
    from .text import QC_PSI_ALERT, QC_PSI_MIN_PER_BIN, _ln_det_expr

    k = KMEANS_K
    h = _oracle_key_hash("vec_id")
    lnr, z = _ln_det_expr("r_")
    return f"""
        WITH {_kmeans_assign_cte_sql()},
        fit_bin AS (
            SELECT cluster AS bin, CAST(COUNT(*) AS BIGINT) AS a
            FROM assign GROUP BY cluster
        ),
        na AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM assign),
        sbin AS (
            SELECT CASE WHEN {h} % 100 < {TRAIN_PCT} THEN 'train'
                        WHEN {h} % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
                        ELSE 'test' END AS grp,
                   cluster AS bin
            FROM assign
        ),
        grid AS (
            SELECT t.grp, t.nb, gs.bin
            FROM (SELECT grp, CAST(COUNT(*) AS BIGINT) AS nb
                  FROM sbin GROUP BY grp) t
            CROSS JOIN (SELECT CAST(UNNEST(range({k})) AS INTEGER) AS bin) gs
        ),
        terms AS (
            SELECT g.grp, g.nb,
                   CAST(COALESCE(sb.b, 0) + 1 AS DOUBLE)
                       / CAST(g.nb + {k} AS DOUBLE) AS p_,
                   CAST(COALESCE(fb.a, 0) + 1 AS DOUBLE)
                       / CAST(na.v + {k} AS DOUBLE) AS q_,
                   p_ / q_ AS r_,
                   {z} AS z_,
                   z_ * z_ AS z2_,
                   (p_ - q_) * ({lnr}) AS contrib,
                   CAST(ROUND(contrib * 1000000000.0, 0) AS BIGINT) AS cn
            FROM grid g
            CROSS JOIN na
            LEFT JOIN (SELECT grp, bin, CAST(COUNT(*) AS BIGINT) AS b
                       FROM sbin GROUP BY grp, bin) sb
              ON sb.grp = g.grp AND sb.bin = g.bin
            LEFT JOIN fit_bin fb ON fb.bin = g.bin
        )
        SELECT grp AS split, nb AS n,
               ROUND(CAST(SUM(cn) AS DOUBLE) / 1000000000.0, 6) AS psi,
               ROUND(CAST(SUM(cn) AS DOUBLE) / 1000000000.0, 6) > {QC_PSI_ALERT}
                   AS drifted,
               nb < {QC_PSI_MIN_PER_BIN * k} AS low_sample
        FROM terms GROUP BY grp, nb
    """


def ext_kmeans_assign_counts_oracle() -> str:
    return f"""
        WITH {_kmeans_assign_cte_sql()}
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
        FROM assign GROUP BY cluster
    """


MMR_POOL = 20     # candidate pool from the brute-force retrieval stage
MMR_K = 5         # results to select
MMR_LAMBDA = 0.7  # relevance vs diversity trade-off


def ext_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking of the top-``MMR_POOL`` cosine
    candidates for query vec 0 — the diversification stage between retrieval
    and serving (Carbonell & Goldstein 1998): greedily pick
    argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s).

    MMR is inherently sequential (each pick changes the next argmax), so
    like ``reserve_admission_exact`` it ships as a distributed-retrieval +
    bounded-sequential-fold plan: the corpus-sized work (scoring, top-pool
    cut) is the same broadcast-probe narrow map as `ext_topk_similarity`;
    the greedy loop then runs in ONE `applyInPandas` group over the
    pool×pool pair frame — O(MMR_POOL²) rows regardless of corpus size, so
    the sequential stage costs the same at 100 TB as at sf0.001.

    Cross-engine determinism: rel and pairwise sims are rounded to 6 dp
    BEFORE selection on both engines, so the greedy argmax compares
    identical doubles; ties break on vec_id asc. Oracle = RECURSIVE CTE
    carrying the selected-id list.
    """
    import pandas as pd

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings", fan=True))
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    w = Window.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
    cand = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            "norm",
            F.round(
                _cosine("embedding", F.col("q_emb"), F.col("norm"), F.col("q_norm")), 6
            ).alias("rel"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= MMR_POOL)
        .drop("rank")
        # optimization round 13 (guide §2.4): cand feeds both sides of the
        # pool×pool pair build — uncheckpointed, the corpus-sized scoring
        # + top-pool cut ran once per side. The frame is MMR_POOL rows.
        .localCheckpoint(eager=False)
    )
    a = cand.select(
        F.col("vec_id").alias("a"),
        F.col("rel").alias("rel_a"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = cand.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    # SELF-pairs included (join condition True): every candidate reaches the
    # greedy kernel even when the pool has one member and no cross pairs —
    # the kernel ignores a==b rows when computing the diversity penalty
    pairs = (
        a.crossJoin(F.broadcast(b))
        .select(
            "a",
            "rel_a",
            "b",
            F.round(_cosine("ea", F.col("eb"), F.col("na"), F.col("nb")), 6).alias(
                "sim"
            ),
        )
    )

    lam = MMR_LAMBDA

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = dict(zip(pdf["a"], pdf["rel_a"]))
        sim: dict[tuple[int, int], float] = {
            (x, y): s
            for x, y, s in zip(pdf["a"], pdf["b"], pdf["sim"])
            if x != y  # self-sim must not count as a diversity penalty
        }
        remaining = sorted(rel)
        selected: list[int] = []
        out = []
        while remaining and len(selected) < MMR_K:
            best_id, best_score = None, None
            for c in remaining:  # id-asc scan makes ties pick the smaller id
                penalty = max((sim[(c, s)] for s in selected), default=0.0)
                score = lam * rel[c] - (1.0 - lam) * penalty
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            remaining.remove(best_id)
            out.append(
                (len(selected), best_id, round(best_score, 6), rel[best_id])
            )
        return pd.DataFrame(
            out, columns=["mmr_rank", "vec_id", "score", "rel"]
        )

    return (
        pairs.groupBy(F.lit(1).alias("g"))
        .applyInPandas(greedy, "mmr_rank int, vec_id long, score double, rel double")
    )


def ext_mmr_diversify_oracle() -> str:
    lam, pool, k, qid = MMR_LAMBDA, MMR_POOL, MMR_K, QUERY_VEC_ID
    return f"""
        WITH RECURSIVE cand AS (
            SELECT vec_id, embedding, rel FROM (
                SELECT vec_id, embedding, rel,
                       row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS rk
                FROM (
                    SELECT e.vec_id, e.embedding,
                           ROUND(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                    * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS rel
                    FROM embeddings e,
                         (SELECT embedding FROM embeddings WHERE vec_id = {qid}) q
                    WHERE e.vec_id != {qid}
                )
            ) WHERE rk <= {pool}
        ),
        pairs AS (
            SELECT x.vec_id AS a, y.vec_id AS b,
                   ROUND(list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))), 6) AS sim
            FROM cand x JOIN cand y ON x.vec_id != y.vec_id
        ),
        sel AS (
            SELECT 1 AS mmr_rank,
                   [p.vec_id] AS ids, p.vec_id AS picked, {lam} * p.rel AS score
            FROM (SELECT vec_id, rel FROM cand
                  ORDER BY {lam} * rel DESC, vec_id ASC LIMIT 1) p
            UNION ALL
            SELECT s.mmr_rank + 1, list_append(s.ids, nxt.vec_id), nxt.vec_id, nxt.score
            FROM sel s, LATERAL (
                SELECT c.vec_id,
                       {lam} * c.rel - (1.0 - {lam}) * COALESCE(
                           (SELECT MAX(p.sim) FROM pairs p
                            WHERE p.a = c.vec_id AND list_contains(s.ids, p.b)), 0.0
                       ) AS score
                FROM cand c
                WHERE NOT list_contains(s.ids, c.vec_id)
                ORDER BY score DESC, c.vec_id ASC
                LIMIT 1
            ) nxt
            WHERE s.mmr_rank < {k}
        )
        SELECT s.mmr_rank, s.picked AS vec_id,
               ROUND(s.score, 6) AS score, c.rel AS rel
        FROM sel s JOIN cand c ON c.vec_id = s.picked
    """


SEMDEDUP_THRESHOLD = 0.45  # within-cluster cosine prune threshold


def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-then-prune semantic dedup, Abbas et al. 2023):
    k-means the embedding space, then inside EACH cluster drop any vector
    whose cosine to an already-kept lower-id vector exceeds the threshold.
    The clustering makes the quadratic step tractable — all-pairs runs per
    cluster (SemDeDup sizes k so clusters stay small), never corpus-wide.

    Plan: the assignments come from the shared deterministic k-means stage;
    one shuffle on ``cluster`` feeds an `applyInPandas` group kernel doing
    the O(c²) normalized-matmul + greedy keep scan. Keep rule is
    deterministic (vec_id asc greedy — a pruned vector never suppresses
    later ones, matching the paper's keep-one-per-duplicate-set intent).
    At 100 TB the skew guard is k itself: grow KMEANS_K with corpus size so
    max cluster stays bounded; the kernel is linear in memory (c×dim).

    Oracle-backed (round 3): the k-means assignments are engine-
    deterministic (see `ext_kmeans_embeddings`), pairwise sims round to
    6dp before the greedy compare, and the per-cluster greedy itself is a
    recursive CTE carrying the kept-id list (the MMR-oracle pattern, all
    clusters advancing in lockstep); python-reference equality test
    additionally pins the recipe.
    """
    import numpy as np
    import pandas as pd

    assign = kmeans_assignments(spark, sf_dir)
    emb = tables.load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    joined = emb.select("vec_id", "embedding").join(assign, "vec_id")

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
        norms = np.sqrt((X * X).sum(axis=1))
        norms[norms == 0] = 1.0
        Xn = X / norms[:, None]
        # 6dp-rounded pairwise sims BEFORE the greedy compare: the
        # normalize-then-matmul float path differs from SQL's
        # dot/(|a||b|) at ~1e-16, and round∘max == max∘round (rounding is
        # monotone), so the keep decisions are engine-identical
        S = np.round(Xn @ Xn.T, 6)
        kept: list[int] = []
        keep_flags, max_sims = [], []
        for i in range(len(pdf)):
            sim = float(S[i, kept].max()) if kept else None
            ok = sim is None or sim <= SEMDEDUP_THRESHOLD
            keep_flags.append(ok)
            max_sims.append(sim)
            if ok:
                kept.append(i)
        return pd.DataFrame(
            {
                "cluster": pdf["cluster"],
                "vec_id": pdf["vec_id"],
                "keep": keep_flags,
                "max_sim_kept": max_sims,
            }
        )

    return joined.groupBy("cluster").applyInPandas(
        prune, "cluster int, vec_id long, keep boolean, max_sim_kept double"
    )
