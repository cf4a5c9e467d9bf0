"""Streaming twins for the corpus / LLM-pipeline operators.

A training-data pipeline is usually fed incrementally (crawl drops, shard
deliveries); the batch operators in ``operators/text.py`` / ``dedup.py``
have streaming forms whose converged state must equal the batch answer over
the same documents. Two twins demonstrate the pattern:

- ``vocab_counts_stream`` — the (lang, token) frequency aggregate as a
  streaming stateful aggregation. State is VOCAB-sized (bounded by the
  language), not corpus-sized, which is what makes a running vocabulary
  count viable on an unbounded crawl.
- ``dedup_exact_stream`` — streaming exact dedup via ``dropDuplicates`` on
  the normalized-text fingerprint: keep-FIRST-arrival semantics. Equals the
  batch survivor (min doc_id) exactly when arrival order is doc_id order —
  the same arrival-order contract (``seq``) the CDC surface builds on.
  State is one row per distinct fingerprint; at 100 TB bound it with a
  watermark on an event-time column (``dedup_within_watermark`` in
  sinks.py is that bounded form).

Stream ≡ batch parity is pinned in tests/test_corpus_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint_col, tokens_col


def vocab_counts_stream(docs_stream: DataFrame) -> DataFrame:
    """Running (lang, token) occurrence counts over a document stream."""
    toks = docs_stream.select("lang", F.explode(tokens_col("text")).alias("token"))
    return toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def dedup_exact_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming exact dedup: first document per normalized-text fingerprint
    survives; later copies (and redeliveries) are dropped statefully."""
    fp = fingerprint_col()
    return docs_stream.select(
        fp.alias("fingerprint"), "doc_id", "lang", "source"
    ).dropDuplicates(["fingerprint"])


def dedup_incremental_stream(docs_stream: DataFrame, standing: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.dedup.ext_dedup_incremental``: arriving
    documents stream-static LEFT JOIN the standing corpus's fingerprint
    index — each micro-batch gets its dedup verdict against yesterday's
    corpus with NO stream state at all (the static side is re-resolved per
    micro-batch, so a nightly-refreshed index is picked up automatically).

    ``standing`` must be the one-row-per-fingerprint frame
    (fingerprint, dup_of) — the same pre-aggregated skew-proof shape the
    batch operator builds; at scale it lives as a bucketed layout so the
    per-batch join is broadcast- or bucket-local.
    """
    fp = fingerprint_col()
    new = docs_stream.select("doc_id", fp.alias("fingerprint"))
    return new.join(standing, "fingerprint", "left").select(
        "doc_id",
        "fingerprint",
        F.col("dup_of").isNotNull().alias("exact_dup"),
        "dup_of",
    )


def percolate_stream(docs_stream: DataFrame, registry: DataFrame) -> DataFrame:
    """Streaming percolation: the standing-query registry (static,
    broadcast) matched against every ARRIVING document — saved-search /
    alerting-rule delivery with ZERO stream state (pure stream-static map;
    a registry update is picked up on the next micro-batch, the same
    static-side re-resolution contract as `dedup_incremental_stream`)."""
    from ..operators.search import percolate

    return percolate(docs_stream, registry)


def quality_score_stream(docs_stream: DataFrame, weights: list[float]) -> DataFrame:
    """Streaming serve of the trained quality filter (train OFFLINE with
    `text.quality_classifier_fit`, score the arriving corpus ONLINE): the
    frozen 5-weight model applies as a stateless narrow map per
    micro-batch — no state store, no watermark, unbounded throughput.
    This is the deployment shape of every learned filter in a crawl
    pipeline: fit on yesterday's snapshot, score today's shards as they
    land, route by `pred` (or weight sampling by `score`) downstream.
    Stream ≡ batch on the same documents is pinned in
    tests/test_corpus_stream.py."""
    from ..operators.text import _qc_features, quality_classifier_score

    return quality_classifier_score(_qc_features(docs_stream), weights)


def quality_gate_stream(
    docs_stream: DataFrame, weights: list[float], threshold: float
) -> DataFrame:
    """Streaming serve of a CHOSEN OPERATING POINT (round 7): train
    offline, select the threshold offline (`text.quality_threshold_select`
    — max kept-fraction subject to a precision target), then gate the
    arriving corpus ONLINE. Still a stateless narrow map per micro-batch;
    the integer-unit compare (score·1e6 ≥ threshold·1e6, both 6dp
    integers) keeps the keep/drop decision exactly the batch selection's
    `score ≥ t` rule, never a float-epsilon different one. The full
    document row passes through with the decision, so downstream stages
    (dedup, sinks) compose in the same streaming query. Stream ≡ batch
    on the same documents is pinned in tests/test_corpus_stream.py."""
    from ..operators.text import _qc_features, quality_score_col

    carry = tuple(c for c in docs_stream.columns if c != "doc_id")
    feats = _qc_features(docs_stream, keep=carry)
    score = quality_score_col(weights)
    su = F.round(score * F.lit(1_000_000.0), 0).cast("long")
    tu = int(round(threshold * 1_000_000))
    return feats.select(
        "doc_id", *carry, score.alias("score"), (su >= F.lit(tu)).alias("keep")
    )


def quality_psi_batch(
    docs_batch: DataFrame,
    weights: list[float],
    fit_bin: DataFrame,
    fit_total: int,
    batch_id: int,
) -> DataFrame:
    """One monitoring reading: score the ARRIVING batch with the frozen
    offline weights, bin on the shared calibration bins, and compute its
    PSI against the broadcast fit-time baseline (`operators.text.
    quality_psi_from_binned` — the identical algebra the batch monitor
    `ext_quality_psi` runs per source). STATELESS: bins recompute per
    batch, the baseline is a B-row broadcast frame, nothing accumulates
    across batches. Output: one (batch_id, n, psi, drifted) row."""
    from ..operators.text import (
        QC_CAL_BINS,
        _qc_features,
        quality_psi_from_binned,
        quality_score_col,
    )

    feats = _qc_features(docs_batch)
    bin_col = F.least(
        F.floor(quality_score_col(weights) * QC_CAL_BINS).cast("int"),
        F.lit(QC_CAL_BINS - 1),
    )
    binned = feats.select(F.lit(int(batch_id)).alias("grp"), bin_col.alias("bin"))
    return quality_psi_from_binned(binned, fit_bin, fit_total).select(
        F.col("grp").cast("long").alias("batch_id"), "n", "psi", "drifted"
    )


def quality_psi_stream(
    docs_stream: DataFrame,
    weights: list[float],
    fit_bin: DataFrame,
    fit_total: int,
    emit,
):
    """The monitoring lambda (the `anomaly_alert_stream` shape, per-batch
    flavor): fit offline, freeze (weights, per-bin baseline counts,
    total), then for every arriving micro-batch hand the stateless PSI
    reading of THAT batch to ``emit(psi_df)`` — a deployment posts it to
    a metrics sink, tests collect it. Returns the ``writeStream`` builder
    (caller picks trigger/checkpoint and starts it). The integer-unit /
    deterministic-ln algebra is shared with the batch monitor, so an
    alert online is exactly the alert the batch audit would raise on the
    same rows — pinned by the stream ≡ batch test."""

    def _each(bdf: DataFrame, bid: int) -> None:
        emit(quality_psi_batch(bdf, weights, fit_bin, fit_total, bid))

    return docs_stream.writeStream.foreachBatch(_each)


def quantile_sketch_update(standing: DataFrame | None, ev_batch: DataFrame) -> DataFrame:
    """One sketch-maintenance step: absorb an arriving events batch into the
    standing bottom-K quantile sketch (``operators.aggregates`` round-8
    family). The batch contributes only its bounded per-partition partials
    (≤ T×K rows per partition), and bottom-K of (sketch ∪ partials) IS the
    sketch of the union — exact mergeability, so the maintained state
    after any number of steps equals the one-shot whole-history sketch."""
    from ..operators.aggregates import _qsk_bottomk, _qsk_partials

    part = _qsk_partials(ev_batch)
    merged = part if standing is None else standing.unionByName(part)
    return _qsk_bottomk(merged)


def quantile_sketch_serve(sketch: DataFrame) -> DataFrame:
    """Serve per-group approximate percentiles from a standing sketch —
    the same estimator/columns as the batch ``ext_approx_quantiles_sketch``
    (interpolated percentile over the ≤ K sampled values, 4dp)."""
    from ..operators.aggregates import QUANTILES

    pcts = F.percentile("value", F.lit(list(QUANTILES)))
    return sketch.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("sketch_k"),
        F.round(pcts[0], 4).alias("p50"),
        F.round(pcts[1], 4).alias("p90"),
        F.round(pcts[2], 4).alias("p99"),
    )


def quantile_sketch_stream(ev_stream: DataFrame, emit, state: dict | None = None):
    """Streaming quantile monitoring — the deployment form of
    ``ext_approx_quantiles_incremental``: the standing bottom-K sketch
    (state = ≤ T×K rows TOTAL, regardless of stream length) absorbs each
    arriving micro-batch's bounded partials and serves updated
    p50/p90/p99 to ``emit(batch_id, pct_df)``. Because bottom-K merge is
    exact (sketch ∪ sketch = the union's sketch), the standing state after
    draining the stream is BIT-EQUAL to the batch sketch over the same
    rows — the strongest stream ≡ batch contract any twin here carries,
    pinned in tests/test_corpus_stream.py. The per-step ``localCheckpoint``
    is load-bearing twice over: it cuts lineage (state would otherwise
    chain every past micro-batch's plan) and it pins the merged rows so
    the next merge reads materialized state, the discipline the graph
    loops established."""
    state = {"sketch": None} if state is None else state

    def _each(bdf: DataFrame, bid: int) -> None:
        sk = quantile_sketch_update(state["sketch"], bdf).localCheckpoint()
        state["sketch"] = sk
        emit(bid, quantile_sketch_serve(sk))

    return ev_stream.writeStream.foreachBatch(_each)


def heavy_hitters_stream(
    docs_stream: DataFrame, emit, k: int | None = None, state: dict | None = None
):
    """Streaming Misra–Gries heavy hitters: per micro-batch, the bounded
    per-partition MG summaries (the batch operator's pass-1 stage,
    ``operators.text._mg_summaries``) collect ≤ (k+1)·partitions rows and
    fold into ONE standing k-counter summary via the mergeable-summaries
    merge (``operators.text.mg_merge``) — state is k counters plus a
    running exact total, regardless of stream length or vocabulary size.

    Per batch, ``emit(batch_id, n_total, counters)`` receives the running
    candidate set with estimate counts. Guarantees that survive arbitrary
    merge sequences (and are pinned by the stream-vs-exact test): every
    token with true frequency > N/(k+1) is present (no false negatives),
    and for every candidate est ≤ true ≤ est + N/(k+1). The batch
    operator's exact pass-2 rescan has no streaming analogue (it would
    re-read history); a deployment runs that rescan offline against the
    emitted candidates — the candidate set is exactly what makes the
    offline pass cheap."""
    from ..operators.text import HH_K

    kk = int(HH_K if k is None else k)
    state = {"counters": {}, "n_total": 0} if state is None else state

    def _each(bdf: DataFrame, bid: int) -> None:
        heavy_hitters_fold(state, bdf, kk)
        emit(bid, state["n_total"], dict(state["counters"]))

    return docs_stream.writeStream.foreachBatch(_each)


def heavy_hitters_fold(state: dict, docs_batch: DataFrame, k: int) -> dict:
    """One MG maintenance step (the per-batch body of
    ``heavy_hitters_stream``, callable from a composed ``foreachBatch``):
    the batch's bounded per-partition summaries merge into the standing
    k-counter state in one m-way step (single truncation — valid and
    tighter than pairwise folding)."""
    from ..operators.text import _mg_summaries, mg_merge

    toks = docs_batch.select(F.explode(tokens_col("text")).alias("token"))
    add: dict[str, int] = {}
    batch_n = 0
    for r in _mg_summaries(toks, k).collect():
        if r["is_total"]:
            batch_n += int(r["cnt"])
        else:
            add[r["token"]] = add.get(r["token"], 0) + int(r["cnt"])
    state["n_total"] += batch_n
    state["counters"] = mg_merge(state["counters"], add, k)
    return state


def freq_sketch_stream(
    docs_stream: DataFrame,
    emit,
    d: int | None = None,
    w: int | None = None,
    state: dict | None = None,
):
    """Streaming Count-Min: each micro-batch's d×w cell table (bounded —
    map-side combined to sketch size before anything shuffles) adds
    CELL-WISE into the standing counter state. CMS merge IS cell-wise
    SUM, so like the bottom-K twin this carries the exact contract: the
    drained state equals the batch sketch over the same documents, row
    for row (pinned in tests/test_corpus_stream.py). State is ≤ d·w rows
    forever; ``emit(batch_id, cells_df)`` hands out the running sketch —
    point-frequency service for ANY key via ``freq_sketch_estimate``
    with no vocabulary-sized state anywhere in the pipeline."""
    from ..operators.text import CMS_D, CMS_W

    dd = int(CMS_D if d is None else d)
    ww = int(CMS_W if w is None else w)
    state = {"cells": None} if state is None else state

    def _each(bdf: DataFrame, bid: int) -> None:
        freq_sketch_fold(state, bdf, dd, ww)
        emit(bid, state["cells"])

    return docs_stream.writeStream.foreachBatch(_each)


def freq_sketch_fold(state: dict, docs_batch: DataFrame, d: int, w: int) -> dict:
    """One CMS maintenance step (the per-batch body of
    ``freq_sketch_stream``, callable from a composed ``foreachBatch``):
    the batch's bounded cell table adds cell-wise into the standing
    counters; eager localCheckpoint pins the ≤ d·w-row state and cuts
    lineage."""
    from ..operators.text import _cms_cells

    toks = docs_batch.select(F.explode(tokens_col("text")).alias("token"))
    batch_cells = _cms_cells(toks, d, w)
    merged = (
        batch_cells
        if state["cells"] is None
        else state["cells"]
        .unionByName(batch_cells)
        .groupBy("j", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    state["cells"] = merged.localCheckpoint()
    return state


def freq_sketch_estimate(
    cells: DataFrame, keys: DataFrame, d: int | None = None, w: int | None = None
) -> DataFrame:
    """Point-frequency estimates for a ``token`` keys frame against a
    standing Count-Min cell table: MIN over the key's d cells, with an
    ABSENT cell counting as zero (a never-inserted key must estimate ≥ 0
    from its emptiest cell, not skip it — ``F.min`` ignores NULLs, so the
    coalesce happens per row, before the MIN)."""
    from ..operators.text import CMS_D, CMS_W, _cms_probes

    dd = int(CMS_D if d is None else d)
    ww = int(CMS_W if w is None else w)
    probed = keys.select("token", F.explode(_cms_probes(dd, ww)).alias("p")).select(
        "token", F.col("p.j").alias("j"), F.col("p.b").alias("b")
    )
    return (
        probed.join(F.broadcast(cells), ["j", "b"], "left")
        .groupBy("token")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("n_est")
        )
    )
