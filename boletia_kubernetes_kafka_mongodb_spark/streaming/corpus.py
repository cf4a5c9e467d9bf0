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
