"""Crafted-semantics tests for search/relevance and association operators.

Oracle parity at sf0.01 is covered by test_oracle_parity; these pin the
*semantics* on hand-built inputs where the right answer is computable by
hand (ranking order, idf direction, length normalization, lift algebra).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark.operators import search
from boletia_kubernetes_kafka_mongodb_spark.operators.aggregates import (
    ZSCORE_THRESHOLD,
    agg_anomaly_zscore,
    ext_cooccurrence,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _run_on(monkeypatch, frame_by_name, fn, spark):
    """Run an operator with tables.load patched to crafted frames."""
    from boletia_kubernetes_kafka_mongodb_spark import tables

    def fake_load(_spark, _sf, name, fan=False):
        return frame_by_name[name]

    monkeypatch.setattr(tables, "load", fake_load)
    return fn(spark, "unused")


def test_bm25_ranking_and_length_norm(spark, monkeypatch):
    # doc0: both terms; doc1: one term; doc2: one term but much longer
    # (length-normalized down); doc3: no terms (excluded by bm25 > 0)
    docs = _docs(
        spark,
        [
            "spark shuffle alpha beta",
            "spark alpha beta gamma",
            "spark " + " ".join(f"pad{i}" for i in range(40)),
            "alpha beta gamma delta",
        ],
    )
    out = _run_on(
        monkeypatch, {"documents": docs}, search.ext_bm25_search, spark
    ).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 0, "two-term doc must rank first"
    assert 3 not in ids, "zero-hit doc must be excluded"
    scores = {r.doc_id: r.bm25 for r in out}
    assert scores[1] > scores[2], "same tf, longer doc scores lower"
    assert all(r.bm25 > 0 for r in out)


def test_bm25_idf_is_nonnegative_even_for_common_terms(spark, monkeypatch):
    # 'spark' in every doc: Lucene idf ln(1 + (N-df+.5)/(df+.5)) stays > 0
    docs = _docs(spark, ["spark a", "spark b", "spark c"])
    out = _run_on(
        monkeypatch, {"documents": docs}, search.ext_bm25_search, spark
    ).collect()
    assert len(out) == 3
    assert all(r.bm25 > 0 for r in out)


def test_tfidf_rare_term_beats_common_term(spark, monkeypatch):
    # 'common' appears in all docs, 'rare' only in doc0, both tf=1 in doc0
    docs = _docs(
        spark,
        ["common rare", "common x", "common y", "common z"],
    )
    out = _run_on(
        monkeypatch, {"documents": docs}, search.ext_tfidf_terms, spark
    )
    top_doc0 = [r.token for r in out.where("doc_id = 0").orderBy("rank").collect()]
    assert top_doc0[0] == "rare"
    # sklearn smooth idf: tf * (ln((1+N)/(1+df)) + 1)
    expected = 1.0 * (math.log(5.0 / 2.0) + 1.0)
    got = out.where("doc_id = 0 and token = 'rare'").collect()[0].tfidf
    assert got == pytest.approx(expected, abs=1e-6)


def test_tfidf_rank_is_dense_per_doc_and_capped(spark, monkeypatch):
    docs = _docs(spark, ["a b c d e f", "a a b"])
    out = _run_on(
        monkeypatch, {"documents": docs}, search.ext_tfidf_terms, spark
    )
    per_doc = (
        out.groupBy("doc_id").agg(F.collect_list("rank").alias("ranks")).collect()
    )
    for r in per_doc:
        assert sorted(r.ranks) == list(range(1, len(r.ranks) + 1))
        assert len(r.ranks) <= search.TFIDF_TOPK


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def test_anomaly_zscore_flags_spike_day(spark, monkeypatch):
    import datetime as dt

    rows, eid = [], 0
    # 10 quiet days with 2 events, one spike day with 40
    for d in range(10):
        for _ in range(2):
            rows.append((eid, dt.datetime(2024, 1, 1 + d), 1, "click", 1.0, "{}"))
            eid += 1
    for _ in range(40):
        rows.append((eid, dt.datetime(2024, 1, 11), 1, "click", 1.0, "{}"))
        eid += 1
    out = _run_on(
        monkeypatch, {"events": _events(spark, rows)}, agg_anomaly_zscore, spark
    ).collect()
    flagged = [r for r in out if r.is_anomaly]
    assert [r.day.isoformat() for r in flagged] == ["2024-01-11"]
    assert flagged[0].zscore > ZSCORE_THRESHOLD


def test_anomaly_zscore_zero_variance_is_null_not_flagged(spark, monkeypatch):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "steady", 1.0, "{}") for i in range(5)
    ]
    out = _run_on(
        monkeypatch, {"events": _events(spark, rows)}, agg_anomaly_zscore, spark
    ).collect()
    assert all(r.zscore is None for r in out)
    assert not any(r.is_anomaly for r in out)


def test_cooccurrence_lift_algebra(spark, monkeypatch):
    import datetime as dt

    # 4 users: u0 {a,b}, u1 {a,b}, u2 {a}, u3 {b}  (duplicates of (user,type)
    # must collapse before pairing)
    spec = [(0, "a"), (0, "b"), (0, "b"), (1, "a"), (1, "b"), (2, "a"), (3, "b")]
    rows = [
        (i, dt.datetime(2024, 1, 1), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(spec)
    ]
    out = _run_on(
        monkeypatch, {"events": _events(spark, rows)}, ext_cooccurrence, spark
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b, r.n_both) == ("a", "b", 2)
    # lift = N * c_ab / (c_a * c_b) = 4*2/(3*3)
    assert r.lift == pytest.approx(8.0 / 9.0, abs=1e-6)
    assert r.pmi == pytest.approx(math.log(8.0 / 9.0), abs=1e-6)
