"""JSONL corpus source/sink (sources/jsonl.py): round-trip fidelity,
corrupt-line quarantine (never silent drops), schema evolution."""

from __future__ import annotations

import os

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.sources import jsonl

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_preserves_documents(spark, tmp_path):
    """parquet documents → JSONL → read back: identical rows, zero
    quarantine (a lossless interchange hop)."""
    docs = tables.load(spark, SF, "documents")
    path = str(tmp_path / "corpus_jsonl")
    jsonl.write_jsonl_corpus(docs, path)
    good, quarantine = jsonl.read_jsonl_corpus(spark, path)
    assert quarantine.count() == 0
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, good.select(*docs.columns).collect()))
    assert a == b


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    """Malformed lines land in the quarantine frame with their source
    file; well-formed neighbors still parse; blank lines are skipped
    entirely (the spec's only non-record line)."""
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "good one", "lang": "en", "source": "s", "n_chars": 8}\n'
        "this is not json at all\n"
        "\n"
        '{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}\n'
        '[1, 2, 3]\n'
        '{"doc_id": 3, "text": "trailing", "lang"\n'
    )
    good, quarantine = jsonl.read_jsonl_corpus(spark, str(p))
    rows = {r.doc_id: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].text == "good one" and rows[2].n_chars == 9
    q = quarantine.collect()
    assert len(q) == 3  # bad text, JSON array, truncated object — no drops
    assert {r.line for r in q} == {
        "this is not json at all",
        "[1, 2, 3]",
        '{"doc_id": 3, "text": "trailing", "lang"',
    }
    assert all(os.path.basename(r.file).startswith("part-0") for r in q)


def test_jsonl_schema_evolution_missing_and_extra_fields(spark, tmp_path):
    """The JSONL evolution convention: missing fields → NULL, unknown
    fields → ignored; neither is corrupt."""
    p = tmp_path / "drift"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 7, "text": "no lang field"}\n'
        '{"doc_id": 8, "text": "extra", "lang": "en", "source": "s",'
        ' "n_chars": 5, "brand_new_field": true}\n'
    )
    good, quarantine = jsonl.read_jsonl_corpus(spark, str(p))
    assert quarantine.count() == 0
    rows = {r.doc_id: r for r in good.collect()}
    assert rows[7].lang is None and rows[7].text == "no lang field"
    assert rows[8].lang == "en" and "brand_new_field" not in good.columns


def test_jsonl_streaming_ingest_parses_and_quarantines(spark, tmp_path):
    """Streaming twin: the same split over a file stream — parsed docs and
    quarantined lines both arrive through availableNow micro-batches."""
    p = tmp_path / "stream_in"
    p.mkdir()
    (p / "shard-0.jsonl").write_text(
        '{"doc_id": 1, "text": "a", "lang": "en", "source": "s", "n_chars": 1}\n'
        "garbage line\n"
    )
    (p / "shard-1.jsonl").write_text(
        '{"doc_id": 2, "text": "b", "lang": "en", "source": "s", "n_chars": 1}\n'
    )
    good, quarantine = jsonl.read_jsonl_corpus_stream(spark, str(p))
    q1 = (
        good.writeStream.format("memory").queryName("jsonl_good")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True).start()
    )
    q2 = (
        quarantine.writeStream.format("memory").queryName("jsonl_quar")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    assert {r.doc_id for r in spark.sql("select * from jsonl_good").collect()} == {1, 2}
    quar = spark.sql("select * from jsonl_quar").collect()
    assert [r.line for r in quar] == ["garbage line"]


def test_jsonl_type_coerced_fields_quarantined(spark, tmp_path):
    """A well-formed object line whose field value cannot take the
    schema's type (``"doc_id": "abc"`` under ``doc_id long``) is corrupt
    evidence, not a partially-null document — it must land in quarantine
    (round-5 ADVICE). Explicit JSON ``null`` and an absent key remain
    legitimate gaps and still parse."""
    p = tmp_path / "coerced"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}\n'
        '{"doc_id": "abc", "text": "bad id", "lang": "en", "source": "s", "n_chars": 6}\n'
        '{"doc_id": 2, "text": "null lang ok", "lang": null, "source": "s", "n_chars": 12}\n'
        '{"doc_id": 3, "text": "missing lang ok", "source": "s", "n_chars": 15}\n'
        '{"doc_id": 4, "text": "bad count", "lang": "en", "source": "s", "n_chars": "many"}\n'
    )
    good, quarantine = jsonl.read_jsonl_corpus(spark, str(p))
    rows = {r.doc_id: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].lang is None and rows[3].lang is None
    q = sorted(r.line for r in quarantine.collect())
    assert len(q) == 2
    assert '"doc_id": "abc"' in q[0] or '"doc_id": "abc"' in q[1]
    assert any('"n_chars": "many"' in line for line in q)
