"""CSV corpus source/sink (sources/csv_corpus.py): round-trip fidelity,
arity/coercion quarantine, streaming twin."""

from __future__ import annotations

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.sources import csv_corpus

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_preserves_documents(spark, tmp_path):
    """parquet documents → CSV → read back: identical rows, zero
    quarantine (RFC-4180 quoting survives commas/quotes in text)."""
    docs = tables.load(spark, SF, "documents")
    path = str(tmp_path / "corpus_csv")
    csv_corpus.write_csv_corpus(docs, path)
    good, quarantine = csv_corpus.read_csv_corpus(spark, path)
    assert quarantine.count() == 0
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, good.select(*docs.columns).collect()))
    assert a == b


def test_csv_quarantine_arity_and_coercion(spark, tmp_path):
    """A type-coerced field (doc_id=abc) and an arity-overflow line are
    quarantined with their file; clean neighbors parse; blank lines are
    skipped. Under-arity lines degrade to trailing NULLs by CSV's nature
    (documented format limitation, NOT quarantine)."""
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "1,good one,en,s,8\n"
        "abc,bad id,en,s,6\n"          # doc_id coerced -> quarantine
        "\n"
        "2,also good,en,s,9\n"
        "3,too,many,fields,5,EXTRA\n"  # arity overflow -> quarantine
        "4,short line\n"               # under-arity -> NULLs, parsed
        "5,sneaky,en,s,7,\n"           # EMPTY extra field -> quarantine
    )
    good, quarantine = csv_corpus.read_csv_corpus(spark, str(p))
    q = sorted(r.line for r in quarantine.collect())
    assert q == ["3,too,many,fields,5,EXTRA", "5,sneaky,en,s,7,", "abc,bad id,en,s,6"]
    rows = {r.doc_id: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[4].text == "short line" and rows[4].lang is None
    assert all(r.file.endswith("part-0.csv") for r in quarantine.collect())


def test_csv_quoted_fields_roundtrip(spark, tmp_path):
    """Commas, quotes and embedded newline-free text survive the to_csv /
    from_csv pair byte-for-byte."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text='says "hi", twice', lang="en", source="s,rc", n_chars=16),
            Row(doc_id=2, text="plain", lang="es", source="s", n_chars=5),
        ]
    )
    path = str(tmp_path / "quoted")
    csv_corpus.write_csv_corpus(df, path)
    good, quarantine = csv_corpus.read_csv_corpus(spark, path)
    assert quarantine.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, df.collect()))


def test_csv_quote_then_comma_roundtrip(spark, tmp_path):
    """Round-7 ADVICE regression: a double quote FOLLOWED by a comma inside
    a field. Under Spark's default backslash escaping the writer emits
    \\" inside the quoted field, the RFC-4180 arity regex treats \\" as
    the closing quote, and the comma after it counts as a delimiter —
    silently quarantining a valid document. The shared _CSV_OPTS
    (escape='"' → doubled-quote escaping) makes writer, parser, and
    counter agree on one quote model."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, text='a "b, c', lang="en", source="s", n_chars=7)]
    )
    path = str(tmp_path / "qc")
    csv_corpus.write_csv_corpus(df, path)
    good, quarantine = csv_corpus.read_csv_corpus(spark, path)
    assert quarantine.count() == 0
    assert [tuple(r) for r in good.collect()] == [tuple(r) for r in df.collect()]


def test_csv_stream_twin_matches_batch(spark, tmp_path):
    """The streaming reader over the same shard directory produces the
    same parsed rows and the same quarantine set as the batch reader."""
    p = tmp_path / "stream_src"
    p.mkdir()
    (p / "shard-0.csv").write_text(
        "1,alpha,en,s,5\n"
        "zzz,broken,en,s,6\n"
        "2,beta,fr,s,4\n"
    )
    good_b, quar_b = csv_corpus.read_csv_corpus(spark, str(p))
    good_s, quar_s = csv_corpus.read_csv_corpus_stream(spark, str(p))
    (
        good_s.writeStream.format("memory").queryName("csv_good")
        .trigger(availableNow=True).start().awaitTermination(60)
    )
    (
        quar_s.select("line").writeStream.format("memory").queryName("csv_quar")
        .trigger(availableNow=True).start().awaitTermination(60)
    )
    sg = sorted(map(tuple, spark.sql("SELECT * FROM csv_good").collect()))
    assert sg == sorted(map(tuple, good_b.collect()))
    sq = sorted(r.line for r in spark.sql("SELECT * FROM csv_quar").collect())
    assert sq == sorted(r.line for r in quar_b.collect())
