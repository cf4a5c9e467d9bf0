"""JSONL corpus source/sink (SURVEY.md §2.1 family — "another source
format"): the interchange format real LLM training corpora ship as
(one JSON document per line; Dolma/RedPajama/C4 dumps, crawler output).

Design decisions, each load-bearing at 100 TB:

- **Read = text scan + ``from_json``**, NOT ``spark.read.json`` with
  PERMISSIVE corrupt-record columns. Two reasons: (1) referencing
  ``_corrupt_record`` without caching raises in modern Spark (the parser
  prunes the column it is asked to filter on) — the text→``from_json``
  form has no such trap; (2) ``from_json`` is the engine's own JSON codec
  (the §2.7 F3 family), so the batch and streaming paths share one
  parser with one semantics.
- **Corrupt lines are QUARANTINED, never dropped**: a malformed line in a
  100 TB crawl is evidence (encoding bug upstream, truncated shard) — the
  reader returns (parsed, quarantine) so the pipeline can count/inspect
  rejects; silently losing them is how corpora rot. Blank lines are
  skipped (the JSONL spec's only non-record line). The gate covers both
  malformed lines AND type-coerced fields (a present, non-null JSON value
  that ``from_json`` nulls under the schema's type) — see
  :func:`_line_is_clean`.
- **Schema is REQUIRED, not inferred**: inference is a full extra pass
  over 100 TB and yields drifting types across shards. Missing fields are
  null (the JSONL evolution convention); extra fields are ignored.
- **Write = ``to_json`` over a struct of all columns** to one ``text``
  column: column order in the emitted object is the DataFrame's, stable
  across engines, and the writer stays a narrow map. Lines compress with
  a SPLITTABLE codec choice left to the caller's Spark conf (zstd/none;
  gzip would serialize whole-file reads — documented, not defaulted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# the documents-table schema as DDL — the corpus interchange contract
DOC_SCHEMA_DDL = (
    "doc_id long, text string, lang string, source string, n_chars int"
)


def _line_is_clean(schema_ddl: str) -> Column:
    """Validity gate over a raw ``value`` line: well-formed JSON OBJECT
    with no type-coerced field.

    Two layers (round-5 ADVICE — the object gate alone lets a
    type-mismatched field through as a silently-nulled value):

    1. ``json_object_keys`` is NULL for invalid JSON and non-object JSON
       alike (``from_json`` alone is too lenient — it parses an array or a
       truncated object to an all-null struct).
    2. Per schema field: if the KEY IS PRESENT with a non-null JSON value
       (``get_json_object`` not null — it returns NULL for both absent
       keys and explicit JSON ``null``, which are legitimate gaps) yet
       ``from_json`` parsed the field to NULL, the value was type-coerced
       away (e.g. ``"doc_id": "abc"`` under ``doc_id long``) — the row is
       corrupt evidence, not a document.

    Field paths use ``$.name`` — schema fields are assumed to be plain
    identifiers (the corpus contract's shape)."""
    from pyspark.sql.types import StructType

    parsed = F.from_json("value", schema_ddl)
    clean = F.json_object_keys("value").isNotNull()
    for name in StructType.fromDDL(schema_ddl).fieldNames():
        coerced = (
            F.get_json_object("value", f"$.{name}").isNotNull()
            & parsed[name].isNull()
        )
        clean = clean & ~coerced
    return clean


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema_ddl: str = DOC_SCHEMA_DDL
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → (parsed, quarantine).

    ``parsed`` carries the schema's columns for every well-formed line;
    ``quarantine`` carries (line, file) for every malformed OR
    type-coerced one (see :func:`_line_is_clean`) — counted, inspectable,
    never silently dropped."""
    raw = (
        spark.read.text(path)
        .withColumn("_file", F.input_file_name())
        .where(F.trim(F.col("value")) != "")
    )
    ok = _line_is_clean(schema_ddl)
    good = raw.where(ok).select(
        F.from_json("value", schema_ddl).alias("_doc")
    ).select("_doc.*")
    quarantine = raw.where(~ok).select(
        F.col("value").alias("line"), F.col("_file").alias("file")
    )
    return good, quarantine


def write_jsonl_corpus(df: DataFrame, path: str) -> None:
    """Write a DataFrame as JSONL: one object per line, keys in column
    order, written as a plain text file (splittable unless the session
    picks a non-splittable codec)."""
    df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    ).write.mode("overwrite").text(path)


def read_jsonl_corpus_stream(
    spark: SparkSession, path: str, schema_ddl: str = DOC_SCHEMA_DDL
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`read_jsonl_corpus` — the corpus-append
    ingest shape (new JSONL shards land in a directory; each micro-batch
    parses the new files). Same object-line validity rule, same
    (parsed, quarantine) split; both returned frames are streaming — the
    caller starts whichever queries it needs (quarantine typically feeds
    a counting/alerting sink)."""
    raw = (
        spark.readStream.format("text")
        .load(path)
        .withColumn("_file", F.input_file_name())
        .where(F.trim(F.col("value")) != "")
    )
    ok = _line_is_clean(schema_ddl)
    good = raw.where(ok).select(
        F.from_json("value", schema_ddl).alias("_doc")
    ).select("_doc.*")
    quarantine = raw.where(~ok).select(
        F.col("value").alias("line"), F.col("_file").alias("file")
    )
    return good, quarantine
