"""CSV corpus source/sink (SURVEY.md §2.1 family — "another source
format"): the other interchange format corpus dumps ship as (one record
per line, fixed arity, no header — the shard convention).

Same contract as the JSONL source (`jsonl.py`), same two-frame return:

- **Read = text scan + ``from_csv``** (the expression-level CSV codec),
  not ``spark.read.csv`` with PERMISSIVE corrupt-record columns — the
  same ``_corrupt_record``-pruning trap as JSON, and the text form shares
  one parser between batch and streaming.
- **Quarantine, never drop**: a line is quarantined when (a) it carries
  MORE fields than the schema (arity overflow — detected by counting raw
  delimiters outside quoted regions, which witnesses even an EMPTY extra
  trailing field), or (b) a field that string-parses non-empty was nulled
  by the typed parse (type coercion, e.g. ``abc`` under ``doc_id long``).
- **Honest coverage note** (CSV's format limits vs JSONL): a line with
  FEWER fields than the schema is indistinguishable from trailing empty
  values (both parse to trailing NULLs — CSV has no key names), and
  quote-damaged lines degrade to whatever the RFC-4180 parser salvages.
  Both land as rows-with-NULLs, not quarantine — the format cannot
  witness them; corpora needing that guarantee should ship JSONL.
- **Schema REQUIRED, no header line**: inference is an extra 100 TB pass;
  headers in sharded dumps force per-file first-line handling that
  breaks splittable reads.
- **Write = ``to_csv`` over a struct of all columns**, one text column —
  narrow map, splittable output (codec left to session conf).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .jsonl import DOC_SCHEMA_DDL

# ONE quote model for the parser, the writer, AND the arity counter:
# RFC-4180 doubled-quote escaping. Spark's csv default is BACKSLASH
# escaping (escape='\\'), under which write_csv_corpus emits an embedded
# quote as \" inside a quoted field — the arity regex (which erases
# '"(?:[^"]|"")*"' quoted regions) would treat \" as the closing quote
# and count any comma after it as a delimiter, silently quarantining
# valid documents like 'a "b, c' on round-trip (round-7 ADVICE).
_CSV_OPTS = {"escape": '"'}


def _csv_is_clean(schema_ddl: str) -> Column:
    """Validity gate over a raw ``value`` line: correct arity (no extra
    fields) and no type-coerced field (string-parse non-null where the
    typed parse is null). See the module docstring for what CSV cannot
    witness (under-arity, quote damage)."""
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(schema_ddl).fieldNames()
    as_string = ", ".join(f"{name} string" for name in fields)
    typed = F.from_csv("value", F.lit(schema_ddl), _CSV_OPTS)
    raw = F.from_csv("value", F.lit(as_string), _CSV_OPTS)
    # arity overflow gates on the RAW delimiter count (commas outside
    # RFC-4180 quoted regions), not a sentinel extra column: the parser
    # reads an EMPTY trailing extra field ("1,x,y,") as NULL under every
    # nullValue/emptyValue option combination, so a sentinel cannot
    # witness it (round-6 ADVICE). Quoted fields — including escaped ""
    # quotes — are erased before counting, so embedded commas don't count.
    stripped = F.regexp_replace("value", '"(?:[^"]|"")*"', "")
    n_seps = F.length(stripped) - F.length(F.regexp_replace(stripped, ",", ""))
    clean = n_seps <= F.lit(len(fields) - 1)
    for name in fields:
        coerced = raw[name].isNotNull() & typed[name].isNull()
        clean = clean & ~coerced
    return clean


def read_csv_corpus(
    spark: SparkSession, path: str, schema_ddl: str = DOC_SCHEMA_DDL
) -> tuple[DataFrame, DataFrame]:
    """Read a headerless CSV corpus → (parsed, quarantine). Blank lines are
    skipped; quarantined lines carry (line, file) for inspection."""
    raw = (
        spark.read.text(path)
        .withColumn("_file", F.input_file_name())
        .where(F.trim(F.col("value")) != "")
    )
    ok = _csv_is_clean(schema_ddl)
    good = raw.where(ok).select(
        F.from_csv("value", F.lit(schema_ddl), _CSV_OPTS).alias("_rec")
    ).select("_rec.*")
    quarantine = raw.where(~ok).select(
        F.col("value").alias("line"), F.col("_file").alias("file")
    )
    return good, quarantine


def write_csv_corpus(df: DataFrame, path: str) -> None:
    """Write a DataFrame as headerless CSV text (RFC-4180 quoting via
    ``to_csv``), one record per line in column order."""
    df.select(
        F.to_csv(F.struct(*[F.col(c) for c in df.columns]), _CSV_OPTS).alias("value")
    ).write.mode("overwrite").text(path)


def read_csv_corpus_stream(
    spark: SparkSession, path: str, schema_ddl: str = DOC_SCHEMA_DDL
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`read_csv_corpus` — new CSV shards landing
    in a directory, same gate, same (parsed, quarantine) split."""
    raw = (
        spark.readStream.format("text")
        .load(path)
        .withColumn("_file", F.input_file_name())
        .where(F.trim(F.col("value")) != "")
    )
    ok = _csv_is_clean(schema_ddl)
    good = raw.where(ok).select(
        F.from_csv("value", F.lit(schema_ddl), _CSV_OPTS).alias("_rec")
    ).select("_rec.*")
    quarantine = raw.where(~ok).select(
        F.col("value").alias("line"), F.col("_file").alias("file")
    )
    return good, quarantine
