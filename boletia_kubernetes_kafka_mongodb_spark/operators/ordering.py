"""Sorts, limits, greatest-per-group, set ops (SURVEY.md §2.6).

The reference's ordering surface is implicit — Mongo natural order plus
point lookups (``reservas/main.go:61,79``) — but any real operator of the
system asks these three questions, so they're first-class here:

* "which events have the most seats left?"      → ``order_topn_disponible``
* "what was this user's latest reservation?"    → ``order_latest_per_email``
* "who cancelled and never rebooked?"           → ``setop_churn_emails``

Scale posture:

* Top-N never global-sorts: ``orderBy().limit()`` compiles to
  ``TakeOrderedAndProject`` — each task keeps a bounded N-row heap, the
  driver merges P·N rows. A 100 TB scan returns 20 rows without a shuffle.
  Ties are broken deterministically (unique ``_id``) so the result is
  well-defined on any cluster layout.
* Greatest-per-group is ``max_by`` aggregation, not a row_number window:
  partial aggregation combines map-side, one shuffle of one row per
  surviving key — a window would shuffle every input row to its key's
  partition and sort there.
* Set ops run on the raw long key (``l_suppkey``), strings render after —
  shuffles carry 8-byte longs, not emails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from ..oracle import with_domain

TOPN = 20


def order_topn_disponible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 sort+limit: top-N active events by seats left, deterministic
    tie-break on ``_id`` (unique)."""
    inv = tables.inventario(spark, sf_dir)
    return (
        inv.where(F.col("estado") == "A")
        .orderBy(F.col("disponible").desc(), F.col("_id"))
        .limit(TOPN)
        .select("_id", "nombre", "disponible")
    )


def order_topn_disponible_oracle() -> str:
    return with_domain(
        f"""
        SELECT _id, nombre, disponible
        FROM inventario WHERE estado = 'A'
        ORDER BY disponible DESC, _id
        LIMIT {TOPN}
        """
    )


def order_latest_per_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 greatest-per-group: each email's most recent reservation
    (max ``seq`` = arrival order, unique ⇒ deterministic).

    ``max_by`` aggregates share one shuffle and combine partially map-side;
    the Reserva strings render from the five winning longs post-shuffle.
    """
    keyed = tables.reservas_keyed(spark, sf_dir)
    latest = keyed.groupBy("l_suppkey").agg(
        F.max("seq").alias("seq"),
        F.max_by("l_partkey", "seq").alias("l_partkey"),
        F.max_by("estado", "seq").alias("estado"),
        F.max_by("cantidad", "seq").alias("cantidad"),
    )
    return tables.reserva_render(latest).select(
        "email", "evento", "estado", "cantidad", "seq"
    )


# keyed twin of tables.reservas_keyed (same all-BIGINT seq packing as
# oracle.DOMAIN_CTE's reservas).
_KEYED_CTE = """
keyed AS (
    SELECT l_partkey, l_suppkey,
           CASE l_returnflag WHEN 'N' THEN 'A'
                             WHEN 'R' THEN 'X'
                             ELSE 'C' END AS estado,
           CAST(l_quantity AS INTEGER) AS cantidad,
           l_orderkey * 1000000000000
           + CAST(l_linenumber AS BIGINT) * 100000000000
           + l_partkey * 1000000
           + l_suppkey * 100
           + CAST(l_quantity AS BIGINT) AS seq
    FROM lineitem
)
"""


def order_latest_per_email_oracle() -> str:
    return f"""
        WITH {_KEYED_CTE.strip()}
        SELECT printf('user%d@example.com', l_suppkey)          AS email,
               printf('Evento %06d', arg_max(l_partkey, seq))   AS evento,
               arg_max(estado, seq)                             AS estado,
               arg_max(cantidad, seq)                           AS cantidad,
               MAX(seq)                                         AS seq
        FROM keyed
        GROUP BY l_suppkey
        """


def setop_churn_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 set ops: emails that cancelled (estado X) and hold no active
    reservation — EXCEPT on the raw key; INTERSECT gives the rebooked count
    alongside (same two inputs, computed once each).
    """
    keyed = tables.reservas_keyed(spark, sf_dir)
    cancelled = keyed.where(F.col("estado") == "X").select("l_suppkey").distinct()
    active = keyed.where(F.col("estado") == "A").select("l_suppkey").distinct()
    churned = cancelled.exceptAll(active).withColumn("churned", F.lit(True))
    rebooked = cancelled.intersect(active).withColumn("churned", F.lit(False))
    both = churned.unionByName(rebooked)
    return both.select(
        F.concat(
            F.lit("user"), F.col("l_suppkey").cast("string"), F.lit("@example.com")
        ).alias("email"),
        "churned",
    )


def setop_churn_emails_oracle() -> str:
    return f"""
        WITH {_KEYED_CTE.strip()},
        cancelled AS (SELECT DISTINCT l_suppkey FROM keyed WHERE estado = 'X'),
        active    AS (SELECT DISTINCT l_suppkey FROM keyed WHERE estado = 'A')
        SELECT printf('user%d@example.com', l_suppkey) AS email, churned
        FROM (
            SELECT l_suppkey, TRUE AS churned
            FROM (SELECT l_suppkey FROM cancelled EXCEPT SELECT l_suppkey FROM active)
            UNION ALL
            SELECT l_suppkey, FALSE AS churned
            FROM (SELECT l_suppkey FROM cancelled INTERSECT SELECT l_suppkey FROM active)
        )
        """


def order_user_event_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 window functions: per-user event sequence — arrival rank and
    inter-event gap (lag) in microseconds.

    Partitioned by ``user_id`` (unbounded cardinality at scale — never by
    the 5-value ``event_type``, which would make 5 giant partitions); both
    functions share one window spec ⇒ one shuffle + one per-key sort.
    ``event_id`` tie-breaks equal timestamps deterministically.
    """
    from pyspark.sql.window import Window

    ev = tables.load(spark, sf_dir, "events")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    base = ev.select("user_id", "event_id", "event_type", tus.alias("tus"))
    return base.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rank_in_user"),
        (F.col("tus") - F.lag("tus", 1).over(w)).alias("gap_us"),
    )


def order_user_event_ranks_oracle() -> str:
    return """
        SELECT user_id, event_id, event_type,
               CAST(row_number() OVER w AS INTEGER) AS rank_in_user,
               tus - lag(tus, 1) OVER w AS gap_us
        FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        """


PAGE_SIZE = 25
# below every fixture's max event_id (sf0.001 tops out at 999) so the page
# is non-vacuous at EVERY scale factor — an empty==empty smoke pass would
# hide predicate regressions
PAGE_CURSOR = 500


def order_page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the scalable form of the reference's
    HTTP listings: page N+1 is ``WHERE key > last_seen ORDER BY key LIMIT
    page`` instead of OFFSET. OFFSET pagination scans and discards
    everything before the offset (O(offset) per page, and rows shift under
    concurrent writes); the keyset predicate reaches the parquet scan as a
    PushedFilter, row groups below the cursor are skipped via min/max
    stats, and the limit compiles to ``TakeOrderedAndProject`` bounded
    heaps — every page costs the same at any depth.
    """
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_id") > PAGE_CURSOR)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(PAGE_SIZE)
    )


def order_page_keyset_oracle() -> str:
    return f"""
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_id > {PAGE_CURSOR}
        ORDER BY event_id LIMIT {PAGE_SIZE}
    """
