"""DuckDB oracle SQL — the SQL twin of :mod:`.tables` and every operator.

The driver pre-registers views ``region nation customer supplier part orders
lineitem events documents embeddings`` over the same parquet files and runs
each ``oracle_sql()[qid]`` string, hash-comparing against the Spark result
(order-insensitive, columns sorted by name). Rules followed here:

- The domain-view CTEs below MUST stay semantically identical to
  ``tables.eventos`` / ``tables.reservas`` / ``tables.inventario``.
- Every aggregate/computed column is explicitly aliased AND explicitly cast
  (DuckDB SUM(int) returns HUGEINT; Spark returns BIGINT — cast both to
  BIGINT so value hashing agrees).
- No ORDER BY needed (hash is order-insensitive) except inside window frames.
"""

from __future__ import annotations

# Keep in lock-step with tables.eventos / tables.reservas / tables.inventario.
DOMAIN_CTE = """
eventos AS (
    SELECT printf('%024x', p_partkey)        AS _id,
           printf('Evento %06d', p_partkey)  AS nombre,
           CAST(p_size * 10 AS INTEGER)      AS capacidad,
           p_brand                           AS categoria,
           CASE WHEN p_partkey % 10 = 0 THEN 'C' ELSE 'A' END AS estado
    FROM part
),
reservas AS (
    -- seq packs lineitem's minimal unique key; keep in lock-step with
    -- tables.reservas: ok·1e12 | ln·1e11 | pk·1e6 | sk·1e2 | qty
    SELECT printf('%024x', seq) AS _id,
           printf('Evento %06d', l_partkey)                AS evento,
           CASE l_returnflag WHEN 'N' THEN 'A'
                             WHEN 'R' THEN 'X'
                             ELSE 'C' END                  AS estado,
           printf('user%d@example.com', l_suppkey)         AS email,
           CAST(l_quantity AS INTEGER)                     AS cantidad,
           seq
    FROM (
        -- all-BIGINT arithmetic: adding DOUBLE l_quantity directly would
        -- promote seq to double and lose the low bits near 2^53
        SELECT *, l_orderkey * 1000000000000
                  + CAST(l_linenumber AS BIGINT) * 100000000000
                  + l_partkey * 1000000
                  + l_suppkey * 100
                  + CAST(l_quantity AS BIGINT) AS seq
        FROM lineitem
    )
),
inventario AS (
    SELECT e._id, e.nombre, e.capacidad, e.categoria, e.estado,
           CAST(COALESCE(r.reservado, 0) AS BIGINT)                AS reservado,
           CAST(e.capacidad - COALESCE(r.reservado, 0) AS BIGINT)  AS disponible
    FROM eventos e
    LEFT JOIN (
        SELECT evento, CAST(SUM(cantidad) AS BIGINT) AS reservado
        FROM reservas WHERE estado = 'A' GROUP BY evento
    ) r ON e.nombre = r.evento
)
"""


def with_domain(body: str, extra_cte: str = "") -> str:
    """Wrap a query body with the shared domain CTE prelude."""
    extra = f", {extra_cte.strip()}" if extra_cte.strip() else ""
    return f"WITH {DOMAIN_CTE.strip()}{extra}\n{body.strip()}"
