"""DuckDB oracle SQL for the similarity pipelines.

Cosines are compared as ``floor(cos * 10^4 + 0.5)`` int64 - numpy-BLAS and
DuckDB float64 accumulation orders differ by ulps, which 4-decimal rounding
absorbs (see pipelines/similarity.py).  Embeddings are cast FLOAT -> DOUBLE
(exact) before any arithmetic on both sides.
"""

from __future__ import annotations

from typing import Sequence

__all__ = ["knn_sql", "neardup_sql"]


def _cos_expr(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def knn_sql(
    *,
    table: str,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 5,
) -> str:
    """Top-k cosine neighbors per query id: (query_id, neighbor_id, cos4)."""
    ids = ", ".join(str(int(q)) for q in sorted(query_ids))
    cos = _cos_expr("q.v", "t.v")
    return f"""
WITH vecs AS (SELECT {id_col} AS id, ({vec_col})::DOUBLE[] AS v FROM {table}),
q AS (SELECT id, v FROM vecs WHERE id IN ({ids})),
scored AS (
  SELECT q.id AS query_id, t.id AS neighbor_id,
         CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) AS cos4
  FROM q JOIN vecs t ON t.id <> q.id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC
  ) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cos4 FROM ranked WHERE rn <= {k}
"""


def neardup_sql(*, table: str, id_col: str, vec_col: str, threshold: float = 0.95) -> str:
    """All pairs with cosine >= threshold (a < b): (a, b, cos4)."""
    thr4 = int(threshold * 10_000 + 0.5)
    cos = _cos_expr("x.v", "y.v")
    return f"""
WITH vecs AS (SELECT {id_col} AS id, ({vec_col})::DOUBLE[] AS v FROM {table}),
scored AS (
  SELECT x.id AS a, y.id AS b,
         CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) AS cos4
  FROM vecs x JOIN vecs y ON y.id > x.id
)
SELECT a, b, cos4 FROM scored WHERE cos4 >= {thr4}
"""
