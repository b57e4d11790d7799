"""DuckDB oracle SQL for the similarity pipelines.

Cosines are compared as ``floor(cos * 10^4 + 0.5)`` int64 - numpy-BLAS and
DuckDB float64 accumulation orders differ by ulps, which 4-decimal rounding
absorbs (see pipelines/similarity.py).  Embeddings are cast FLOAT -> DOUBLE
(exact) before any arithmetic on both sides.
"""

from __future__ import annotations

from typing import Sequence

__all__ = ["knn_sql", "neardup_sql", "srp_neardup_sql", "ivf_knn_sql"]


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


def srp_neardup_sql(
    *,
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
) -> str:
    """SRP-LSH near-dup pairs: same-bucket candidates verified by cosine.

    Mirrors pipelines/similarity.py::srp_neardup_pipeline bit-for-bit:
    vectors and splitmix64-derived hyperplanes quantized to 1e-6 (exact
    integers in float64), projections are sums of 64 products < 2^53 (exact
    in any accumulation order), bucket = sign-bit integer; verification is
    the floor(cos*1e4+0.5) rounding over the ORIGINAL double vectors.
    """
    from ..core.hashing import splitmix64_sql

    thr4 = int(threshold * 10_000 + 0.5)
    sm = splitmix64_sql("(p.p * {d} + d.d)".format(d=dim))
    cos = _cos_expr("x.v", "y.v")
    return f"""
WITH vecs AS (
  SELECT {id_col} AS id, ({vec_col})::DOUBLE[] AS v,
         list_transform(({vec_col})::DOUBLE[], e -> floor(e * 1000000.0 + 0.5)) AS vq
  FROM {table}
),
planes AS (
  SELECT p.p AS p,
         list(floor(((({sm})::DOUBLE / 18446744073709551616.0) * 2.0 - 1.0)
                    * 1000000.0 + 0.5) ORDER BY d.d) AS w
  FROM (SELECT unnest(range({n_planes})) AS p) p,
       (SELECT unnest(range({dim})) AS d) d
  GROUP BY p.p
),
proj AS (
  SELECT v.id, pl.p, list_dot_product(v.vq, pl.w) AS s
  FROM vecs v CROSS JOIN planes pl
),
bucket AS (
  SELECT id,
         sum(CASE WHEN s > 0 THEN (1::HUGEINT << p) ELSE 0::HUGEINT END)::BIGINT AS bucket
  FROM proj GROUP BY id
),
cand AS (
  SELECT bx.id AS a, by.id AS b
  FROM bucket bx JOIN bucket by ON bx.bucket = by.bucket AND by.id > bx.id
),
scored AS (
  SELECT c.a, c.b,
         CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) AS cos4
  FROM cand c JOIN vecs x ON x.id = c.a JOIN vecs y ON y.id = c.b
)
SELECT a, b, cos4 FROM scored WHERE cos4 >= {thr4}
"""


def ivf_knn_sql(
    *,
    table: str,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 3,
    kmeans_iters: int = 5,
    sample_n: int = 256,
    auto_size: bool = False,
) -> str:
    """IVF approximate top-k, mirroring ivf_knn_pipeline bit-for-bit.

    ``auto_size=True`` mirrors the pipeline's ``n_lists="auto"``: n_lists
    and sample_n become scalar subqueries over ``count(*)`` with the exact
    ``ivf_auto_params`` formula (GREATEST(16, floor(sqrt(N) + 0.5)); 32
    samples per centroid, floor at 256) — n_lists/sample_n args ignored.

    The entire quantizer is replayed in SQL: the (splitmix64(id), id) top-N
    sample, splitmix64-seeded init, and ``kmeans_iters`` UNROLLED iterations
    of integer-quantized spherical k-means.  Every order-dependent reduction
    is exact (integer dots < 2^53; centroid-norm sums in HUGEINT, matching
    the pipeline's Python-int arithmetic), so sample, centroids, list
    assignment and probe sets agree exactly; candidate scoring reuses the
    proven floor(cos*1e4+0.5) rounding.
    """
    from ..core.hashing import splitmix64_sql

    ids = ", ".join(str(int(q)) for q in sorted(query_ids))
    cos = _cos_expr("q.v", "t.v")
    sm_id = splitmix64_sql("id")
    sm_c = splitmix64_sql("c.c")
    Q = "1000000.0"

    if auto_size:
        # Mirror ivf_auto_params exactly: n_lists = max(16, floor(sqrt(N)+.5)),
        # sample_n = max(256, 32*n_lists).  sqrt is IEEE-correctly-rounded in
        # both libms, so the derived ints agree bit-for-bit with the pipeline.
        params_cte = """params AS MATERIALIZED (
  SELECT GREATEST(16, CAST(floor(sqrt(count(*)::DOUBLE) + 0.5) AS BIGINT)) AS n_lists
  FROM {table}
),
""".format(table=table)
        n_lists_expr = "(SELECT n_lists FROM params)"
        sample_n_expr = "(SELECT GREATEST(256, 32 * n_lists) FROM params)"
    else:
        params_cte = ""
        n_lists_expr = str(int(n_lists))
        sample_n_expr = str(int(sample_n))

    it_ctes = []
    for i in range(1, kmeans_iters + 1):
        prev = f"cent{i - 1}"
        it_ctes.append(
            f"""asg{i} AS MATERIALIZED (
  SELECT s.rn, s.nq, ct.c
  FROM sample s CROSS JOIN {prev} ct
  QUALIFY row_number() OVER (
    PARTITION BY s.rn ORDER BY list_dot_product(s.nq, ct.cq) DESC, ct.c ASC
  ) = 1
),
sums{i} AS MATERIALIZED (
  SELECT a.c, t.d, CAST(sum(t.e) AS BIGINT) AS s
  FROM asg{i} a,
       LATERAL (SELECT unnest(a.nq) AS e, generate_subscripts(a.nq, 1) AS d) t
  GROUP BY a.c, t.d
),
ss{i} AS MATERIALIZED (
  SELECT c, sum((s::HUGEINT) * (s::HUGEINT)) AS ss FROM sums{i} GROUP BY c
),
newc{i} AS MATERIALIZED (
  SELECT m.c, list(floor(m.s::DOUBLE / sqrt(x.ss::DOUBLE) * {Q} + 0.5) ORDER BY m.d) AS cq
  FROM sums{i} m JOIN ss{i} x ON x.c = m.c
  WHERE x.ss > 0
  GROUP BY m.c
),
cent{i} AS MATERIALIZED (
  SELECT p.c, coalesce(n.cq, p.cq) AS cq
  FROM {prev} p LEFT JOIN newc{i} n ON n.c = p.c
)"""
        )
    iters = ",\n".join(it_ctes)
    final = f"cent{kmeans_iters}"

    return f"""
WITH {params_cte}vecs AS MATERIALIZED (
  SELECT {id_col} AS id, ({vec_col})::DOUBLE[] AS v,
         list_transform(({vec_col})::DOUBLE[], e -> floor(e * {Q} + 0.5)) AS vq
  FROM {table}
),
norms AS MATERIALIZED (
  SELECT id, v, vq,
         CASE WHEN list_dot_product(vq, vq) = 0 THEN 1.0
              ELSE list_dot_product(vq, vq) END AS ss
  FROM vecs
),
nvecs AS MATERIALIZED (
  SELECT id, v,
         list_transform(vq, e -> floor(e / sqrt(ss) * {Q} + 0.5)) AS nq
  FROM norms
),
sample AS MATERIALIZED (
  SELECT id, nq, row_number() OVER (ORDER BY {sm_id}, id) AS rn
  FROM nvecs
  QUALIFY rn <= {sample_n_expr}
),
cent0 AS MATERIALIZED (
  SELECT c.c AS c, s.nq AS cq
  FROM (SELECT unnest(range({n_lists_expr})) AS c) c
  JOIN sample s
    ON s.rn - 1 = ({sm_c} % (SELECT count(*) FROM sample))
),
{iters},
assigned AS MATERIALIZED (
  SELECT nv.id, nv.v, ct.c AS list_id
  FROM nvecs nv CROSS JOIN {final} ct
  QUALIFY row_number() OVER (
    PARTITION BY nv.id ORDER BY list_dot_product(nv.nq, ct.cq) DESC, ct.c ASC
  ) = 1
),
q AS MATERIALIZED (SELECT id, v, nq FROM nvecs WHERE id IN ({ids})),
qprobe AS MATERIALIZED (
  SELECT q.id AS query_id, ct.c AS list_id
  FROM q CROSS JOIN {final} ct
  QUALIFY row_number() OVER (
    PARTITION BY q.id ORDER BY list_dot_product(q.nq, ct.cq) DESC, ct.c ASC
  ) <= {n_probe}
),
scored AS MATERIALIZED (
  SELECT q.id AS query_id, t.id AS neighbor_id,
         CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) AS cos4
  FROM q
  JOIN qprobe p ON p.query_id = q.id
  JOIN assigned t ON t.list_id = p.list_id AND t.id <> q.id
),
ranked AS MATERIALIZED (
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


def kmeans_sql(
    *, table: str, id_col: str, vec_col: str, k: int = 8, iters: int = 3
) -> str:
    """(id, cluster, dist2) mirroring pipelines/kmeans.py::kmeans_pipeline.

    The whole integer-k-means run is replayed in SQL: the SQ8 code CTEs
    (identical to the embedding_quantize_stats oracle), the k-smallest-id
    seeds, and one (distance, argmin-assignment, rounded-centroid-update)
    CTE block per unrolled Lloyd round.  Every reduction is an integer sum
    or an exact-input float64 divide + half-away round, so any evaluation
    order matches the engine bit-for-bit; ties and empty clusters follow
    the same (smallest cid, keep-previous-centroid) rules.
    """
    assert k >= 1 and iters >= 1
    head = f"""
WITH qz_vecs AS (SELECT {id_col} AS id, ({vec_col})::DOUBLE[] AS v FROM {table}),
qz_nrm AS (
  SELECT id, v,
         CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN 1.0
              ELSE sqrt(list_dot_product(v, v)) END AS nrm
  FROM qz_vecs
),
qz_flat AS (
  SELECT id, generate_subscripts(v, 1) AS d,
         CAST(round(unnest(v) / nrm * 1000000.0) AS BIGINT) AS v6
  FROM qz_nrm
),
qz_amax AS (SELECT greatest(max(abs(v6)), 1) AS a6 FROM qz_flat),
codes AS (
  SELECT id, d, CAST(round(v6 * 127.0 / a6) AS BIGINT) AS q
  FROM qz_flat, qz_amax
),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, id
  FROM (SELECT id FROM qz_vecs ORDER BY id LIMIT {k})
),
c0 AS (SELECT i.cid, c.d, c.q AS cq FROM init i JOIN codes c ON c.id = i.id)"""
    blocks = []
    for t in range(1, iters):
        blocks.append(f""",
d{t} AS (
  SELECT x.id, c.cid, sum((x.q - c.cq) * (x.q - c.cq)) AS dist
  FROM codes x JOIN c{t - 1} c ON c.d = x.d GROUP BY x.id, c.cid
),
a{t} AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
    FROM d{t}
  ) WHERE rn = 1
),
s{t} AS (
  SELECT a.cid, x.d, CAST(round(sum(x.q)::DOUBLE / count(*)) AS BIGINT) AS cq
  FROM a{t} a JOIN codes x ON x.id = a.id GROUP BY a.cid, x.d
),
c{t} AS (
  SELECT c.cid, c.d, coalesce(s.cq, c.cq) AS cq
  FROM c{t - 1} c LEFT JOIN s{t} s ON s.cid = c.cid AND s.d = c.d
)""")
    tail = f""",
dfin AS (
  SELECT x.id, c.cid, sum((x.q - c.cq) * (x.q - c.cq)) AS dist
  FROM codes x JOIN c{iters - 1} c ON c.d = x.d GROUP BY x.id, c.cid
)
SELECT id AS {id_col}, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist2
FROM (
  SELECT id, cid, dist,
         row_number() OVER (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
  FROM dfin
) WHERE rn = 1
"""
    return head + "".join(blocks) + tail


def semdedup_sql(
    *,
    table: str,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.92,
) -> str:
    """(id, cluster, is_dup) mirroring pipelines/semdedup.py.

    The k-means assignment replays via :func:`kmeans_sql` as a nested CTE;
    the within-cluster prune is a self-join on the cluster id restricted to
    smaller-id partners, thresholded on the shared ``cos4`` convention
    (floor(cos * 1e4 + 0.5) absorbs BLAS-vs-SQL fp noise both ways).
    """
    thr4 = int(threshold * 10_000 + 0.5)
    inner = kmeans_sql(table=table, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    cos = _cos_expr("vx.v", "vy.v")
    return f"""
WITH assigned AS MATERIALIZED ({inner}),
sd_vecs AS (SELECT {id_col} AS id, ({vec_col})::DOUBLE[] AS v FROM {table}),
dup AS (
  SELECT y.{id_col} AS id, 1 AS is_dup
  FROM assigned x
  JOIN assigned y ON y.cluster = x.cluster AND y.{id_col} > x.{id_col}
  JOIN sd_vecs vx ON vx.id = x.{id_col}
  JOIN sd_vecs vy ON vy.id = y.{id_col}
  WHERE CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) >= {thr4}
  GROUP BY y.{id_col}
)
SELECT a.{id_col}, a.cluster, CAST(coalesce(d.is_dup, 0) AS BIGINT) AS is_dup
FROM assigned a LEFT JOIN dup d ON d.id = a.{id_col}
"""
