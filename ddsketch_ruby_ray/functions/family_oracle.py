"""DuckDB oracle SQL mirroring the hash-based sketch family bit-for-bit.

Same philosophy as the DDSketch oracle (functions/oracle.py): HLL, Bloom and
count-min results are approximate w.r.t. the data but DETERMINISTIC functions
of it - every step (splitmix64 / sha256 hashing, register max-fold, exact
HUGEINT harmonic sums, double-hash bucket addressing) is expressible in SQL,
so the driver's value-hash comparison fully verifies the distributed
implementation, not just row counts.

t-digest and KLL are merge-order-dependent (within their published bounds)
and deliberately have NO oracle here - their driver checks are rows-only and
their accuracy is pinned by the pytest suite.
"""

from __future__ import annotations

from ..core.hll import _alpha
from ..core.hashing import sha_lane_sql, splitmix64_sql

__all__ = [
    "hll_sql",
    "bloom_membership_sql",
    "cms_frequency_sql",
    "kmv_sql",
    "kmv_overlap_sql",
    "ams_f2_sql",
    "ams_join_size_sql",
]

_TWO64 = "18446744073709551616"


def _hash_expr(col: str, kind: str, lane: int) -> str:
    """HUGEINT-typed hash expression: splitmix64 seed=lane / sha256 lane."""
    if kind == "int":
        return splitmix64_sql(col, seed=lane)
    return f"({sha_lane_sql(col, lane)})::HUGEINT"


def hll_sql(
    *,
    table: str,
    group_col: str,
    value_col: str,
    p: int = 14,
    kind: str = "int",
    where: str = "",
) -> str:
    """SQL computing exactly ``HLLSpec(on=value_col, p=p, kind=kind)`` per group.

    Output: ``{group_col}, distinct`` (double).  Mirrors core/hll.py: register
    index = low p bits, rho = (64-p) - bitlen(h >> p) + 1, registers = max,
    harmonic denominator as an exact integer S = sum 2^(64-r) (HUGEINT), raw
    estimate = alpha*m^2 * 2^64 / S, small-range linear counting when
    raw <= 2.5m and empty registers exist.
    """
    m = 1 << p
    c_am2 = _alpha(m) * m * m  # same fp evaluation order as HyperLogLog.estimate
    width = 64 - p
    h = _hash_expr(value_col, kind, 0)
    where_clause = f"WHERE {where}" if where else ""
    return f"""
WITH h AS (
  SELECT {group_col} AS grp, {h} AS h FROM {table} {where_clause}
),
jr AS (
  SELECT grp, (h % {m})::BIGINT AS j, (h // {m}) AS w FROM h
),
rho AS (
  SELECT grp, j,
         CASE WHEN w = 0 THEN {width + 1}
              ELSE {width} - length(bin(w::UBIGINT)) + 1 END AS rho
  FROM jr
),
regs AS (SELECT grp, j, max(rho) AS r FROM rho GROUP BY grp, j),
agg AS (
  SELECT grp,
         sum(1::HUGEINT << (64 - r)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY grp
),
est AS (
  SELECT grp,
         ({c_am2:.17e} * {float(2**64):.17e}) /
           (s_present + ({m} - n_present) * (1::HUGEINT << 64))::DOUBLE AS raw,
         {m} - n_present AS zeros
  FROM agg
)
SELECT grp AS {group_col},
       CASE WHEN raw <= {2.5 * m} AND zeros > 0
            THEN {float(m)} * ln({float(m)} / zeros::DOUBLE)
            ELSE raw END AS "distinct"
FROM est
"""


def kmv_sql(
    *,
    table: str,
    group_col: str,
    value_col: str,
    k: int = 256,
    kind: str = "int",
    where: str = "",
) -> str:
    """SQL computing exactly ``KMVSpec(on=value_col, k=k, kind=kind)`` per group.

    Mirrors core/kmv.py: distinct hash values per group, ranked ascending;
    if the group has < k distinct hashes the estimate is that exact count,
    else ``(k-1) * 2^64 / kth_smallest`` with the same double evaluation
    order as :meth:`KMVSketch.estimate`.  Output:
    ``{group_col}, "distinct" (double), kept (double)``.
    """
    h = _hash_expr(value_col, kind, 0)
    where_clause = f"WHERE {where}" if where else ""
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col} AS grp, {h} AS h FROM {table} {where_clause}
),
r AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY grp) AS cnt
  FROM h
)
SELECT grp AS {group_col},
       CASE WHEN min(cnt) < {k}
            THEN min(cnt)::DOUBLE
            ELSE ({k - 1} * {_TWO64}.0) /
                 max(CASE WHEN rn = {k} THEN h END)::DOUBLE
       END AS "distinct",
       least(min(cnt), {k})::DOUBLE AS kept
FROM r GROUP BY grp
"""


def kmv_overlap_sql(
    *,
    table: str,
    group_col: str,
    value_col: str,
    k: int = 256,
    kind: str = "int",
) -> str:
    """SQL mirror of ``kmv_overlap_pipeline`` (pipelines/setops.py).

    Per unordered group pair: each side's bottom-k distinct hashes, the
    union's bottom-k (ranked again), the union estimate with the same double
    evaluation order as :meth:`KMVSketch.estimate`, the Jaccard estimate
    (intersection count within the union's bottom-k over its size), and
    ``intersection = jaccard * union_distinct``.  Output columns:
    ``type_a, type_b, union_distinct, jaccard, intersection``.
    """
    h = _hash_expr(value_col, kind, 0)
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col} AS grp, {h} AS h FROM {table}
),
rk AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h
),
bk AS (SELECT grp, h FROM rk WHERE rn <= {k}),
g AS (SELECT DISTINCT grp FROM bk),
pr AS (SELECT a.grp AS ga, b.grp AS gb FROM g a JOIN g b ON a.grp < b.grp),
uh AS (
  SELECT pr.ga, pr.gb, bk.h,
         max(CASE WHEN bk.grp = pr.ga THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN bk.grp = pr.gb THEN 1 ELSE 0 END) AS in_b
  FROM pr JOIN bk ON bk.grp = pr.ga OR bk.grp = pr.gb
  GROUP BY pr.ga, pr.gb, bk.h
),
ur AS (
  SELECT ga, gb, h, in_a, in_b,
         row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY ga, gb) AS cnt
  FROM uh
),
agg AS (
  SELECT ga, gb,
         least(min(cnt), {k}) AS kept,
         CASE WHEN min(cnt) < {k}
              THEN min(cnt)::DOUBLE
              ELSE ({k - 1} * {_TWO64}.0) /
                   max(CASE WHEN rn = {k} THEN h END)::DOUBLE
         END AS union_distinct,
         sum(CASE WHEN rn <= {k} AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
           AS inter_cnt,
         sum(CASE WHEN rn <= {k} AND in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
           AS a_cnt,
         sum(CASE WHEN rn <= {k} AND in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
           AS b_cnt
  FROM ur GROUP BY ga, gb
)
SELECT ga AS type_a, gb AS type_b, union_distinct,
       CASE WHEN kept = 0 THEN 0.0
            ELSE inter_cnt::DOUBLE / kept::DOUBLE END AS jaccard,
       CASE WHEN kept = 0 THEN 0.0
            ELSE (inter_cnt::DOUBLE / kept::DOUBLE) * union_distinct
       END AS intersection,
       CASE WHEN kept = 0 THEN 0.0
            ELSE (a_cnt::DOUBLE / kept::DOUBLE) * union_distinct
       END AS only_a,
       CASE WHEN kept = 0 THEN 0.0
            ELSE (b_cnt::DOUBLE / kept::DOUBLE) * union_distinct
       END AS only_b
FROM agg
"""


def ams_f2_sql(
    *,
    table: str,
    group_col: str,
    value_col: str,
    d: int = 5,
) -> str:
    """SQL computing exactly ``AMSSpec(on=value_col, d=d)`` per group.

    Mirrors core/ams.py: estimator j's signed sum is
    sum(+1 if splitmix64(v, seed=j) is odd else -1); the F2 estimate is the
    median of the d squared sums (d odd -> the median IS one of the exact
    integer squares).  Output: ``{group_col}, f2 (double), count (double)``.
    """
    sums = ",\n         ".join(
        f"sum(CASE WHEN ({_hash_expr(value_col, 'int', j)}) % 2 = 1"
        f" THEN 1 ELSE -1 END)::HUGEINT AS s{j}"
        for j in range(d)
    )
    squares = ", ".join(f"s{j} * s{j}" for j in range(d))
    return f"""
WITH s AS (
  SELECT {group_col} AS grp,
         count(*) AS cnt,
         {sums}
  FROM {table} GROUP BY grp
),
est AS (SELECT grp, unnest([{squares}]) AS e FROM s)
SELECT s.grp AS {group_col},
       (SELECT median(e)::DOUBLE FROM est WHERE est.grp = s.grp) AS f2,
       s.cnt::DOUBLE AS "count"
FROM s
"""


def ams_join_size_sql(
    *,
    left_table: str,
    left_col: str,
    right_table: str,
    right_col: str,
    d: int = 5,
) -> str:
    """SQL mirror of ``ams_join_size_events_orders``: median over j of
    (left signed sum_j) * (right signed sum_j), plus both row counts.
    Output: ``join_size_est (double), n_events (double), n_orders (double)``.
    """

    def side(table, col):
        sums = ",\n         ".join(
            f"sum(CASE WHEN ({_hash_expr(col, 'int', j)}) % 2 = 1"
            f" THEN 1 ELSE -1 END)::HUGEINT AS s{j}"
            for j in range(d)
        )
        return f"SELECT count(*) AS cnt,\n         {sums}\n  FROM {table}"

    prods = ", ".join(f"l.s{j} * r.s{j}" for j in range(d))
    return f"""
WITH l AS ({side(left_table, left_col)}),
r AS ({side(right_table, right_col)}),
est AS (SELECT unnest([{prods}]) AS e FROM l, r)
SELECT (SELECT median(e)::DOUBLE FROM est) AS join_size_est,
       l.cnt::DOUBLE AS n_events,
       r.cnt::DOUBLE AS n_orders
FROM l, r
"""


def _positions_cte(
    src_table: str, key_col: str, kind: str, k: int, m_bits: int, alias: str
) -> str:
    """CTE body: (key, pos) pairs via Kirsch-Mitzenmacher double hashing.

    pos_i = ((h1 + i*h2) mod 2^64) mod m  -- identical to numpy's uint64 wrap.
    """
    h1 = _hash_expr(key_col, kind, 0)
    h2 = _hash_expr(key_col, kind, 1)
    return f"""
  SELECT {key_col} AS key,
         (({h1} + i.i * {h2}) % {_TWO64}) % {m_bits} AS pos
  FROM {src_table} CROSS JOIN (SELECT unnest(range({k})) AS i) i
"""


def bloom_membership_sql(
    *,
    build_table: str,
    build_col: str,
    probe_table: str,
    probe_col: str,
    m_bits: int,
    k: int,
    kind: str = "int",
    out_key: str = "key",
) -> str:
    """SQL computing Bloom membership of each DISTINCT probe key, mirroring
    ``BloomFilter(m_bits, k)`` built over build_table.build_col.

    Output: ``{out_key}, maybe_member`` (bool) - false positives and all.
    """
    build = _positions_cte(build_table, build_col, kind, k, m_bits, "b")
    probe = _positions_cte(
        f"(SELECT DISTINCT {probe_col} FROM {probe_table})", probe_col, kind, k, m_bits, "p"
    )
    return f"""
WITH build_pos AS (SELECT DISTINCT pos FROM ({build})),
probe_pos AS ({probe})
SELECT p.key AS {out_key},
       bool_and(bp.pos IS NOT NULL) AS maybe_member
FROM probe_pos p LEFT JOIN build_pos bp USING (pos)
GROUP BY p.key
"""


def cms_frequency_sql(
    *,
    table: str,
    key_col: str,
    w: int,
    d: int,
    kind: str = "int",
    out_key: str = "key",
    weight_col: str | None = None,
) -> str:
    """SQL computing the count-min estimate for every DISTINCT key of
    ``table.key_col``, mirroring ``CountMinSketch(w, d)`` built over all rows.

    Output: ``{out_key}, est, exact`` - est is the min-over-rows sketch
    estimate (an overestimate), exact the true count (or weight sum with
    ``weight_col``; bit-exact for integer-valued weights).
    """
    h1 = _hash_expr(key_col, kind, 0)
    h2 = _hash_expr(key_col, kind, 1)
    wexpr = f"CAST({weight_col} AS DOUBLE)" if weight_col else "1.0"
    return f"""
WITH keyed AS (
  SELECT {key_col} AS key, {wexpr} AS wt, {h1} AS h1, {h2} AS h2 FROM {table}
),
buckets AS (
  SELECT key, wt, i.i AS i, ((h1 + i.i * h2) % {_TWO64}) % {w} AS bucket
  FROM keyed CROSS JOIN (SELECT unnest(range({d})) AS i) i
),
counters AS (
  SELECT i, bucket, CAST(sum(wt) AS DOUBLE) AS c FROM buckets GROUP BY i, bucket
),
probe AS (SELECT DISTINCT key, i, bucket FROM buckets),
est AS (
  SELECT p.key, min(c.c) AS est
  FROM probe p JOIN counters c ON c.i = p.i AND c.bucket = p.bucket
  GROUP BY p.key
),
exact AS (SELECT key, CAST(sum(wt) AS DOUBLE) AS exact FROM keyed GROUP BY key)
SELECT e.key AS {out_key}, e.est AS est, x.exact AS exact
FROM est e JOIN exact x USING (key)
"""
