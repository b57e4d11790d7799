"""DuckDB oracle SQL mirroring the DDSketch algorithm bit-for-bit.

The driver compares each Ray query against an ANSI-SQL oracle by value hash.
DDSketch quantile estimates are approximate w.r.t. the *data*, but they are a
deterministic function of it, and every step is expressible in SQL:

  key       = ceil(log2(v) * M)            M = ln(2)/ln(gamma)       (exact-log
              mapping, logarithmic_key_mapping.rb:18-20)
  rank      = q * (count - 1)              (base_sketch.rb:125)
  key@rank  = first key whose running count > rank - zero_count
              (dense_store.rb:123-135; falls through to max key)
  estimate  = power(2, key/M) * 2/(1+gamma) (key_mapping.rb:80-82)

numpy's log2 and libm's pow (used on the scalar finalize path) are bit-identical
to DuckDB's log2/power on this platform (verified empirically), so the oracle
hash-matches the Ray pipeline exactly - making the approximate sketch fully
testable by the driver, not just "rows-only".
"""

from __future__ import annotations

import math
from typing import Sequence

from .aggregates import quantile_name

__all__ = ["ddsketch_quantile_sql", "ddsketch_group_sql"]


def _consts(alpha: float):
    # Take the constants from the actual mapping implementation so the SQL
    # literals are the very same doubles the Ray pipeline computes with
    # (computing e.g. ln2/ln(gamma) here instead of the mapping's
    # (1/log1p(gamma-1))*ln2 differs by ulps, amplified by the key magnitude).
    from ..core.mapping import LogarithmicKeyMapping

    mp = LogarithmicKeyMapping(alpha)
    coef = 2.0 / (1.0 + mp.gamma)
    return mp.gamma, mp.multiplier, coef, mp.min_possible


def ddsketch_quantile_sql(
    *,
    table: str,
    group_col: str,
    value_expr: str,
    alpha: float = 0.01,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    prefix: str = "",
    include_sum_avg: bool = True,
    where: str = "",
) -> str:
    """SQL computing exactly what ``DDSketchAgg(on=value_expr)`` finalizes.

    Output columns: ``{group_col}, {prefix}count, [{prefix}sum, {prefix}avg,]
    {prefix}min, {prefix}max, {prefix}p50, ...``.  Values must be >= 0 (the
    negative-store path is exercised by the pytest conformance suite instead).
    ``sum``/``avg`` are only bit-stable when values are integer-valued; pass
    ``include_sum_avg=False`` for fractional value columns.
    """
    _, m, coef, min_possible = _consts(alpha)
    qvals = ", ".join(f"({q:.17e})" for q in quantiles)
    p = prefix
    sum_avg_sel = f's.s AS "{p}sum", s.s / s.cnt AS "{p}avg",' if include_sum_avg else ""
    qcols = ",\n  ".join(
        f'max(CASE WHEN e.q = {q:.17e} THEN e.val END) AS "{p}{quantile_name(q)}"'
        for q in quantiles
    )
    sum_avg_grp = f', "{p}sum", "{p}avg"' if include_sum_avg else ""
    where_clause = f"WHERE {where}" if where else ""
    return f"""
WITH keyed AS (
  SELECT {group_col} AS grp,
         CAST(({value_expr}) AS DOUBLE) AS v,
         CASE WHEN CAST(({value_expr}) AS DOUBLE) > {min_possible:.17e}
              THEN CAST(ceil(log2(CAST(({value_expr}) AS DOUBLE)) * {m:.17e}) AS BIGINT)
         END AS k
  FROM {table} {where_clause}
),
stats AS (
  SELECT grp,
         CAST(count(*) AS DOUBLE) AS cnt,
         CAST(sum(v) AS DOUBLE) AS s,
         min(v) AS mn,
         max(v) AS mx,
         CAST(count(*) FILTER (WHERE k IS NULL) AS DOUBLE) AS zero_cnt
  FROM keyed GROUP BY grp
),
binned AS (
  SELECT grp, k, CAST(count(*) AS DOUBLE) AS c
  FROM keyed WHERE k IS NOT NULL GROUP BY grp, k
),
cum AS (
  SELECT grp, k, sum(c) OVER (PARTITION BY grp ORDER BY k) AS running
  FROM binned
),
qs AS (SELECT q FROM (VALUES {qvals}) AS t(q)),
hit AS (
  SELECT st.grp, qs.q, st.cnt, st.zero_cnt,
         min(CASE WHEN c.running > qs.q * (st.cnt - 1) - st.zero_cnt THEN c.k END) AS k_hit,
         max(c.k) AS k_max
  FROM stats st
  CROSS JOIN qs
  LEFT JOIN cum c ON c.grp = st.grp
  GROUP BY st.grp, qs.q, st.cnt, st.zero_cnt
),
est AS (
  SELECT grp, q,
         CASE WHEN q * (cnt - 1) < zero_cnt THEN 0.0
              ELSE power(2.0, coalesce(k_hit, k_max) / {m:.17e}) * {coef:.17e}
         END AS val
  FROM hit
)
SELECT s.grp AS {group_col},
  s.cnt AS "{p}count",
  {sum_avg_sel}
  s.mn AS "{p}min",
  s.mx AS "{p}max",
  {qcols}
FROM stats s JOIN est e ON e.grp = s.grp
GROUP BY s.grp, "{p}count"{sum_avg_grp}, "{p}min", "{p}max"
"""


def ddsketch_group_sql(
    *,
    table: str,
    group_col: str,
    metrics: dict,
    alpha: float = 0.01,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> str:
    """Multi-metric variant: one DDSketch per metric, joined on the group key.

    ``metrics`` maps output prefix -> (value_expr, include_sum_avg).
    """
    subs = []
    for i, (prefix, (expr, with_sum)) in enumerate(metrics.items()):
        sql = ddsketch_quantile_sql(
            table=table,
            group_col=group_col,
            value_expr=expr,
            alpha=alpha,
            quantiles=quantiles,
            prefix=prefix,
            include_sum_avg=with_sum,
        )
        subs.append(f"m{i} AS ({sql})")
    joins = " ".join(f"JOIN m{i} USING ({group_col})" for i in range(1, len(subs)))
    return f"WITH {', '.join(subs)} SELECT * FROM m0 {joins}"
