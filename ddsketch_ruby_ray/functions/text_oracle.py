"""DuckDB oracle SQL for the text-analysis stages (stages/text.py).

Both sides run RE2 (pyarrow.compute and DuckDB), so regex counts agree
exactly; ratios are identical float64 divisions of identical integers.
"""

from __future__ import annotations

from ..stages.text import LANG_MARKERS, _LANG_PRIORITY

__all__ = ["quality_scores_sql", "lang_id_sql", "winnow_sql", "token_stats_by_group_sql", "pii_scrub_sql", "tfidf_sql"]


def _cnt(col: str, pattern: str) -> str:
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def token_stats_by_group_sql(*, table: str, group_col: str, text_col: str) -> str:
    """Per group: docs, total tokens, total chars, mean tokens per doc."""
    toks = _cnt(text_col, "[^ ]+")
    return f"""
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum({toks}) AS BIGINT) AS total_tokens,
       CAST(sum(length({text_col})) AS BIGINT) AS total_chars,
       CAST(sum({toks}) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens
FROM {table} GROUP BY {group_col}
"""


def quality_scores_sql(*, table: str, key_col: str, text_col: str) -> str:
    t = text_col
    punct = r"[.,;:!?''\"()\[\]{}-]"  # '' = escaped quote in SQL literal
    return f"""
SELECT {key_col},
  CAST(length({t}) AS BIGINT) AS n_chars_,
  CAST({_cnt(t, '[^ ]+')} AS BIGINT) AS n_tokens,
  {_cnt(t, '[a-zA-Z]')} / greatest(length({t}), 1)::DOUBLE AS alpha_ratio,
  {_cnt(t, '[0-9]')} / greatest(length({t}), 1)::DOUBLE AS digit_ratio,
  {_cnt(t, punct)} / greatest(length({t}), 1)::DOUBLE AS punct_ratio,
  {_cnt(t, ' ')} / greatest(length({t}), 1)::DOUBLE AS space_ratio,
  (length({t}) - {_cnt(t, ' ')}) / greatest({_cnt(t, '[^ ]+')}, 1)::DOUBLE AS mean_token_len
FROM {table}
"""


def lang_id_sql(*, table: str, key_col: str, text_col: str, out_col: str = "pred_lang") -> str:
    lower = f"lower({text_col})"
    scores = {l: _cnt(lower, rx.replace("'", "''")) for l, rx in LANG_MARKERS.items()}
    score_cols = ",\n  ".join(f"{expr} AS s_{l}" for l, expr in scores.items())
    mx = f"greatest({', '.join('s_' + l for l in _LANG_PRIORITY)})"
    case = " ".join(f"WHEN s_{l} = mx THEN '{l}'" for l in _LANG_PRIORITY)
    return f"""
WITH scored AS (
  SELECT {key_col}, {score_cols} FROM {table}
),
m AS (SELECT *, {mx} AS mx FROM scored)
SELECT {key_col},
       CASE WHEN mx = 0 THEN 'unk' {case} END AS {out_col}
FROM m
"""


def winnow_sql(
    *,
    table: str,
    key_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    gram_hash: str = "fold",
) -> str:
    """(key, n_fp, fp_xor) winnowing fingerprints, mirroring winnow_fingerprints.

    ``gram_hash="fold"`` mirrors the vectorized codepoint-fold gram hash:
    per char position, lead() pulls the next k-1 codepoints, then a CTE
    chain applies acc = splitmix64(acc + cp) (one CTE per step - nesting
    splitmix64_sql would blow the expression up ~32x per level).
    ``gram_hash="sha256"`` mirrors the cryptographic verification variant.
    """
    if gram_hash == "fold":
        from ..core.hashing import splitmix64_sql

        _TWO64 = "18446744073709551616"
        leads = ", ".join(f"lead(cp, {j}) OVER w AS c{j}" for j in range(1, k))
        ctes = [
            f"""chars AS (
  SELECT {key_col} AS key, i.i AS pos, unicode(substr({text_col}, i.i, 1)) AS cp
  FROM {table},
       LATERAL (SELECT unnest(range(1, length({text_col}) + 1)) AS i) i
)""",
            f"""seq AS (
  SELECT key, pos, cp AS c0, {leads}
  FROM chars WINDOW w AS (PARTITION BY key ORDER BY pos)
)""",
        ]
        prev, acc = "seq", None
        for j in range(k):
            step_in = (
                f"c{j}::HUGEINT" if acc is None else f"(({acc} + c{j}::HUGEINT) % {_TWO64})"
            )
            keep = ", ".join(f"c{jj}" for jj in range(j + 1, k))
            keep = (", " + keep) if keep else ""
            guard = f" WHERE c{k - 1} IS NOT NULL" if j == 0 else ""
            ctes.append(
                f"f{j} AS (SELECT key, pos, "
                f"{splitmix64_sql(step_in, normalize=False)} AS acc{j}{keep} FROM {prev}{guard})"
            )
            prev, acc = f"f{j}", f"acc{j}"
        ctes.append(f"grams AS (SELECT key, pos, ({acc} // 2)::BIGINT AS h FROM {prev})")
        gram_ctes = ",\n".join(ctes)
        return f"""
WITH {gram_ctes},
wins AS (
  SELECT key, pos,
         min(h) OVER (
           PARTITION BY key ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING
         ) AS wmin,
         lead(h, {window - 1}) OVER (PARTITION BY key ORDER BY pos) AS h_end
  FROM grams
),
fps AS (
  SELECT DISTINCT key, wmin::BIGINT AS fp
  FROM wins WHERE h_end IS NOT NULL
),
agg AS (
  SELECT key, count(*) AS n_fp, bit_xor(fp) AS fp_xor FROM fps GROUP BY key
),
alldocs AS (SELECT {key_col} AS key FROM {table})
SELECT d.key AS {key_col},
       coalesce(a.n_fp, 0)::BIGINT AS n_fp,
       coalesce(a.fp_xor, 0)::BIGINT AS fp_xor
FROM alldocs d LEFT JOIN agg a ON a.key = d.key
"""
    assert gram_hash == "sha256", gram_hash
    return f"""
WITH grams AS (
  SELECT {key_col} AS key, i.i AS pos,
         ('0x' || substr(sha256(substr({text_col}, i.i, {k})), 1, 16))::UBIGINT // 2 AS h,
         length({text_col}) - {k} + 1 AS n_grams
  FROM {table},
       LATERAL (SELECT unnest(range(1, greatest(length({text_col}) - {k} + 1, 0) + 1)) AS i) i
),
wins AS (
  SELECT key, pos, n_grams,
         min(h) OVER (
           PARTITION BY key ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING
         ) AS wmin
  FROM grams
),
fps AS (
  SELECT DISTINCT key, wmin::BIGINT AS fp
  FROM wins WHERE pos <= n_grams - {window} + 1
),
agg AS (
  SELECT key, count(*) AS n_fp, bit_xor(fp) AS fp_xor FROM fps GROUP BY key
),
alldocs AS (SELECT {key_col} AS key FROM {table})
SELECT d.key AS {key_col},
       coalesce(a.n_fp, 0)::BIGINT AS n_fp,
       coalesce(a.fp_xor, 0)::BIGINT AS fp_xor
FROM alldocs d LEFT JOIN agg a ON a.key = d.key
"""


def pii_scrub_sql(*, table: str, key_col: str, text_expr: str) -> str:
    """SQL mirroring ``stages.text.pii_scrub`` over ``text_expr`` exactly.

    Counts use the sequential-redaction semantics (each pattern counts on
    the text as redacted by its predecessors); the final redacted text is
    digested with sha256 lane 0 (core/hashing.sha_lane_sql) so the compare
    verifies the exact output bytes.
    """
    from ..core.hashing import sha_lane_sql
    from ..stages.text import PII_PATTERNS

    sel = [key_col]
    cur = f"({text_expr})"
    for name, pattern, repl in PII_PATTERNS:
        pat = pattern.replace("'", "''")  # duckdb strings keep backslashes literal
        sel.append(f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    sel.append(f"length({cur}) AS redacted_len")
    sel.append(f"{sha_lane_sql(cur)} AS redacted_sha")
    return f"SELECT {', '.join(sel)} FROM {table}"


def tfidf_sql(*, table: str, key: str, text: str, k: int = 3) -> str:
    """(key, rn, term, tf, df, tfidf) mirroring
    pipelines/tfidf.py::tfidf_topk_pipeline (uncapped vocabulary).

    Ranking key tf/df is an IEEE-exact double on both sides; ties break on
    the term's binary collation (== numpy's codepoint order for UTF-8).
    """
    from .dedup_oracle import _tokens_cte

    toks = _tokens_cte(table, key, text)
    return f"""
WITH tok AS ({toks}),
tf AS (SELECT key, tok AS term, count(*) AS tf FROM tok GROUP BY key, tok),
df AS (
  SELECT term, count(*) AS df
  FROM (SELECT DISTINCT key, tok AS term FROM tok) GROUP BY term
),
nd AS (SELECT count(*) AS n FROM {table}),
ranked AS (
  SELECT tf.key, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.key
           ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC, tf.term
         ) AS rn
  FROM tf JOIN df USING (term)
)
SELECT key AS {key}, rn, term, tf, df,
       CAST(tf AS DOUBLE) *
         ln(CAST((SELECT n FROM nd) AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
FROM ranked WHERE rn <= {k}
"""
