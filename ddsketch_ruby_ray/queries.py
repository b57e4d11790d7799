"""Driver-facing query registry: Ray pipelines + matching DuckDB oracle SQL.

Each entry in :func:`QUERIES` is a callable ``(sf_dir) -> Dataset``; the
matching key in :func:`ORACLE_SQL` is ANSI SQL DuckDB runs over the same
parquet tables (pre-registered views).  Column names are kept identical on
both sides; sketch quantile estimates are mirrored in SQL via
``functions.oracle`` (deterministic, bit-exact), so even the approximate
operators get full value-hash verification.

None of these functions calls ray.init(); the driver owns the session.
"""

from __future__ import annotations

from .functions import DDSketchAgg, ddsketch_group_sql, ddsketch_quantile_sql
from .pipelines import documents_sketch_pipeline
from .stages import unnest

ALPHA = 0.01
QUANTILES = (0.5, 0.9, 0.99)


def _read(sf_dir: str, table: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=list(columns))


# -- sketch queries ----------------------------------------------------------

def dd_stats_by_lang(sf_dir: str):
    """Exact side stats carried by the sketch (count/sum/min/max/avg)."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        DDSketchAgg(on="n_chars", relative_accuracy=ALPHA, quantiles=(), name="s")
    )
    return unnest(out, columns=["s"])


def dd_quantiles_by_lang(sf_dir: str):
    """DDSketch quantiles of document length by language."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        DDSketchAgg(on="n_chars", relative_accuracy=ALPHA, quantiles=QUANTILES, name="s")
    )
    return unnest(out, columns=["s"])


def dd_quantiles_by_event_type(sf_dir: str):
    """DDSketch quantiles of event value by type (fractional values ->
    sum/avg omitted: their fp accumulation order is not SQL-reproducible)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        DDSketchAgg(on="value", relative_accuracy=ALPHA, quantiles=QUANTILES, name="s")
    )
    out = unnest(out, columns=["s"])
    return out.drop_columns(["sum", "avg"])


def flagship_docs_metrics(sf_dir: str):
    """Flagship: text -> derived byte/line metrics -> per-lang twin sketches."""
    return documents_sketch_pipeline(sf_dir, alpha=ALPHA, quantiles=QUANTILES)


def sha256_invariant_by_lang(sf_dir: str):
    """Per-row content invariant: order-independent XOR-fold of sha256(text)
    per lang. Any block split / merge order yields the same signature, so this
    proves per-row content equality vs a reference copy at any scale."""
    from .pipelines import grouped_sketch_pipeline
    from .functions.specs import XorSigSpec
    from .stages.derive import add_sha64

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return grouped_sketch_pipeline(
        ds,
        [XorSigSpec(on="sha64", name="sig")],
        ("lang",),
        derive=lambda t: add_sha64(t, content_col="text").drop_columns(["text"]),
    )


QUERIES = {
    "dd_stats_by_lang": dd_stats_by_lang,
    "dd_quantiles_by_lang": dd_quantiles_by_lang,
    "dd_quantiles_by_event_type": dd_quantiles_by_event_type,
    "flagship_docs_metrics": flagship_docs_metrics,
    "sha256_invariant_by_lang": sha256_invariant_by_lang,
}

# Subset bench.py times per round (keep each under ~60 s at sf0.1 / 32 cpus).
BENCH_QUERIES = [
    "flagship_docs_metrics",
    "dd_quantiles_by_lang",
    "dd_quantiles_by_event_type",
]

# Flagship job used for the two-cluster-size scaling evidence.
SCALING_QUERIES = ["flagship_docs_metrics"]


ORACLE_SQL = {
    "dd_stats_by_lang": """
        SELECT lang,
               CAST(count(*) AS DOUBLE) AS "count",
               CAST(sum(n_chars) AS DOUBLE) AS "sum",
               CAST(min(n_chars) AS DOUBLE) AS "min",
               CAST(max(n_chars) AS DOUBLE) AS "max",
               CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS "avg"
        FROM documents GROUP BY lang
    """,
    "dd_quantiles_by_lang": ddsketch_quantile_sql(
        table="documents",
        group_col="lang",
        value_expr="n_chars",
        alpha=ALPHA,
        quantiles=QUANTILES,
    ),
    "dd_quantiles_by_event_type": ddsketch_quantile_sql(
        table="events",
        group_col="event_type",
        value_expr="value",
        alpha=ALPHA,
        quantiles=QUANTILES,
        include_sum_avg=False,
    ),
    "flagship_docs_metrics": ddsketch_group_sql(
        table="documents",
        group_col="lang",
        metrics={
            "bytes_": ("strlen(text)", True),
            "lines_": ("length(text) - length(replace(text, chr(10), '')) + 1", True),
        },
        alpha=ALPHA,
        quantiles=QUANTILES,
    ),
    "sha256_invariant_by_lang": """
        SELECT lang,
               CAST(count(*) AS DOUBLE) AS "count",
               bit_xor(('0x' || substr(sha256(text), 1, 15))::BIGINT) AS sig
        FROM documents GROUP BY lang
    """,
}
