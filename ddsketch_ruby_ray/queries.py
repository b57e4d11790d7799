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


# -- sketch family (HLL / Bloom / CMS / t-digest / KLL) ----------------------

def hll_users_by_event_type(sf_dir: str):
    """HLL distinct user_id per event_type (splitmix64 int hashing)."""
    from .functions.family_specs import HLLSpec
    from .pipelines import grouped_sketch_pipeline

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_sketch_pipeline(
        ds, [HLLSpec(on="user_id", name="h", p=14, kind="int")], ("event_type",)
    )


def hll_props_by_event_type(sf_dir: str):
    """HLL distinct props-string per event_type (sha256 string hashing)."""
    from .functions.family_specs import HLLSpec
    from .pipelines import grouped_sketch_pipeline

    ds = _read(sf_dir, "events", ["event_type", "props"])
    return grouped_sketch_pipeline(
        ds, [HLLSpec(on="props", name="h", p=14, kind="str")], ("event_type",)
    )


def bloom_customer_membership(sf_dir: str):
    """Bloom filter over customer keys, probed by distinct event user_ids."""
    from .functions.family_specs import BloomSpec
    from .pipelines.probe import bloom_membership_pipeline

    build = _read(sf_dir, "customer", ["c_custkey"])
    probe = _read(sf_dir, "events", ["user_id"])
    return bloom_membership_pipeline(
        build,
        probe,
        build_spec=BloomSpec(on="c_custkey", m_bits=1 << 14, k=7, kind="int"),
        probe_col="user_id",
        out_key="user_id",
    )


def cms_user_frequencies(sf_dir: str):
    """Count-min estimate vs exact count of events per user_id."""
    from .functions.family_specs import CMSSpec
    from .pipelines.probe import cms_frequency_pipeline

    ds = _read(sf_dir, "events", ["user_id"])
    return cms_frequency_pipeline(
        ds, spec=CMSSpec(on="user_id", w=256, d=4, kind="int"), out_key="user_id"
    )


def tdigest_chars_by_lang(sf_dir: str):
    """t-digest quantiles of doc length by lang (rows-only driver check)."""
    from .functions.family_specs import TDigestSpec
    from .pipelines import grouped_sketch_pipeline

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_sketch_pipeline(
        ds, [TDigestSpec(on="n_chars", name="t", quantiles=QUANTILES)], ("lang",)
    )


def kll_chars_by_lang(sf_dir: str):
    """KLL quantiles of doc length by lang (rows-only driver check)."""
    from .functions.family_specs import KLLSpec
    from .pipelines import grouped_sketch_pipeline

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_sketch_pipeline(
        ds, [KLLSpec(on="n_chars", name="k", quantiles=QUANTILES)], ("lang",)
    )


QUERIES = {
    "dd_stats_by_lang": dd_stats_by_lang,
    "dd_quantiles_by_lang": dd_quantiles_by_lang,
    "dd_quantiles_by_event_type": dd_quantiles_by_event_type,
    "flagship_docs_metrics": flagship_docs_metrics,
    "sha256_invariant_by_lang": sha256_invariant_by_lang,
    "hll_users_by_event_type": hll_users_by_event_type,
    "hll_props_by_event_type": hll_props_by_event_type,
    "bloom_customer_membership": bloom_customer_membership,
    "cms_user_frequencies": cms_user_frequencies,
    "tdigest_chars_by_lang": tdigest_chars_by_lang,  # rows-only (no oracle_sql)
    "kll_chars_by_lang": kll_chars_by_lang,  # rows-only (no oracle_sql)
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


def _family_oracles() -> dict:
    from .functions.family_oracle import bloom_membership_sql, cms_frequency_sql, hll_sql

    return {
        "hll_users_by_event_type": hll_sql(
            table="events", group_col="event_type", value_col="user_id", p=14, kind="int"
        ),
        "hll_props_by_event_type": hll_sql(
            table="events", group_col="event_type", value_col="props", p=14, kind="str"
        ),
        "bloom_customer_membership": bloom_membership_sql(
            build_table="customer",
            build_col="c_custkey",
            probe_table="events",
            probe_col="user_id",
            m_bits=1 << 14,
            k=7,
            kind="int",
            out_key="user_id",
        ),
        "cms_user_frequencies": cms_frequency_sql(
            table="events", key_col="user_id", w=256, d=4, kind="int", out_key="user_id"
        ),
    }


ORACLE_SQL.update(_family_oracles())
