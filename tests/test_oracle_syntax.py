"""Every oracle must parse and bind against the table schemas.

A zero-cost sweep (DuckDB EXPLAIN over zero-row views) that catches SQL
typos, column renames, and binder regressions in any future oracle edit
without paying a full gate run."""

from __future__ import annotations

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_every_oracle_explains():
    import duckdb

    import ddsketch_ruby_ray.queries as q

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet' LIMIT 0"
        )
    bad = []
    for name, sql in q.ORACLE_SQL.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - report all binder errors
            bad.append((name, f"{type(e).__name__}: {e}"))
    assert not bad, "\n".join(f"{n}: {m}" for n, m in bad)


def test_registry_invariants():
    import ddsketch_ruby_ray.queries as q

    names = list(q.QUERIES)
    assert len(names) == len(set(names))
    missing = set(q.ORACLE_SQL) - set(q.QUERIES)
    assert not missing, f"oracles without queries: {missing}"
    rows_only = set(q.QUERIES) - set(q.ORACLE_SQL)
    # exactly the documented rows-only set
    assert rows_only == {"multimodal_media_features"}, rows_only
