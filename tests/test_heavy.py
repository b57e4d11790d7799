"""Heavy-hitters pipeline tests (pipelines/heavy.py).

The sf0.01 oracle queries verify the end-to-end result; these isolate the
guarantee itself: zipf-skewed data vs DuckDB under aggressive per-block
truncation, layout invariance, string keys, and degenerate inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _run(table: pa.Table, key_col: str, phi: float, blocks: int = 8, **kw):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.heavy import heavy_hitters_pipeline

    ds = rd.from_arrow(table)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = heavy_hitters_pipeline(ds, key_col=key_col, phi=phi, **kw)
    return out.to_pandas().sort_values(key_col).reset_index(drop=True)


def _expect(table: pa.Table, key_col: str, phi: float):
    import duckdb

    con = duckdb.connect()
    con.register("t", table.to_pandas())
    return (
        con.execute(
            f"""SELECT {key_col}, count(*) AS "count" FROM t GROUP BY {key_col}
                HAVING count(*) >= ceil({phi} * (SELECT count(*) FROM t))
                ORDER BY {key_col}"""
        )
        .fetchdf()
        .reset_index(drop=True)
    )


class TestHeavyHitters:
    def test_zipf_matches_duckdb_under_truncation(self, ray_session):
        rng = np.random.default_rng(5)
        keys = np.minimum(rng.zipf(1.5, 20_000), 10_000).astype(np.int64)
        t = pa.table({"k": keys})
        for phi in (0.01, 0.05):
            got = _run(t, "k", phi, blocks=16)
            exp = _expect(t, "k", phi)
            assert got["k"].tolist() == exp["k"].tolist()
            assert got["count"].tolist() == exp["count"].tolist()

    def test_layout_invariance(self, ray_session):
        rng = np.random.default_rng(6)
        keys = np.minimum(rng.zipf(1.3, 5_000), 500).astype(np.int64)
        t = pa.table({"k": keys})
        results = [_run(t, "k", 0.02, blocks=b) for b in (1, 3, 13)]
        for r in results[1:]:
            assert r.equals(results[0])

    def test_string_keys(self, ray_session):
        keys = ["hot"] * 60 + ["warm"] * 25 + [f"cold{i}" for i in range(15)]
        t = pa.table({"k": pa.array(keys)})
        got = _run(t, "k", 0.2, blocks=4)
        assert got["k"].tolist() == ["hot", "warm"] and got["count"].tolist() == [60, 25]

    def test_counters_clamped_to_guarantee(self, ray_session):
        # counters=2 passed explicitly must be raised to 2/phi internally:
        # with phi=0.01 a 2-counter MG block summary would miss hitters.
        rng = np.random.default_rng(7)
        keys = np.minimum(rng.zipf(1.5, 10_000), 2_000).astype(np.int64)
        t = pa.table({"k": keys})
        got = _run(t, "k", 0.01, blocks=16, counters=2)
        exp = _expect(t, "k", 0.01)
        assert got["k"].tolist() == exp["k"].tolist()

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.heavy import heavy_hitters_pipeline

        t = pa.table({"k": pa.array([], type=pa.int64())})
        out = heavy_hitters_pipeline(rd.from_arrow(t), key_col="k", phi=0.1)
        # (ray's to_pandas drops columns on an empty dataset; check the schema)
        assert out.count() == 0
        assert [f.name for f in out.schema().base_schema] == ["k", "count"]

    def test_invalid_phi(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.heavy import heavy_hitters_pipeline

        with pytest.raises(ValueError):
            heavy_hitters_pipeline(
                rd.from_arrow(pa.table({"k": [1]})), key_col="k", phi=0.0
            )
