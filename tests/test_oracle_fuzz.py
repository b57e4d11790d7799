"""Randomized fuzz of the DDSketch SQL oracle across extreme magnitudes.

The driver gate uses fixed tables; this hammers the full signed pipeline +
oracle with values spanning 600 decades (1e-300..1e300, both signs, zeros) -
bucket keys from ~-34500 to ~+34500, the widest the mapping ever sees.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TestDDSketchOracleFuzz:
    def test_extreme_magnitude_signed(self, ray_session):
        import duckdb
        import ray.data as rd

        from ddsketch_ruby_ray.functions.oracle import ddsketch_quantile_sql
        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        rng = np.random.default_rng(21)
        n = 20_000
        mag = 10.0 ** rng.uniform(-300, 300, n)
        sign = np.where(rng.random(n) < 0.4, -1.0, 1.0)
        v = mag * sign
        v[rng.random(n) < 0.03] = 0.0
        tbl = pa.table({"g": pa.array([f"g{i % 7}" for i in range(n)]), "v": pa.array(v)})
        con = duckdb.connect()
        con.register("ta", tbl)
        con.sql("CREATE VIEW t AS SELECT * FROM ta")
        Q = (0.001, 0.25, 0.5, 0.75, 0.999)
        spec = DDSketchSpec(on="v", name="s", quantiles=Q, include_sum_avg=False)
        mine = grouped_sketch_pipeline(
            rd.from_arrow(tbl).repartition(6), [spec], ("g",)
        ).to_pandas()
        theirs = con.sql(
            ddsketch_quantile_sql(
                table="t", group_col="g", value_expr="v",
                quantiles=Q, include_sum_avg=False, signed=True,
            )
        ).df()
        a = mine[sorted(mine.columns)].sort_values("g").reset_index(drop=True)
        b = theirs[sorted(theirs.columns)].sort_values("g").reset_index(drop=True)
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if a[c].dtype.kind == "f":
                assert ((av == bv) | (np.isnan(av) & np.isnan(bv))).all(), c
            else:
                assert (av == bv).all(), c


class TestRankEstimateOracleFuzz:
    """Bit-exactness of the t-digest / KLL quantile-ESTIMATE oracles
    (functions/rank_oracle.py) against the canonical buckets=1 build, across
    group sizes that cross the compaction thresholds (n <= k, one compress,
    multi-halving KLL cascades)."""

    def _run(self, pipeline_spec, sql, seed):
        import duckdb
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.canonical import canonical_sketch_pipeline

        rng = np.random.default_rng(seed)
        sizes = [1, 2, 3, 199, 200, 201, 334, 335, 1600, 4321]
        rows_g, rows_id, rows_v = [], [], []
        next_id = 0
        for gi, sz in enumerate(sizes):
            rows_g += [f"g{gi}"] * sz
            rows_id += list(range(next_id, next_id + sz))
            next_id += sz
            rows_v += rng.integers(0, 50_000, size=sz).tolist()
        tbl = pa.table(
            {
                "g": pa.array(rows_g),
                "doc_id": pa.array(rows_id, pa.int64()),
                "v": pa.array(rows_v, pa.int64()),
            }
        )
        con = duckdb.connect()
        con.register("ta", tbl)
        con.sql("CREATE VIEW t AS SELECT * FROM ta")
        mine = canonical_sketch_pipeline(
            rd.from_arrow(tbl).repartition(7),
            pipeline_spec,
            ("g",),
            id_col="doc_id",
            buckets=1,
        ).to_pandas()
        theirs = con.sql(sql).df()
        a = mine[sorted(mine.columns)].sort_values("g").reset_index(drop=True)
        b = theirs[sorted(theirs.columns)].sort_values("g").reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            assert (av == bv).all(), (c, av, bv)

    def test_tdigest_estimate_bit_exact(self, ray_session):
        from ddsketch_ruby_ray.functions.family_specs import TDigestSpec
        from ddsketch_ruby_ray.functions.rank_oracle import tdigest_group_quantiles_sql

        Q = (0.01, 0.5, 0.9, 0.99)
        self._run(
            TDigestSpec(on="v", name="t", quantiles=Q),
            tdigest_group_quantiles_sql(table="t", key="g", value="v", quantiles=Q),
            seed=31,
        )

    def test_kll_estimate_bit_exact(self, ray_session):
        from ddsketch_ruby_ray.functions.family_specs import KLLSpec
        from ddsketch_ruby_ray.functions.rank_oracle import kll_group_quantiles_sql

        Q = (0.01, 0.5, 0.9, 0.99)
        self._run(
            KLLSpec(on="v", name="k", quantiles=Q),
            kll_group_quantiles_sql(table="t", key="g", value="v", quantiles=Q),
            seed=32,
        )
