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
