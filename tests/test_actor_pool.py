"""Actor-pool accumulate path (input_hint: stateful stages as actor pools).

``sketch_states(..., concurrency=N)`` runs SketchStateAccumulator as an actor
pool (setup once per actor); results must be identical to the task path.
"""

from __future__ import annotations

import numpy as np


class TestActorPool:
    def test_actor_pool_matches_task_path(self, ray_session, sf_dir):
        import ray.data as rd

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        def run(concurrency):
            ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
            out = grouped_sketch_pipeline(
                ds,
                [DDSketchSpec(on="n_chars", name="s", quantiles=(0.5, 0.99))],
                ("lang",),
                concurrency=concurrency,
            )
            return out.to_pandas().sort_values("lang").reset_index(drop=True)

        tasks = run(None)
        actors = run(2)
        assert (tasks.values == actors.values).all()


class TestStrategies:
    def test_rows_strategy_identical_to_states(self, ray_session, sf_dir):
        """High-cardinality plan (raw-row groupby) == two-level state merge."""
        import ray.data as rd

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.functions.family_specs import HLLSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        def run(strategy):
            ds = rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["lang", "n_chars", "doc_id"]
            )
            out = grouped_sketch_pipeline(
                ds,
                [
                    DDSketchSpec(on="n_chars", name="s", quantiles=(0.5, 0.99)),
                    HLLSpec(on="doc_id", name="h", p=12),
                ],
                ("lang",),
                strategy=strategy,
            )
            df = out.to_pandas().sort_values("lang").reset_index(drop=True)
            return df[sorted(df.columns)]

        a, b = run("states"), run("rows")
        assert list(a.columns) == list(b.columns)
        assert (a.values == b.values).all()

    def test_pairs_strategy_identical_incl_signed_and_zero(self, ray_session):
        """The vectorized extreme-cardinality plan == states, with negative
        values, a zero band, many groups, and empty-side groups."""
        import pyarrow as pa
        import ray.data as rd
        import numpy as np

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        rng = np.random.default_rng(5)
        n = 20_000
        tbl = pa.table(
            {
                "grp": pa.array([f"g{int(i)}" for i in rng.integers(0, 500, n)]),
                "v": pa.array(
                    np.where(
                        rng.random(n) < 0.05,
                        0.0,
                        rng.normal(0, 100, n),  # signed, spans the zero band
                    )
                ),
            }
        )
        specs = [DDSketchSpec(on="v", name="s", quantiles=(0.01, 0.5, 0.99))]

        def run(strategy):
            df = grouped_sketch_pipeline(
                rd.from_arrow(tbl).repartition(7), specs, ("grp",), strategy=strategy
            ).to_pandas()
            df = df.sort_values("grp").reset_index(drop=True)
            return df[sorted(df.columns)]

        self._assert_frames(run("states"), run("pairs"))

    def test_pairs_weighted_matches_states(self, ray_session, sf_dir):
        import ray.data as rd

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        spec = DDSketchSpec(
            on="l_extendedprice", weight="l_quantity", name="s",
            quantiles=(0.5, 0.99), include_sum_avg=False,
        )

        def run(strategy):
            ds = rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_returnflag", "l_extendedprice", "l_quantity"],
            )
            df = grouped_sketch_pipeline(
                ds, [spec], ("l_returnflag",), strategy=strategy
            ).to_pandas()
            return df.sort_values("l_returnflag").reset_index(drop=True)[
                sorted(df.columns)
            ]

        a, b = run("states"), run("pairs")
        assert (a.values == b.values).all()  # integer weights -> bit-exact

    def test_salted_rows_identical_on_skewed_keys(self, ray_session):
        """salt=K splits a hot key over K phase-1 groups; the phase-2 state
        merge restores the identical result (SURVEY §4.2 skew answer)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        rng = np.random.default_rng(1)
        n = 20_000
        hot = rng.random(n) < 0.8
        keys = np.where(hot, "hotkey", np.array([f"k{i % 100}" for i in range(n)]))
        tbl = pa.table({"g": pa.array(keys.tolist()), "v": pa.array(rng.lognormal(0, 1, n))})
        spec = DDSketchSpec(on="v", name="s", quantiles=(0.5, 0.99), include_sum_avg=False)

        def run(**kw):
            df = grouped_sketch_pipeline(
                rd.from_arrow(tbl).repartition(7), [spec], ("g",), strategy="rows", **kw
            ).to_pandas()
            return df.sort_values("g").reset_index(drop=True)[sorted(df.columns)]

        a, b = run(), run(salt=8)
        assert (a.values == b.values).all()

    def test_pairs_collapsing_stores_identical(self, ray_session):
        """Collapsing clamp model at finalize == collapse-during-accumulate,
        with collapse heavily triggered on both stores (signed, limit 32)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        rng = np.random.default_rng(2)
        n = 20_000
        v = np.where(rng.random(n) < 0.5, rng.lognormal(0, 4, n), -rng.lognormal(0, 4, n))
        v[rng.random(n) < 0.02] = 0.0
        tbl = pa.table({"g": pa.array([f"g{i % 40}" for i in range(n)]), "v": pa.array(v)})
        for store in ("collapse_lowest", "collapse_highest"):
            spec = DDSketchSpec(
                on="v", name="s", store=store, bin_limit=32,
                quantiles=(0.01, 0.5, 0.99), include_sum_avg=False,
            )

            def run(strategy):
                df = grouped_sketch_pipeline(
                    rd.from_arrow(tbl).repartition(9), [spec], ("g",), strategy=strategy
                ).to_pandas()
                return df.sort_values("g").reset_index(drop=True)[sorted(df.columns)]

            self._assert_frames(run("states"), run("pairs"))

    def test_null_keys_and_values(self, ray_session):
        """Null group keys group like SQL GROUP BY in the rows strategy;
        null values drop per spec; the states path documents that Ray's
        sort-shuffle cannot order null keys."""
        import pyarrow as pa
        import ray.data as rd

        from ddsketch_ruby_ray.functions.specs import DDSketchSpec
        from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

        tbl = pa.table(
            {
                "g": pa.array(["a", None, "b", "a", None]),
                "v": pa.array([1.0, 2.0, None, 4.0, 5.0]),
            }
        )
        spec = DDSketchSpec(on="v", name="s", quantiles=(0.5,))
        df = (
            grouped_sketch_pipeline(rd.from_arrow(tbl), [spec], ("g",), strategy="rows")
            .to_pandas()
            .set_index("g")
        )
        assert df.loc["a", "count"] == 2
        assert df.loc["b", "count"] == 0  # its only value was null
        assert df[df.index.isnull()]["count"].iloc[0] == 2

    def _assert_frames(self, a, b):
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if c in ("sum", "avg"):
                # fractional values: fp summation ORDER differs between plans;
                # only integer-valued metrics are bit-stable (and fractional
                # driver queries exclude sum/avg for exactly this reason)
                assert np.allclose(av, bv, rtol=1e-9), c
            elif a[c].dtype.kind == "f":
                assert ((av == bv) | (np.isnan(av) & np.isnan(bv))).all(), c
            else:
                assert (av == bv).all(), c
