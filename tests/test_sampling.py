"""Deterministic hash split / stratified sampling tests (stages/sampling.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs(n=1000, langs=("en", "de", "zh")):
    rng = np.random.default_rng(3)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(rng.choice(langs, n).tolist(), pa.string()),
        }
    )


class TestAssignSplit:
    def test_layout_invariant_and_fractions(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.stages.sampling import assign_split

        t = _docs(4000)
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = (
            assign_split(rd.from_arrow(t), id_col="doc_id", splits=splits)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            assign_split(rd.from_arrow(t).repartition(7), id_col="doc_id", splits=splits)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert (a["split"] == b["split"]).all()  # pure function of doc_id
        frac = a["split"].value_counts(normalize=True)
        assert 0.75 < frac["train"] < 0.85
        assert 0.07 < frac["val"] < 0.13

    def test_bad_fractions_raise(self, ray_session):
        from ddsketch_ruby_ray.stages.sampling import split_thresholds

        with pytest.raises(ValueError):
            split_thresholds([0.5, 0.3])
        with pytest.raises(ValueError):
            split_thresholds([1.2, -0.2])

    def test_thresholds_cover_domain(self):
        from ddsketch_ruby_ray.stages.sampling import split_thresholds

        th = split_thresholds([0.8, 0.1, 0.1])
        assert th[-1] == 1 << 64 and th == sorted(th)


class TestStratifiedSample:
    def test_rates_and_determinism(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.stages.sampling import stratified_sample

        t = _docs(3000)
        kw = dict(id_col="doc_id", group_col="lang",
                  rates={"en": 0.2, "zh": 1.0}, default_rate=0.5)
        a = (
            stratified_sample(rd.from_arrow(t), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            stratified_sample(rd.from_arrow(t).repartition(9), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert (a["doc_id"] == b["doc_id"]).all()
        df = t.to_pandas()
        n_by = df.groupby("lang").size()
        got = a.groupby("lang").size()
        assert got["zh"] == n_by["zh"]  # rate 1.0 keeps every row
        assert 0.1 < got["en"] / n_by["en"] < 0.3
        assert 0.4 < got["de"] / n_by["de"] < 0.6

    def test_zero_default_drops_unlisted(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.stages.sampling import stratified_sample

        out = stratified_sample(
            rd.from_arrow(_docs(500)), id_col="doc_id", group_col="lang",
            rates={"zh": 1.0},
        ).to_pandas()
        assert set(out["lang"]) == {"zh"}


class TestMixtureRebalance:
    def _ds(self, langs, n_per):
        import ray.data as rd

        ids, gs = [], []
        i = 0
        for lang, n in zip(langs, n_per):
            for _ in range(n):
                ids.append(i)
                gs.append(lang)
                i += 1
        return rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "lang": pa.array(gs)})
        )

    def test_exact_quotas_and_binding_group(self, ray_session):
        from ddsketch_ruby_ray.stages.sampling import mixture_rebalance

        # weights 2:1:1 over counts 30:100:50 -> binding = a (30/2=15)
        # quotas: a=30, b=15, c=15
        ds = self._ds(["a", "b", "c"], [30, 100, 50])
        out = mixture_rebalance(
            ds, id_col="doc_id", group_col="lang",
            weights={"a": 2, "b": 1, "c": 1}, seed=3,
        ).to_pandas()
        got = out.groupby("lang").size().to_dict()
        assert got == {"a": 30, "b": 15, "c": 15}

    def test_deterministic_across_layouts(self, ray_session):
        from ddsketch_ruby_ray.stages.sampling import mixture_rebalance

        ds = self._ds(["a", "b"], [40, 90])
        kw = dict(id_col="doc_id", group_col="lang", weights={"a": 1, "b": 2}, seed=3)
        d1 = mixture_rebalance(ds, **kw).to_pandas().sort_values("doc_id").reset_index(drop=True)
        d2 = (
            mixture_rebalance(ds.repartition(7), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert d1.equals(d2)

    def test_unweighted_groups_dropped_and_infeasible_empty(self, ray_session):
        from ddsketch_ruby_ray.stages.sampling import mixture_rebalance

        ds = self._ds(["a", "b"], [20, 20])
        out = mixture_rebalance(
            ds, id_col="doc_id", group_col="lang", weights={"a": 1}, seed=3
        ).to_pandas()
        assert set(out.lang) == {"a"} and len(out) == 20
        # a weighted lang with zero rows makes the target mixture infeasible
        empty = mixture_rebalance(
            ds, id_col="doc_id", group_col="lang",
            weights={"a": 1, "zz": 1}, seed=3,
        ).to_pandas()
        assert len(empty) == 0

    def test_per_group_k_dict_matches_scalar(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.topk import per_group_topk

        rng = np.random.default_rng(5)
        t = pa.table(
            {
                "g": pa.array(rng.choice(["x", "y"], 200).tolist()),
                "v": pa.array(rng.permutation(200).astype(np.int64)),
                "id": pa.array(np.arange(200, dtype=np.int64)),
            }
        )
        ds = rd.from_arrow(t).repartition(5)
        a = per_group_topk(ds, group_col="g", value_col="v", tiebreak_col="id", k=7)
        b = per_group_topk(
            ds, group_col="g", value_col="v", tiebreak_col="id", k={"x": 7, "y": 7}
        )
        pa_ = a.to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
        pb = b.to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
        assert pa_.equals(pb)
        # asymmetric quotas: y gets none
        c = per_group_topk(
            ds, group_col="g", value_col="v", tiebreak_col="id", k={"x": 3}
        ).to_pandas()
        assert set(c.g) == {"x"} and len(c) == 3
