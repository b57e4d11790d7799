"""Ray Data integration tests: DDSketchAgg through groupby/aggregate shuffles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ddsketch_ruby_ray.core import DDSketch
from ddsketch_ruby_ray.functions import DDSketchAgg
from ddsketch_ruby_ray.stages import unnest

pytestmark = pytest.mark.usefixtures("ray_session")


def _expected_by_group(df: pd.DataFrame, key: str, col: str, alpha=0.01, qs=(0.5, 0.9, 0.99)):
    out = {}
    for g, sub in df.groupby(key):
        sk = DDSketch(alpha)
        sk.add_batch(sub[col].to_numpy(dtype=np.float64))
        out[g] = sk
    return out


def test_groupby_ddsketch_matches_core(sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    res = unnest(
        ds.groupby("lang").aggregate(DDSketchAgg(on="n_chars", name="s")), columns=["s"]
    ).to_pandas().set_index("lang")

    df = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    expected = _expected_by_group(df, "lang", "n_chars")
    assert set(res.index) == set(expected)
    for lang, sk in expected.items():
        row = res.loc[lang]
        assert row["count"] == sk.count
        assert row["sum"] == sk.sum  # integer-valued -> exact
        assert row["min"] == sk.min and row["max"] == sk.max
        for q, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            # distributed merge tree must reproduce the single-process sketch
            assert row[name] == sk.get_quantile_value(q), (lang, name)


def test_global_aggregate(sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    res = ds.aggregate(DDSketchAgg(on="n_chars", name="s"))["s"]
    df = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    sk = DDSketch(0.01)
    sk.add_batch(df["n_chars"].to_numpy(dtype=np.float64))
    assert res["count"] == sk.count
    assert res["p50"] == sk.get_quantile_value(0.5)


def test_weighted_aggregate(ray_session):
    import ray.data as rd

    rows = [{"v": float(v), "w": 1.0 + (v % 3)} for v in range(1, 200)]
    ds = rd.from_items(rows)
    res = ds.aggregate(DDSketchAgg(on="v", weight="w", name="s"))["s"]
    sk = DDSketch(0.01)
    vals = np.array([r["v"] for r in rows])
    ws = np.array([r["w"] for r in rows])
    sk.add_batch(vals, ws)
    assert res["count"] == sk.count
    assert res["p90"] == sk.get_quantile_value(0.9)
    assert res["sum"] == pytest.approx(sk.sum, rel=1e-12)


def test_many_blocks_merge_identical(ray_session):
    """Result independent of block layout (merge-tree order invariance)."""
    import ray.data as rd

    vals = np.round(np.random.default_rng(3).lognormal(3, 1, 5000)).astype(np.float64)

    def run(nblocks):
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(nblocks)
        return ds.aggregate(DDSketchAgg(on="v", name="s"))["s"]

    a, b = run(1), run(17)
    assert a == b
