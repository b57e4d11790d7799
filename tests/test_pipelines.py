"""Pipeline-level tests: corpus synthesis determinism, flagship pipeline,
sha256 row invariant, oracle SQL equivalence at the smallest scale."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest

from ddsketch_ruby_ray.sources import corpus_dataset
from ddsketch_ruby_ray.stages import add_sha256, derive_content_metrics
from ddsketch_ruby_ray.pipelines import corpus_sketch_pipeline

pytestmark = pytest.mark.usefixtures("ray_session")


def test_corpus_deterministic_across_block_layouts():
    a = corpus_dataset(2000, override_num_blocks=2).to_pandas().sort_values("path").reset_index(drop=True)
    b = corpus_dataset(2000, override_num_blocks=7).to_pandas().sort_values("path").reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"repo", "path", "commit", "lang", "content"}
    # Zipf skew: top language has a large share
    share = a["lang"].value_counts(normalize=True)
    assert share.iloc[0] > 0.25
    assert (a["content"] == "").mean() < 0.05


def test_corpus_flagship_pipeline_and_invariant():
    ds = corpus_dataset(3000, override_num_blocks=4)
    out = corpus_sketch_pipeline(ds, group_keys=("lang",), alpha=0.02).to_pandas()
    assert {"lang", "bytes_count", "bytes_p99", "lines_p50"} <= set(out.columns)
    assert out["bytes_count"].sum() == 3000

    # per-row sha256 invariant: derived columns never disturb content
    src = corpus_dataset(500, override_num_blocks=2)
    staged = src.map_batches(
        lambda t: add_sha256(derive_content_metrics(t)), batch_format="pyarrow"
    ).to_pandas()
    for _, row in staged.sample(50, random_state=7).iterrows():
        assert hashlib.sha256(row["content"].encode()).hexdigest() == row["sha256"]
    assert (staged["content_bytes"] == staged["content"].str.encode("utf-8").str.len()).all()


def test_quantile_accuracy_against_exact(sf_dir):
    """End-to-end accuracy contract: pipeline quantiles within alpha of truth."""
    from ddsketch_ruby_ray.queries import dd_quantiles_by_lang

    import pandas as pd

    from .datasets import accuracy_ok, true_quantile

    out = dd_quantiles_by_lang(sf_dir).to_pandas().set_index("lang")
    df = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    for lang, sub in df.groupby("lang"):
        vals = sub["n_chars"].to_numpy()
        for q, est_col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            est = out.loc[lang, est_col]
            true = true_quantile(vals, q)
            assert accuracy_ok(est, true, 0.01), (lang, est_col, est, true)


def test_null_group_keys_through_states_strategy():
    """NULL group keys survive the default (states) strategy's shuffle as
    their own group, matching SQL GROUP BY semantics, and never collide with
    the fill default ('' for strings)."""
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ruby_ray.functions.specs import DDSketchSpec
    from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

    t = pa.table(
        {
            "k": pa.array(["a", None, "a", None, "b", "", None], pa.string()),
            "v": pa.array([1.0, 10.0, 3.0, 30.0, 5.0, 7.0, 50.0]),
        }
    )
    spec = DDSketchSpec(on="v", name="s", relative_accuracy=0.01, quantiles=(0.5,))
    out = (
        grouped_sketch_pipeline(rd.from_arrow(t).repartition(3), [spec], ("k",))
        .to_pandas()
        .set_index("k", drop=False)
    )
    assert len(out) == 4  # 'a', 'b', '', and the null group
    counts = {
        (None if k != k or k is None else k): c
        for k, c in zip(out["k"], out["count"])
    }
    assert counts[None] == 3  # nulls form ONE group
    assert counts["a"] == 2
    assert counts[""] == 1  # empty string does NOT merge with null


def test_null_group_keys_int_and_multi_key():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ddsketch_ruby_ray.functions.specs import DDSketchSpec
    from ddsketch_ruby_ray.pipelines import grouped_sketch_pipeline

    t = pa.table(
        {
            "g1": pa.array([1, None, 1, None, 0], pa.int64()),
            "g2": pa.array(["x", "x", None, None, "x"], pa.string()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    spec = DDSketchSpec(on="v", name="s", relative_accuracy=0.01, quantiles=())
    out = grouped_sketch_pipeline(rd.from_arrow(t).repartition(2), [spec], ("g1", "g2")).to_pandas()
    assert len(out) == 5  # every (g1, g2) combination incl. null sides
    # the (None, None) group exists with count 1 and the 0 fill didn't collide
    mask = out["g1"].isna() & out["g2"].isna()
    assert mask.sum() == 1 and out.loc[mask, "count"].iloc[0] == 1.0
    zero = out[(out["g1"] == 0) & (out["g2"] == "x")]
    assert len(zero) == 1 and zero["count"].iloc[0] == 1.0
