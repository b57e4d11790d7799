"""Multimodal stage plumbing tests: schemas, actor-pool lifecycle, fan-out
layout, strict-mode stubs.  Decoders are stubbed (no codec libs in this
container); the Ray-side contracts are the real thing under test."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ddsketch_ruby_ray.stages.multimodal import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageDecodeStage,
    IMAGE_META_TYPE,
    synthesize_media_batch,
)


def _media_ds(n=64, blocks=4):
    import ray.data as rd

    return rd.range(n, override_num_blocks=blocks).map_batches(
        synthesize_media_batch, batch_format="numpy", batch_size=None
    )


class TestImageDecode:
    def test_actor_pool_decode_schema_and_determinism(self, ray_session):
        ds = _media_ds()
        out = ds.map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"embedding_dim": 8},
            concurrency=2,
            batch_size=16,
            batch_format="pyarrow",
        )
        t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
        assert t.schema.field("meta").type == IMAGE_META_TYPE
        assert t.num_rows == 64
        df = t.to_pandas().set_index("media_id").sort_index()
        # header round-trip: width derives from id
        assert df.loc[3, "meta"]["width"] == 32 + 3 % 7 * 16
        assert len(df.loc[0, "embedding"]) == 8
        # determinism across runs / layouts
        t2 = pa.concat_tables(
            _media_ds(blocks=7)
            .map_batches(
                ImageDecodeStage,
                fn_constructor_kwargs={"embedding_dim": 8},
                concurrency=2,
                batch_size=16,
                batch_format="pyarrow",
            )
            .iter_batches(batch_format="pyarrow")
        )
        df2 = t2.to_pandas().set_index("media_id").sort_index()
        assert (df["embedding"].apply(tuple) == df2["embedding"].apply(tuple)).all()

    def test_strict_mode_raises_without_codec(self, ray_session):
        with pytest.raises(NotImplementedError):
            ImageDecodeStage(strict=True)


class TestAudioAndFrames:
    def test_audio_features_shape(self, ray_session):
        out = _media_ds(n=16).map_batches(
            AudioFeatureStage, concurrency=2, batch_size=8, batch_format="pyarrow"
        )
        df = out.to_pandas()
        assert len(df) == 16
        assert all(len(f) == 8 for f in df["features"])
        assert all(0.0 <= x <= 1.0 for f in df["features"] for x in f)

    def test_frame_sampling_fanout(self, ray_session):
        out = _media_ds(n=10).map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"frames": 3},
            concurrency=2,
            batch_format="pyarrow",
        )
        df = out.to_pandas()
        assert len(df) == 30  # one row per (media, frame)
        assert set(df["frame"]) == {0, 1, 2}
        assert df["digest"].str.len().eq(16).all()

    def test_strict_modes(self, ray_session):
        with pytest.raises(NotImplementedError):
            AudioFeatureStage(strict=True)
        with pytest.raises(NotImplementedError):
            FrameSampleStage(strict=True)
