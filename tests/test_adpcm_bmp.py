"""IMA ADPCM (stages/adpcm.py) and BMP (stages/multimodal.py) codec tests."""

from __future__ import annotations

import numpy as np
import pytest


class TestImaAdpcm:
    def test_decode_equals_encoder_reconstruction(self):
        from ddsketch_ruby_ray.stages.adpcm import encode_ima_adpcm_wav
        from ddsketch_ruby_ray.stages.multimodal import decode_wav_pcm16

        t = np.arange(3000)
        sig = (3000 * np.sin(t / 20) + 500 * np.sin(t / 3)).astype(np.int16)
        payload, recon = encode_ima_adpcm_wav(sig, rate=8000, block_align=128)
        rate, ch, out = decode_wav_pcm16(payload)
        assert (rate, ch) == (8000, 1)
        assert np.array_equal(out[:, 0], recon)

    def test_tracks_smooth_signal(self):
        from ddsketch_ruby_ray.stages.adpcm import encode_ima_adpcm_wav
        from ddsketch_ruby_ray.stages.multimodal import decode_wav_pcm16

        t = np.arange(2490)
        sig = (8000 * np.sin(t / 50)).astype(np.int16)
        payload, _ = encode_ima_adpcm_wav(sig, block_align=128)
        _, _, out = decode_wav_pcm16(payload)
        spb = (128 - 4) * 2 + 1
        kept = sig[: (len(sig) // spb) * spb].astype(np.int64)
        err = np.abs(out[:, 0].astype(np.int64) - kept)
        # after the per-block resync (header carries the exact first sample),
        # a 4-bit ADPCM should track a slow sine within ~2% full scale
        assert err.mean() < 300
        assert err.max() < 2000

    def test_nibble_decode_pinned(self):
        # hand-walked: pred=0, idx=0 (step 7)
        # nib 0 -> diff = 7>>3 = 0 -> pred 0, idx -1 -> 0
        # nib 7 -> diff = 0 + 7 + 3 + 1 = 11 -> pred 11, idx += 8 -> 8 (step 16)
        # nib 8 -> diff = 16>>3 = 2 -> pred 9, idx -1 -> 7
        from ddsketch_ruby_ray.stages.adpcm import ima_decode_nibbles

        out = ima_decode_nibbles([0, 7, 8], 0, 0)
        assert out.tolist() == [0, 11, 9]

    def test_clamping(self):
        from ddsketch_ruby_ray.stages.adpcm import ima_decode_nibbles

        out = ima_decode_nibbles([7] * 60, 30000, 88)
        assert out.max() <= 32767
        out = ima_decode_nibbles([15] * 60, -30000, 88)
        assert out.min() >= -32768

    def test_rejects_tiny_input(self):
        from ddsketch_ruby_ray.stages.adpcm import encode_ima_adpcm_wav

        with pytest.raises(ValueError):
            encode_ima_adpcm_wav(np.zeros(10, dtype=np.int16), block_align=128)


class TestBmp:
    def test_rgb24_round_trip(self):
        from ddsketch_ruby_ray.stages.multimodal import decode_bmp, encode_bmp

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)  # odd stride pad
        w, h, c, back = decode_bmp(encode_bmp(img))
        assert (w, h, c) == (17, 13, 3)
        assert np.array_equal(back, img)

    def test_rgb24_top_down(self):
        from ddsketch_ruby_ray.stages.multimodal import decode_bmp, encode_bmp

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
        _, _, _, back = decode_bmp(encode_bmp(img, top_down=True))
        assert np.array_equal(back, img)

    def test_palettized_gray(self):
        from ddsketch_ruby_ray.stages.multimodal import decode_bmp, encode_bmp

        rng = np.random.default_rng(3)
        gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
        w, h, c, back = decode_bmp(encode_bmp(gray, palettized=True))
        assert (w, h, c) == (11, 9, 3)
        assert np.array_equal(back, np.repeat(gray[:, :, None], 3, axis=2))

    def test_content_sensitivity(self):
        from ddsketch_ruby_ray.stages.multimodal import decode_bmp, encode_bmp

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img2 = img.copy()
        img2[2, 1, 0] = 255
        assert not np.array_equal(decode_bmp(encode_bmp(img))[3], decode_bmp(encode_bmp(img2))[3])

    def test_rejects_non_bmp(self):
        from ddsketch_ruby_ray.stages.multimodal import decode_bmp

        with pytest.raises(ValueError):
            decode_bmp(b"PNG whatever")


class TestSynthRouting:
    def test_new_formats_decode_strict(self, ray_session):
        """Every synthesized bmp / IMA-ADPCM row decodes under strict=True."""
        from ddsketch_ruby_ray.stages.multimodal import (
            AudioFeatureStage,
            ImageDecodeStage,
            synthesize_media_batch,
        )

        t = synthesize_media_batch({"id": np.arange(0, 512)})
        fmts = t.column("format").to_pylist()
        assert "bmp" in fmts
        imgs = t.filter(np.array([f == "bmp" for f in fmts]))
        out = ImageDecodeStage(strict=True)(imgs)
        assert out.num_rows == imgs.num_rows
        wavs = t.filter(np.array([f == "wav" for f in fmts]))
        ids = wavs.column("media_id").to_pylist()
        assert any(i % 24 == 22 for i in ids)  # the ADPCM lane is present
        aout = AudioFeatureStage(strict=True)(wavs)
        assert aout.num_rows == wavs.num_rows
