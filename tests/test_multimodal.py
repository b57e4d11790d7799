"""Multimodal stage tests: REAL pure-numpy decoders for uncompressed formats
(PPM/PGM, WAV PCM-16, Y4M) + the deterministic stub for compressed blobs,
plus the Ray-side contracts (schemas, actor-pool lifecycle, fan-out)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ruby_ray.stages.multimodal import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageDecodeStage,
    IMAGE_META_TYPE,
    PNG_SIG,
    decode_netpbm,
    decode_png,
    decode_wav_pcm16,
    encode_png,
    parse_y4m,
    synthesize_media_batch,
)


def _media_tbl(n=64):
    return synthesize_media_batch({"id": np.arange(n)})


def _media_ds(n=64, blocks=4):
    import ray.data as rd

    return rd.range(n, override_num_blocks=blocks).map_batches(
        synthesize_media_batch, batch_format="numpy", batch_size=None
    )


class TestRealDecoders:
    def test_ppm_round_trip(self):
        img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
        payload = b"P6\n# c\n5 4\n255\n" + img.tobytes()
        w, h, c, out = decode_netpbm(payload)
        assert (w, h, c) == (5, 4, 3) and (out == img).all()

    def test_pgm_round_trip(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
        w, h, c, out = decode_netpbm(b"P5\n4 3\n255\n" + img.tobytes())
        assert (w, h, c) == (4, 3, 1) and (out == img).all()

    def test_wav_round_trip(self):
        import struct

        pcm = (np.arange(100, dtype=np.int16) - 50).astype("<i2")
        data = pcm.tobytes()
        payload = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        rate, ch, samples = decode_wav_pcm16(payload)
        assert (rate, ch) == (8000, 1) and (samples[:, 0] == pcm).all()

    def test_y4m_frames(self):
        w, h = 4, 2
        frame = w * h + 2 * ((w // 2) * (h // 2))
        f0 = np.arange(frame, dtype=np.uint8)
        f1 = f0[::-1].copy()
        payload = (
            b"YUV4MPEG2 W4 H2 F25:1 C420\n"
            + b"FRAME\n" + f0.tobytes() + b"FRAME\n" + f1.tobytes()
        )
        ww, hh, ys = parse_y4m(payload)
        assert (ww, hh) == (4, 2) and len(ys) == 2
        assert (ys[0] == f0[: w * h].reshape(h, w)).all()

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError):
            decode_netpbm(b"XXnope")
        with pytest.raises(ValueError):
            decode_wav_pcm16(b"nope")
        with pytest.raises(ValueError):
            parse_y4m(b"nope")
        with pytest.raises(ValueError):
            decode_png(b"nope")

    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    @pytest.mark.parametrize("ftype", [0, 2])
    def test_png_round_trip_color_types(self, c, ftype):
        rng = np.random.default_rng(7 * c + ftype)
        img = rng.integers(0, 256, size=(9, 7, c), dtype=np.uint8)
        w, h, cc, out = decode_png(encode_png(img, filter_type=ftype))
        assert (w, h, cc) == (7, 9, c) and (out == img).all()

    @pytest.mark.parametrize("ftype", [1, 3, 4])
    @pytest.mark.parametrize("c", [1, 3])
    def test_png_unfilters_sub_average_paeth(self, ftype, c):
        """Forward-filter scanlines per the spec in the test, assert the
        decoder inverts them (covers the filters encode_png doesn't emit)."""
        import struct
        import zlib

        rng = np.random.default_rng(13 * ftype + c)
        h, w = 6, 5
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        flat = img.reshape(h, w * c).astype(np.int64)
        scan = bytearray()
        prev = np.zeros(w * c, dtype=np.int64)
        for y in range(h):
            raw = flat[y]
            filt = np.empty(w * c, dtype=np.int64)
            for x in range(w * c):
                a = raw[x - c] if x >= c else 0  # left (recon == raw here)
                b = prev[x]
                cc_ = prev[x - c] if x >= c else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - cc_
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc_)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc_)
                filt[x] = (raw[x] - pred) & 0xFF
            scan += bytes([ftype]) + filt.astype(np.uint8).tobytes()
            prev = raw

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        color = {1: 0, 3: 2}[c]
        payload = (
            PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )
        ww, hh, cc2, out = decode_png(payload)
        assert (ww, hh, cc2) == (w, h, c) and (out == img).all()

    def test_png_rejects_unsupported(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        good = encode_png(img)
        # flip IHDR depth byte 8 -> 16 (offset: 8 sig + 8 len/type + 8 w/h)
        bad_depth = bytearray(good)
        bad_depth[24] = 16
        with pytest.raises(ValueError):
            decode_png(bytes(bad_depth))
        bad_interlace = bytearray(good)
        bad_interlace[28] = 1
        with pytest.raises(ValueError):
            decode_png(bytes(bad_interlace))


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
        # REAL decode: header dims round-trip for the P6 row id=4
        assert df.loc[4, "meta"]["width"] == 16 + 4 % 7 * 8
        assert df.loc[4, "meta"]["height"] == 16 + 4 % 5 * 8
        assert df.loc[4, "meta"]["channels"] == 3
        assert df.loc[1, "meta"]["channels"] == 1  # P5 gray
        # REAL baseline JPEG decode: id=7 is a grayscale 4:4:4 JPEG
        assert df.loc[7, "meta"]["width"] == 16 + 7 % 7 * 8
        assert df.loc[7, "meta"]["height"] == 16 + 7 % 5 * 8
        assert df.loc[7, "meta"]["channels"] == 1
        assert df.loc[23, "meta"]["channels"] == 3  # RGB 4:2:0 JPEG
        assert df.loc[15, "meta"]["width"] == 0  # unknown-format stub row
        # REAL PNG decode: id=5 is a zlib-compressed RGB PNG
        assert df.loc[5, "meta"]["width"] == 16 + 5 % 7 * 8
        assert df.loc[5, "meta"]["channels"] == 3
        assert df.loc[13, "meta"]["channels"] == 1  # gray / Up-filter PNG
        # REAL GIF decode: id=11 interlaced, id=27 non-interlaced
        assert df.loc[11, "meta"]["width"] == 16 + 11 % 7 * 8
        assert df.loc[11, "meta"]["height"] == 16 + 11 % 5 * 8
        assert df.loc[11, "meta"]["channels"] == 3
        assert df.loc[27, "meta"]["channels"] == 3
        assert len(df.loc[0, "embedding"]) == 8
        assert all(0.0 <= x <= 1.0 for x in df.loc[0, "embedding"])
        # determinism across block layouts
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

    def test_pixel_embedding_reflects_content(self, ray_session):
        dark = b"P5\n4 4\n255\n" + bytes(16)
        bright = b"P5\n4 4\n255\n" + bytes([255] * 16)
        stage = ImageDecodeStage(embedding_dim=4)
        _, e_dark = stage._decode_one(dark, "pgm")
        _, e_bright = stage._decode_one(bright, "pgm")
        assert all(x == 0.0 for x in e_dark)
        assert all(x == 1.0 for x in e_bright)

    def test_strict_raises_only_for_compressed(self, ray_session):
        stage = ImageDecodeStage(strict=True)
        meta, _ = stage._decode_one(b"P5\n2 2\n255\n" + bytes(4), "pgm")
        assert meta["width"] == 2
        # PNG is a REAL decode path now — strict mode accepts it
        png = encode_png(np.zeros((2, 3, 1), dtype=np.uint8))
        meta, _ = stage._decode_one(png, "png")
        assert (meta["width"], meta["height"]) == (3, 2)
        with pytest.raises(NotImplementedError):
            stage._decode_one(b"JUNKxxxx", "jpeg")


class TestAudioAndFrames:
    def test_wav_features_real_rms(self, ray_session):
        t = _media_tbl(64)
        wav_rows = t.filter(pa.compute.equal(t.column("format"), "wav"))
        out = AudioFeatureStage(n_features=8)(wav_rows)
        df = out.to_pandas()
        assert len(df) == wav_rows.num_rows
        assert all(len(f) == 8 for f in df["features"])
        assert all(0.0 <= x <= 1.0 for f in df["features"] for x in f)
        # strict mode is fine on real WAV
        AudioFeatureStage(n_features=4, strict=True)(wav_rows)

    def test_audio_strict_raises_on_non_wav(self, ray_session):
        t = _media_tbl(16)
        jpeg = t.filter(pa.compute.equal(t.column("format"), "jpeg"))
        with pytest.raises(NotImplementedError):
            AudioFeatureStage(strict=True)(jpeg)

    def test_frame_sampling_fanout_real_y4m(self, ray_session):
        t = _media_tbl(64)
        vids = t.filter(pa.compute.equal(t.column("format"), "y4m"))
        out = FrameSampleStage(frames=3, strict=True)(vids)  # real frames
        df = out.to_pandas()
        assert len(df) == 3 * vids.num_rows
        assert set(df["frame"]) == {0, 1, 2}
        assert df["digest"].str.len().eq(16).all()
        # first and last sampled frames differ (distinct noise per frame)
        one = df[df.media_id == df.media_id.iloc[0]]
        assert one.iloc[0]["digest"] != one.iloc[2]["digest"]

    def test_video_strict_raises_on_unknown(self, ray_session):
        t = _media_tbl(16)
        jpeg = t.filter(pa.compute.equal(t.column("format"), "jpeg"))
        with pytest.raises(NotImplementedError):
            FrameSampleStage(strict=True)(jpeg)

    def test_stage_fanout_through_ray(self, ray_session):
        out = _media_ds(n=10).map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"frames": 3},
            concurrency=2,
            batch_format="pyarrow",
        )
        df = out.to_pandas()
        assert len(df) == 30  # one row per (media, frame)


class TestJPEGCodec:
    """Baseline JFIF codec (stages/jpeg.py): pure-numpy encode + decode."""

    def test_constant_images_round_trip_tightly(self):
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg

        for val in (0, 63, 128, 200, 255):
            img = np.full((24, 40, 1), val, dtype=np.uint8)
            w, h, c, out = decode_jpeg(encode_jpeg(img))
            assert (w, h, c) == (40, 24, 1)
            assert np.abs(out.astype(int) - int(val)).max() <= 1

    @pytest.mark.parametrize("subsample", [False, True])
    def test_smooth_rgb_round_trip(self, subsample):
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg

        yy, xx = np.mgrid[0:33, 0:47]
        img = np.stack(
            [np.minimum(yy * 3, 255), np.minimum(xx * 2, 255),
             np.minimum(yy + xx, 255)],
            axis=-1,
        ).astype(np.uint8)
        payload = encode_jpeg(img, subsample=subsample)
        w, h, c, out = decode_jpeg(payload)
        assert (w, h, c) == (47, 33, 3)
        # q50 quantization + (optionally) 2x2 chroma averaging on a smooth
        # ramp: per-pixel error stays in single digits
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 12

    def test_content_sensitivity_and_determinism(self):
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(5)
        a = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
        b = a.copy()
        b[8, 12] = 255 - b[8, 12]  # one-pixel change
        pa_, pb = encode_jpeg(a), encode_jpeg(b)
        assert pa_ != pb
        assert encode_jpeg(a) == pa_  # bit-deterministic encode
        da, db = decode_jpeg(pa_)[3], decode_jpeg(pb)[3]
        assert not (da == db).all()
        assert (decode_jpeg(pa_)[3] == da).all()  # deterministic decode

    def test_non_baseline_raises_not_implemented(self):
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg

        img = np.zeros((8, 8, 1), dtype=np.uint8)
        payload = bytearray(encode_jpeg(img))
        i = payload.index(b"\xff\xc0")
        payload[i + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))
        # SOF0 -> SOF2: the baseline-style full-band scan is ILLEGAL under
        # progressive rules (Ss=0 requires Se=0) -> ValueError, not silence
        payload[i + 1] = 0xC2
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))
        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01not a jpeg")

    def test_stage_decodes_real_jpeg_strict(self, ray_session):
        from ddsketch_ruby_ray.stages.jpeg import encode_jpeg
        from ddsketch_ruby_ray.stages.multimodal import ImageDecodeStage

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        stage = ImageDecodeStage(strict=True)  # strict: no stub fallback
        meta, emb = stage._decode_one(encode_jpeg(img, subsample=True), "jpeg")
        assert (meta["width"], meta["height"], meta["channels"]) == (32, 24, 3)
        assert len(emb) == 16 and all(0.0 <= x <= 1.0 for x in emb)

    def test_synthesizer_emits_real_jpegs(self, ray_session):
        t = _media_tbl(64)
        jp = t.filter(pa.compute.equal(t.column("format"), "jpeg"))
        assert jp.num_rows > 0
        for p in jp.column("payload").to_pylist():
            assert p[:2] == b"\xff\xd8"

    def test_corrupt_streams_raise_value_error(self):
        """Error contract (review r3): corrupt/truncated streams raise
        ValueError; structurally-valid-but-unsupported raise
        NotImplementedError -- never IndexError/KeyError."""
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg

        img = np.full((16, 16, 1), 90, dtype=np.uint8)
        payload = encode_jpeg(img)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) // 2])  # truncated mid-stream
        with pytest.raises(ValueError):
            decode_jpeg(payload[:40])  # truncated inside a header segment
        # undefined huffman table id in SOS
        mut = bytearray(payload)
        i = mut.index(b"\xff\xda")
        mut[i + 6] = 0x33  # dc table 3 / ac table 3: never defined
        with pytest.raises(ValueError):
            decode_jpeg(bytes(mut))


class TestGIFCodec:
    """Pure-numpy GIF LZW codec (stages/gif.py)."""

    def test_round_trip_random_palette(self):
        from ddsketch_ruby_ray.stages.gif import decode_gif, encode_gif

        rng = np.random.default_rng(3)
        for (h, w), inter in [((4, 5), False), ((31, 17), False), ((64, 64), True)]:
            pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
            idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
            ww, hh, c, img = decode_gif(encode_gif(idx, pal, interlaced=inter))
            assert (ww, hh, c) == (w, h, 3)
            assert (img == pal[idx]).all()

    def test_table_reclear_path(self):
        """>4095 LZW entries on random data forces the mid-stream CLEAR."""
        from ddsketch_ruby_ray.stages.gif import decode_gif, encode_gif

        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (96, 128), dtype=np.uint8)
        ww, hh, c, img = decode_gif(encode_gif(idx, pal))
        assert (img == pal[idx]).all()

    def test_small_palette_and_compression(self):
        from ddsketch_ruby_ray.stages.gif import decode_gif, encode_gif

        pal = np.array([[0, 0, 0], [255, 255, 255], [10, 20, 30], [4, 5, 6]], np.uint8)
        idx = np.zeros((50, 60), np.uint8)
        idx[10:20] = 3
        payload = encode_gif(idx, pal)
        assert len(payload) < 50 * 60 // 4  # real LZW compression, not a stub
        ww, hh, c, img = decode_gif(payload)
        assert (img == pal[idx]).all()

    def test_content_sensitivity(self):
        from ddsketch_ruby_ray.stages.gif import decode_gif, encode_gif

        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (20, 20), dtype=np.uint8)
        idx2 = idx.copy()
        idx2[7, 3] ^= 0xFF
        a = decode_gif(encode_gif(idx, pal))[3]
        b = decode_gif(encode_gif(idx2, pal))[3]
        assert (a != b).any() and (a[0] == b[0]).all()

    def test_rejects_garbage(self):
        from ddsketch_ruby_ray.stages.gif import decode_gif

        with pytest.raises(ValueError):
            decode_gif(b"NOTAGIF!")
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # trailer, no image

    def test_stage_routes_gif(self, ray_session):
        from ddsketch_ruby_ray.stages.gif import encode_gif

        rng = np.random.default_rng(6)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (6, 9), dtype=np.uint8)
        stage = ImageDecodeStage(embedding_dim=4, strict=True)
        meta, emb = stage._decode_one(encode_gif(idx, pal), "gif")
        assert (meta["width"], meta["height"], meta["channels"]) == (9, 6, 3)
        assert len(emb) == 4


class TestProgressiveJpeg:
    """SOF2 decode (all four Annex G scan kinds) pinned against baseline."""

    def _rt(self, img, subsample):
        from ddsketch_ruby_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        pb = encode_jpeg(img, subsample=subsample)
        pp = encode_jpeg_progressive(img, subsample=subsample)
        assert pp[:2] == b"\xff\xd8" and b"\xff\xc2" in pp  # really SOF2
        wb, hb, cb, db = decode_jpeg(pb)
        wp, hp, cp, dp = decode_jpeg(pp)
        assert (wb, hb, cb) == (wp, hp, cp)
        return db, dp

    def test_pixels_identical_to_baseline(self):
        rng = np.random.default_rng(41)
        for shape, sub in [
            ((16, 16, 1), False),
            ((37, 53, 3), False),
            ((37, 53, 3), True),   # 4:2:0 -> non-interleaved AC grids differ
            ((100, 7, 3), True),
            ((1, 1, 1), False),
        ]:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            db, dp = self._rt(img, sub)
            assert (db == dp).all(), (shape, sub)

    def test_eob_runs_flat_and_gradient(self):
        # flat/smooth images produce long EOB runs across blocks (EOBn path)
        flat = np.full((128, 128, 3), 128, np.uint8)
        db, dp = self._rt(flat, True)
        assert (db == dp).all()
        grad = (np.linspace(0, 255, 96)[None, :, None] * np.ones((64, 1, 3))).astype(
            np.uint8
        )
        db, dp = self._rt(grad, False)
        assert (db == dp).all()

    def test_deterministic_and_content_sensitive(self):
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg_progressive

        rng = np.random.default_rng(43)
        a = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
        b = a.copy()
        b[5, 5] = 255 - b[5, 5]
        pa_, pb = encode_jpeg_progressive(a), encode_jpeg_progressive(b)
        assert pa_ != pb
        assert encode_jpeg_progressive(a) == pa_
        da, db = decode_jpeg(pa_)[3], decode_jpeg(pb)[3]
        assert not (da == db).all()
        assert (decode_jpeg(pa_)[3] == da).all()

    def test_truncated_progressive_raises_value_error(self):
        from ddsketch_ruby_ray.stages.jpeg import decode_jpeg, encode_jpeg_progressive

        rng = np.random.default_rng(44)
        img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        p = encode_jpeg_progressive(img)
        with pytest.raises(ValueError):
            decode_jpeg(p[: len(p) // 2] + b"\xff\xd9")

    def test_synthesizer_plants_progressive(self, ray_session):
        from ddsketch_ruby_ray.stages.multimodal import synthesize_media_batch

        ids = np.arange(0, 256, dtype=np.int64)
        t = synthesize_media_batch({"id": ids})
        fmts = t.column("format").to_pylist()
        payloads = t.column("payload").to_pylist()
        prog = [
            p for p, f in zip(payloads, fmts) if f == "jpeg" and b"\xff\xc2" in p
        ]
        base = [
            p for p, f in zip(payloads, fmts) if f == "jpeg" and b"\xff\xc0" in p
        ]
        assert len(prog) > 0 and len(base) > 0  # both kinds present


class TestG711Wav:
    def _wav(self, fmt_tag, data, rate=8000, ch=1, bits=8):
        import struct

        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, ch, rate,
                                    rate * ch * bits // 8, ch * bits // 8, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def test_mulaw_alaw_match_audioop(self):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop

        from ddsketch_ruby_ray.stages.multimodal import decode_wav_pcm16

        raw = bytes(range(256)) * 2
        for fmt_tag, conv in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
            rate, ch, samples = decode_wav_pcm16(self._wav(fmt_tag, raw))
            want = np.frombuffer(conv(raw, 2), dtype="<i2")
            assert (rate, ch) == (8000, 1)
            assert (samples[:, 0] == want).all(), fmt_tag

    def test_unknown_format_still_raises(self):
        from ddsketch_ruby_ray.stages.multimodal import decode_wav_pcm16

        with pytest.raises(ValueError, match="supported"):
            decode_wav_pcm16(self._wav(3, b"\x00" * 32))  # IEEE float

    def test_synthesizer_plants_g711(self, ray_session):
        from ddsketch_ruby_ray.stages.multimodal import (
            decode_wav_pcm16,
            synthesize_media_batch,
        )

        t = synthesize_media_batch({"id": np.arange(0, 96)})
        df = t.to_pandas().set_index("media_id")
        # id=6 -> mu-law, id=14 -> A-law, id=2 -> PCM-16; all decode for real
        for mid in (6, 14, 2):
            rate, ch, samples = decode_wav_pcm16(df.loc[mid, "payload"])
            assert rate == 8000 and len(samples) > 0
