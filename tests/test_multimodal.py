"""Multimodal-column tests: fake-container decode, resize, frame
sampling, audio features — Spark-side plumbing (schemas, batch shapes,
explode layout) is real; codecs are the documented stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from virapipe_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", mm.pack_media("i", bytes(range(100)) * 4, width=20, height=20),
         20, 20, 0, 0),
        (2, "image", mm.pack_media("i", b"", width=0, height=0), 0, 0, 0, 0),
        (3, "audio", mm.pack_media("a", bytes([5, 250] * 600), sample_rate=16000,
                                   duration_ms=75), 0, 0, 16000, 75),
        (4, "video", mm.pack_media("v", bytes(range(256)) * 8, width=64, height=48,
                                   duration_ms=5500), 64, 48, 0, 5500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).cache()


def test_container_roundtrip():
    blob = mm.pack_media("i", b"abc", width=3, height=1)
    kind, w, h, rate, dur, payload = mm._unpack(blob)
    assert (kind, w, h, payload) == ("image", 3, 1, b"abc")


def test_require_codecs_raises():
    with pytest.raises(NotImplementedError):
        mm.require_codecs()


def test_image_features(media):
    feats = mm.decode_image_features(media)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "width", "height", "n_bytes", "mean_intensity", "std_intensity"
    ]
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}  # only images reach the UDF
    assert rows[1]["n_bytes"] == 400
    assert rows[1]["mean_intensity"] == pytest.approx(49.5)
    assert rows[2]["mean_intensity"] == 0.0  # empty payload handled


def test_resize_fixed_shape(media):
    resized = mm.resize_images(media, 8, 8)
    rows = {r["media_id"]: r for r in resized.collect()}
    assert all(len(r["data"]) == 64 for r in rows.values())
    assert rows[1]["width"] == 8 and rows[1]["height"] == 8
    # deterministic: same input -> same bytes
    again = {r["media_id"]: r for r in mm.resize_images(media, 8, 8).collect()}
    assert bytes(again[1]["data"]) == bytes(rows[1]["data"])


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=1000)
    rows = frames.orderBy("frame_idx").collect()
    assert [r["media_id"] for r in rows] == [4] * 5  # 5500ms @ 1s -> 5 frames
    assert [r["t_ms"] for r in rows] == [0, 1000, 2000, 3000, 4000]
    assert len({r["frame_hash"] for r in rows}) == 5  # distinct frame content


def test_audio_features(media):
    feats = mm.audio_features(media, window=256)
    r = feats.first()
    assert r["media_id"] == 3 and r["sample_rate"] == 16000
    assert r["n_windows"] == 1200 // 256
    assert len(r["rms_energy"]) == r["n_windows"]
    assert all(v > 0 for v in r["rms_energy"])


def test_metadata_pruning_before_udf(media):
    """Metadata-only predicates never touch payloads: plan for a
    metadata filter+count reads no binary column."""
    q = media.filter(F.col("kind") == "audio").select("media_id", "duration_ms")
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "data" not in plan.split("Filter")[0]  # projection pruned payload


class TestRealCodecs:
    """BMP and WAV decode actual bytes — no stub, no VPMM container."""

    def test_bmp_roundtrip_exact(self):
        import numpy as np

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd width: padding
        blob = mm.encode_bmp(img)
        assert blob[:2] == b"BM"
        back = mm.decode_bmp(blob)
        assert back.shape == (13, 7, 3)
        assert (back == img).all()

    def test_bmp_rejects_other_formats(self):
        with pytest.raises(ValueError):
            mm.decode_bmp(b"PNG whatever")

    def test_wav_roundtrip_exact_mono_and_stereo(self):
        import numpy as np

        mono = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
        rate, back = mm.decode_wav(mm.encode_wav(8000, mono))
        assert rate == 8000 and (back == mono).all()

        stereo = np.stack([mono, -mono], axis=1)
        rate, back = mm.decode_wav(mm.encode_wav(44100, stereo))
        assert rate == 44100 and back.shape == (1000, 2) and (back == stereo).all()

    def test_image_features_from_real_bmp(self, spark):
        import numpy as np

        img = np.full((4, 6, 3), 200, dtype=np.uint8)
        img[0, 0] = 0
        rows = [(10, "image", mm.encode_bmp(img), 6, 4, 0, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.decode_image_features(media).first()
        # dims from the bitmap header, stats from real pixels
        assert (r["width"], r["height"]) == (6, 4)
        assert r["n_bytes"] == 4 * 6 * 3
        assert r["mean_intensity"] == pytest.approx(200 * 69 / 72)  # 3 of 72 bytes zeroed

    def test_audio_features_from_real_wav(self, spark):
        import numpy as np

        samples = np.full(512, 1000, dtype=np.int16)
        rows = [(11, "audio", mm.encode_wav(22050, samples), 0, 0, 22050, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.audio_features(media, window=256).first()
        # rate from the fmt chunk (not metadata), RMS of constant = value
        assert r["sample_rate"] == 22050
        assert r["n_windows"] == 2
        assert r["rms_energy"] == [1000.0, 1000.0]


class TestCodecProperties:
    """Hypothesis round-trips: any well-formed array survives
    encode→decode bit-exactly, across shapes that exercise row padding
    (BMP strides) and channel counts (WAV mono/stereo)."""

    def test_bmp_any_shape(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(1, 24),
            w=st.integers(1, 24),
            seed=st.integers(0, 2**32 - 1),
        )
        def prop(h, w, seed):
            img = np.random.default_rng(seed).integers(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()

        prop()

    def test_wav_any_shape(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            n=st.integers(1, 2000),
            ch=st.integers(1, 4),
            rate=st.sampled_from([8000, 16000, 22050, 44100]),
            seed=st.integers(0, 2**32 - 1),
        )
        def prop(n, ch, rate, seed):
            rng = np.random.default_rng(seed)
            samples = rng.integers(-(2**15), 2**15, (n, ch), dtype=np.int16)
            if ch == 1:
                samples = samples[:, 0]
            got_rate, got = mm.decode_wav(mm.encode_wav(rate, samples))
            assert got_rate == rate
            assert got.shape == samples.shape and (got == samples).all()

        prop()


class TestPngCodec:
    """8-bit PNG decodes actual bytes: zlib inflate + all five scanline
    filters; gray / RGB / RGBA / palette color types."""

    def test_roundtrip_all_color_types(self):
        import numpy as np

        rng = np.random.default_rng(11)
        for shape in [(9, 5), (13, 7, 3), (6, 4, 4)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            blob = mm.encode_png(img)
            assert blob[:8] == b"\x89PNG\r\n\x1a\n"
            back = mm.decode_png(blob)
            assert back.shape == img.shape and (back == img).all()

    def test_decodes_every_filter_type(self):
        """Hand-build an IDAT where each row uses a different filter
        (None/Sub/Up/Average/Paeth) by applying the spec's forward
        filter; decode must reconstruct the original image."""
        import struct
        import zlib

        import numpy as np

        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (5, 8, 3), dtype=np.uint8)
        h, w, bpp = 5, 8, 3
        stride = w * bpp
        flat = img.reshape(h, stride).astype(np.int32)
        out = bytearray()
        prev = np.zeros(stride, np.int32)
        for y, f in enumerate([0, 1, 2, 3, 4]):
            cur = flat[y]
            if f == 0:
                enc = cur
            elif f == 1:  # Sub
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                enc = (cur - left) & 255
            elif f == 2:  # Up
                enc = (cur - prev) & 255
            elif f == 3:  # Average
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                enc = (cur - ((left + prev) >> 1)) & 255
            else:  # Paeth
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
                pred = np.array(
                    [mm._paeth(int(a), int(b), int(c))
                     for a, b, c in zip(left, prev, ul)],
                    np.int32,
                )
                enc = (cur - pred) & 255
            out.append(f)
            out.extend(enc.astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + mm._png_chunk(b"IHDR", ihdr)
            + mm._png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + mm._png_chunk(b"IEND", b"")
        )
        back = mm.decode_png(blob)
        assert back.shape == (5, 8, 3) and (back == img).all()

    def test_palette_resolves_to_rgb(self):
        import struct
        import zlib

        import numpy as np

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
        h, w = idx.shape
        scan = np.zeros((h, 1 + w), np.uint8)
        scan[:, 1:] = idx
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + mm._png_chunk(b"IHDR", ihdr)
            + mm._png_chunk(b"PLTE", pal.tobytes())
            + mm._png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + mm._png_chunk(b"IEND", b"")
        )
        back = mm.decode_png(blob)
        assert back.shape == (2, 3, 3) and (back == pal[idx]).all()

    def test_image_features_from_real_png(self, spark):
        import numpy as np

        img = np.full((4, 6, 3), 100, dtype=np.uint8)
        img[1, 1] = 255
        rows = [(12, "image", mm.encode_png(img), 6, 4, 0, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.decode_image_features(media).first()
        assert (r["width"], r["height"]) == (6, 4)
        assert r["n_bytes"] == 4 * 6 * 3
        assert r["mean_intensity"] == pytest.approx((100 * 69 + 255 * 3) / 72)

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError):
            mm.decode_png(b"BM not a png")


class TestGifCodec:
    """GIF87a/89a decodes actual bytes: full LZW (variable code width,
    dictionary growth + reset), sub-blocks, palette, interlace."""

    def test_roundtrip_including_dictionary_growth(self):
        import numpy as np

        rng = np.random.default_rng(5)
        # 128x100 random bytes push the LZW dictionary past the 9->10
        # bit width boundary; tiny images exercise the short path
        for shape in [(4, 4), (31, 17), (128, 100)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            blob = mm.encode_gif(img)
            assert blob[:6] == b"GIF89a"
            back = mm.decode_gif(blob)
            assert back.shape == (*shape, 3)
            assert (back == np.repeat(img[..., None], 3, axis=2)).all()

    def test_lzw_adversarial_streams(self):
        import numpy as np

        rng = np.random.default_rng(9)
        for mcs in (2, 4, 8):
            for kind in range(3):
                n = int(rng.integers(1, 7000))
                if kind == 0:
                    seq = [int(v) for v in rng.integers(0, 1 << mcs, n)]
                elif kind == 1:
                    seq = [int(v) for v in
                           np.repeat(rng.integers(0, 1 << mcs, max(1, n // 13)), 13)][:n]
                else:
                    seq = [i % (1 << mcs) for i in range(n)]
                assert mm._lzw_decode(mcs, mm._lzw_encode(mcs, seq)) == seq

    def test_interlaced_and_extension_blocks(self):
        """A hand-built interlaced GIF with a leading extension block:
        the extension must be skipped structurally and the 4-pass row
        order undone."""
        import numpy as np
        import struct

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (10, 6), dtype=np.uint8)
        order = (
            list(range(0, 10, 8)) + list(range(4, 10, 8))
            + list(range(2, 10, 4)) + list(range(1, 10, 2))
        )
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        lzw = mm._lzw_encode(8, [int(v) for v in img[order].reshape(-1)])
        blocks = bytearray()
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        blob = (
            b"GIF89a" + struct.pack("<HHBBB", 6, 10, 0x80 | 7, 0, 0)
            + pal.tobytes()
            + b"\x21\xfe" + bytes([7]) + b"comment" + b"\x00"  # comment ext
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 10, 0x40)  # interlaced
            + bytes([8]) + bytes(blocks) + b"\x3b"
        )
        back = mm.decode_gif(blob)
        assert (back[..., 0] == img).all()

    def test_rejects_non_gif(self):
        with pytest.raises(ValueError):
            mm.decode_gif(b"\x89PNG\r\n\x1a\nnope")


class TestAuCodec:
    """Sun AU + G.711 mu-law: a second real audio format including a
    genuinely lossy sample codec with value-level idempotence."""

    def test_pcm16_roundtrip_exact(self):
        import numpy as np

        sig = (np.sin(np.linspace(0, 50, 4000)) * 18000).astype(np.int16)
        rate, back = mm.decode_au(mm.encode_au(8000, sig))
        assert rate == 8000 and (back == sig).all()

    def test_ulaw_quantization_bounded_and_idempotent(self):
        import numpy as np

        sig = (np.sin(np.linspace(0, 50, 4000)) * 18000).astype(np.int16)
        _, once = mm.decode_au(mm.encode_au(8000, sig, ulaw=True))
        err = np.abs(once.astype(int) - sig.astype(int))
        assert err.max() < 1024  # G.711's largest step at max amplitude
        # value-level idempotence: a second pass is exact
        _, twice = mm.decode_au(mm.encode_au(8000, once, ulaw=True))
        assert (twice == once).all()

    def test_ulaw_expand_covers_full_dynamic_range(self):
        import numpy as np

        vals = mm._ulaw_expand(np.arange(256, dtype=np.uint8))
        assert vals.min() < -30000 and vals.max() > 30000
        assert (vals[:128] <= 0).all() or (vals[128:] <= 0).all()

    def test_audio_features_from_real_au(self, spark):
        import numpy as np

        samples = np.full(512, -1000, dtype=np.int16)
        # land on the codec codomain so RMS is exact
        samples = mm._ulaw_expand(mm._ulaw_compress(samples))
        rows = [(13, "audio", mm.encode_au(11025, samples, ulaw=True),
                 0, 0, 11025, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.audio_features(media, window=256).first()
        assert r["sample_rate"] == 11025 and r["n_windows"] == 2
        assert r["rms_energy"][0] == abs(float(samples[0]))


class TestRealResize:
    """resize_images decodes real payloads and resamples true 2-D
    nearest-neighbor, re-encoding as BMP."""

    def test_downsample_png_selects_expected_pixels(self, spark):
        import numpy as np

        # 8x8 with a distinct value per cell: nearest selection is exact
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        rgb = np.repeat(img[..., None], 3, axis=2)
        rows = [(1, "image", mm.encode_png(rgb), 8, 8, 0, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.resize_images(media, 4, 4).first()
        out = mm.decode_bmp(bytes(r["data"]))
        assert out.shape == (4, 4, 3)
        expect = img[::2][:, ::2]
        assert (out[..., 0] == expect).all()

    def test_upsample_gif_repeats_pixels(self, spark):
        import numpy as np

        img = np.array([[10, 200], [60, 90]], np.uint8)
        rows = [(2, "image", mm.encode_gif(img), 2, 2, 0, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.resize_images(media, 4, 4).first()
        out = mm.decode_bmp(bytes(r["data"]))[..., 0]
        assert (out == np.repeat(np.repeat(img, 2, 0), 2, 1)).all()

    def test_vpmm_stub_path_still_sized(self, spark):
        rows = [(3, "image", mm.pack_media("i", b"\x01\x02\x03\x04" * 16,
                                           width=8, height=8), 8, 8, 0, 0)]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        r = mm.resize_images(media, 4, 4).first()
        assert len(bytes(r["data"])) == 16


class TestNewCodecProperties:
    """Hypothesis round-trips for the round-6 codecs, mirroring
    TestCodecProperties' BMP/WAV coverage."""

    def test_png_any_shape_and_channels(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(1, 20),
            w=st.integers(1, 20),
            ch=st.sampled_from([0, 3, 4]),  # gray, RGB, RGBA
            seed=st.integers(0, 2**32 - 1),
        )
        def prop(h, w, ch, seed):
            rng = np.random.default_rng(seed)
            shape = (h, w) if ch == 0 else (h, w, ch)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            back = mm.decode_png(mm.encode_png(img))
            assert back.shape == img.shape and (back == img).all()

        prop()

    def test_gif_any_shape(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            h=st.integers(1, 24),
            w=st.integers(1, 24),
            seed=st.integers(0, 2**32 - 1),
        )
        def prop(h, w, seed):
            img = np.random.default_rng(seed).integers(
                0, 256, (h, w), dtype=np.uint8
            )
            back = mm.decode_gif(mm.encode_gif(img))
            assert (back[..., 0] == img).all()

        prop()

    def test_au_pcm_any_shape_ulaw_idempotent(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            n=st.integers(1, 1500),
            ch=st.integers(1, 3),
            seed=st.integers(0, 2**32 - 1),
        )
        def prop(n, ch, seed):
            rng = np.random.default_rng(seed)
            samples = rng.integers(-(2**15), 2**15, (n, ch), dtype=np.int16)
            if ch == 1:
                samples = samples[:, 0]
            rate, back = mm.decode_au(mm.encode_au(16000, samples))
            assert rate == 16000 and (back == samples).all()
            # mu-law: one lossy pass, then exactly stable forever
            _, once = mm.decode_au(mm.encode_au(16000, samples, ulaw=True))
            _, twice = mm.decode_au(mm.encode_au(16000, once, ulaw=True))
            assert (twice == once).all()

        prop()


class TestTiffCodec:
    def test_roundtrip_both_byte_orders_gray_and_rgb(self):
        import numpy as np

        from virapipe_spark import multimodal as mm

        rng = np.random.RandomState(11)
        rgb = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
        gray = rng.randint(0, 256, (3, 7), dtype=np.uint8)
        for bo in ("II", "MM"):
            assert (mm.decode_tiff(mm.encode_tiff(rgb, bo)) == rgb).all()
            assert (mm.decode_tiff(mm.encode_tiff(gray, bo)) == gray).all()

    def test_multi_strip_reassembly(self):
        """A hand-built 2-strip little-endian file: pixel rows must
        reassemble across StripOffsets/StripByteCounts arrays (stored
        out-of-line because 2 LONGs exceed the 4-byte inline slot)."""
        import struct

        import numpy as np

        from virapipe_spark import multimodal as mm

        gray = np.arange(18, dtype=np.uint8).reshape(3, 6)
        pix = gray.tobytes()
        half = len(pix) // 2
        pix_off, off2 = 8, 8 + half
        arrs = 8 + len(pix)
        so_off, sc_off, ifd_off = arrs, arrs + 8, arrs + 16

        def e(tag, typ, cnt, val):
            fmt, size = {3: ("H", 2), 4: ("I", 4)}[typ]
            if cnt * size > 4:
                raw = struct.pack("<I", val)
            else:
                raw = struct.pack("<" + fmt, val)
                raw += b"\x00" * (4 - len(raw))
            return struct.pack("<HHI", tag, typ, cnt) + raw

        ent = [
            e(256, 3, 1, 6), e(257, 3, 1, 3), e(258, 3, 1, 8),
            e(259, 3, 1, 1), e(262, 3, 1, 1), e(273, 4, 2, so_off),
            e(277, 3, 1, 1), e(278, 3, 1, 2), e(279, 4, 2, sc_off),
        ]
        data = (
            struct.pack("<2sHI", b"II", 42, ifd_off)
            + pix
            + struct.pack("<II", pix_off, off2)
            + struct.pack("<II", half, len(pix) - half)
            + struct.pack("<H", len(ent))
            + b"".join(ent)
            + struct.pack("<I", 0)
        )
        assert (mm.decode_tiff(data) == gray).all()

    def test_rejects_non_tiff_and_unsupported(self):
        import numpy as np
        import pytest

        from virapipe_spark import multimodal as mm

        with pytest.raises(ValueError):
            mm.decode_tiff(b"NOPE" + b"\x00" * 16)

    def test_property_random_images_roundtrip(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from virapipe_spark import multimodal as mm

        @settings(max_examples=20, deadline=None)
        @given(
            w=st.integers(1, 12),
            h=st.integers(1, 12),
            rgb=st.booleans(),
            big=st.booleans(),
            seed=st.integers(0, 2**31 - 1),
        )
        def prop(w, h, rgb, big, seed):
            rng = np.random.RandomState(seed)
            shape = (h, w, 3) if rgb else (h, w)
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            bo = "MM" if big else "II"
            assert (mm.decode_tiff(mm.encode_tiff(img, bo)) == img).all()

        prop()


class TestJpegCodec:
    """Baseline JPEG (r7): pure-numpy sequential DCT + canonical
    Huffman. Flat 8x8 blocks round-trip bit-exactly (the catalog
    entry's oracle lever); everything else is bounded-error, as a
    lossy codec permits."""

    def test_flat_blocks_bit_exact(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(11)
        vals = rng.integers(0, 256, (3, 5), dtype=np.uint8)
        img = vals.repeat(8, axis=0).repeat(8, axis=1)
        out = decode_jpeg(encode_jpeg(img))
        assert out.dtype == np.uint8
        assert np.array_equal(out, img)

    def test_random_gray_error_bounded(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(12)
        for shape in [(8, 8), (24, 40), (13, 11), (1, 1), (9, 17)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img))
            assert out.shape == shape
            # Q=1: only DCT/IDCT float rounding -> off-by-one at most
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_rgb_and_420_subsampling(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        # YCbCr forward+inverse rounding: a few codes of drift
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
        # flat color survives 4:2:0 downsampling exactly
        flat = np.full((16, 24, 3), [120, 45, 200], dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, subsample=True))
        assert np.array_equal(out, flat)

    def test_restart_markers_resync(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(14)
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        blob = encode_jpeg(img, restart_interval=2)
        assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
        out = decode_jpeg(blob)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_quant_table_roundtrips_through_dqt(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(15)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        q = np.full((8, 8), 16, dtype=np.int32)  # real quantization loss
        out = decode_jpeg(encode_jpeg(img, qtable=q))
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err > 1  # lossy for real with Q=16
        assert err <= 64  # but bounded by the quantization grain

    def test_adversarial_bitstreams(self):
        import numpy as np
        import pytest

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        img = np.full((8, 8), 77, dtype=np.uint8)
        blob = encode_jpeg(img)
        with pytest.raises(ValueError):
            decode_jpeg(b"\x00" + blob[1:])  # no SOI
        with pytest.raises((ValueError, IndexError, NotImplementedError)):
            decode_jpeg(blob[:20])  # truncated before scan
        # progressive SOF2 is explicitly unsupported, not mis-decoded
        sof0 = blob.find(b"\xff\xc0")
        prog = blob[:sof0] + b"\xff\xc2" + blob[sof0 + 2 :]
        with pytest.raises(NotImplementedError):
            decode_jpeg(prog)
        # stuffed-byte handling: entropy data containing 0xFF00 decodes
        # (any all-ones-heavy image exercises this path statistically)
        bright = np.full((16, 16), 255, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(bright)), bright)

    def test_property_random_flat_block_images(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(16)
        for _ in range(10):
            bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
            vals = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
            img = vals.repeat(8, axis=0).repeat(8, axis=1)
            assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)

    def test_image_features_from_real_jpeg(self, spark):
        import numpy as np

        from virapipe_spark import multimodal as mm

        vals = np.array([[10, 200], [30, 90]], dtype=np.uint8)
        img = vals.repeat(8, axis=0).repeat(8, axis=1)
        blob = mm.encode_jpeg(img)
        media = spark.createDataFrame(
            [(1, "image", bytearray(blob), 16, 16, 0, 0)],
            "media_id long, kind string, data binary, width int, "
            "height int, sample_rate int, duration_ms int",
        )
        row = mm.decode_image_features(media).collect()[0]
        assert (row["width"], row["height"], row["n_bytes"]) == (16, 16, 256)
        assert abs(row["mean_intensity"] - vals.mean()) < 1e-9
        assert abs(row["std_intensity"] - vals.std()) < 1e-9


class TestFlacCodec:
    """FLAC (r7): lossless rice-coded audio. Round-trips are BIT-exact
    (unlike JPEG/mu-law there is no tolerance anywhere)."""

    def test_roundtrip_mono_stereo_multiblock(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_flac, encode_flac

        rng = np.random.default_rng(31)
        x = rng.normal(0, 3000, 10000).astype(np.int16)
        rate, y = decode_flac(encode_flac(44100, x, block_size=4096))
        assert rate == 44100 and np.array_equal(x, y)
        s = rng.normal(0, 9000, (5000, 2)).astype(np.int16)
        rate, y = decode_flac(encode_flac(22050, s))
        assert rate == 22050 and np.array_equal(s, y)

    def test_fixed_predictors_actually_compress(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_flac, encode_flac

        t = np.arange(20000)
        sig = (10000 * np.sin(t / 50)).astype(np.int16)
        blob = encode_flac(8000, sig)
        assert len(blob) < 0.3 * 2 * len(sig)  # real compression
        assert np.array_equal(decode_flac(blob)[1], sig)

    def test_edge_signals(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_flac, encode_flac

        for arr in [
            np.zeros(100, np.int16),
            np.full(257, -32768, np.int16),
            np.array([32767], np.int16),
            np.array([1, -1] * 500, np.int16),
        ]:
            assert np.array_equal(decode_flac(encode_flac(8000, arr))[1], arr)

    def test_crc_and_md5_guard_corruption(self):
        import numpy as np
        import pytest

        from virapipe_spark.multimodal import decode_flac, encode_flac

        rng = np.random.default_rng(32)
        x = rng.normal(0, 5000, 3000).astype(np.int16)
        blob = bytearray(encode_flac(8000, x))
        with pytest.raises(ValueError):
            decode_flac(b"fLaX" + bytes(blob[4:]))
        # flip a bit inside frame data: one of the CRCs or the
        # STREAMINFO MD5 must catch it (never a silent wrong decode)
        corrupt = bytearray(blob)
        corrupt[len(corrupt) // 2] ^= 0x10
        with pytest.raises(ValueError):
            decode_flac(bytes(corrupt))

    def test_decoder_handles_lpc_and_partitions(self):
        """Streams our encoder doesn't emit: an LPC subframe and a
        partitioned-rice residual, hand-assembled bit-exactly, must
        decode to the predicted samples."""
        import hashlib
        import struct

        import numpy as np

        from virapipe_spark import multimodal as mm

        # samples following s[i] = (2*s[i-1] - s[i-2]) + r with known r,
        # encoded as LPC order 2, precision 15, shift 0
        warm = [100, 210]
        resid = [3, -2, 5, 0, -7, 1]
        vals = warm[:]
        for r in resid:
            vals.append(2 * vals[-1] - 1 * vals[-2] + r)
        bs = len(vals)
        hdr = mm._FlacBitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 2)
        hdr.write(0b0111, 4)  # 16-bit blocksize at end
        hdr.write(0, 4)  # rate from streaminfo
        hdr.write(0, 4)  # mono
        hdr.write(0b100, 3)  # 16 bps
        hdr.write(0, 1)
        hdr.align()
        head = bytes(hdr.bytes()) + mm._utf8_code(0) + struct.pack(">H", bs - 1)
        head += bytes([mm._crc8(head)])
        body = mm._FlacBitWriter()
        body.write(0, 1)
        body.write(32 | (2 - 1), 6)  # LPC order 2
        body.write(0, 1)  # no wasted bits
        body.write(warm[0], 16)
        body.write(warm[1], 16)
        body.write(15 - 1, 4)  # precision 15
        body.write(0, 5)  # shift 0
        body.write(2, 15)  # coef a1 = 2
        body.write(-1, 15)  # coef a2 = -1
        # partitioned rice: order 1 -> two partitions over 8 samples
        body.write(0, 2)
        body.write(1, 4)
        body.write(3, 4)  # param p0: covers bs/2 - order = 2 resid
        mm._rice_write(body, resid[:2], 3)
        body.write(2, 4)  # param p1: 4 resid
        mm._rice_write(body, resid[2:], 2)
        body.align()
        frame = head + bytes(body.bytes())
        frame += struct.pack(">H", mm._crc16(frame))
        si = mm._FlacBitWriter()
        si.write(bs, 16)
        si.write(bs, 16)
        si.write(0, 48)
        si.write(8000, 20)
        si.write(0, 3)
        si.write(15, 5)
        si.write(bs, 36)
        si.align()
        raw = np.array(vals, dtype="<i2").tobytes()
        streaminfo = bytes(si.bytes()) + hashlib.md5(raw).digest()
        blob = (
            b"fLaC"
            + bytes([0x80])
            + len(streaminfo).to_bytes(3, "big")
            + streaminfo
            + frame
        )
        rate, got = mm.decode_flac(blob)
        assert rate == 8000
        assert got.tolist() == vals

    def test_audio_features_from_real_flac(self, spark):
        import numpy as np

        from virapipe_spark import multimodal as mm

        x = (np.arange(64, dtype=np.int64) * 100 - 3200).astype(np.int16)
        blob = mm.encode_flac(16000, x, block_size=32)
        media = spark.createDataFrame(
            [(5, "audio", bytearray(blob), 0, 0, 16000, 0)],
            "media_id long, kind string, data binary, width int, "
            "height int, sample_rate int, duration_ms int",
        )
        row = mm.audio_features(media, window=32).collect()[0]
        assert row["sample_rate"] == 16000 and row["n_windows"] == 2
        exp = np.sqrt((x.astype(np.float64) ** 2).reshape(2, 32).mean(axis=1))
        assert np.allclose(row["rms_energy"], exp.round(4))


class TestAviMjpegCodec:
    """RIFF-AVI + Motion-JPEG (r7): the real video path."""

    def test_flat_block_frames_bit_exact(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_avi_mjpeg, encode_avi_mjpeg

        rng = np.random.default_rng(51)
        frames = [
            v.repeat(8, axis=0).repeat(8, axis=1)
            for v in rng.integers(0, 256, (6, 2, 3), dtype=np.uint8)
        ]
        fps, out = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=5))
        assert fps == 5 and len(out) == 6
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))

    def test_rgb_frames_bounded_error(self):
        import numpy as np

        from virapipe_spark.multimodal import decode_avi_mjpeg, encode_avi_mjpeg

        rng = np.random.default_rng(52)
        frames = [
            rng.integers(0, 256, (16, 24, 3), dtype=np.uint8) for _ in range(3)
        ]
        fps, out = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=30))
        assert fps == 30
        for a, b in zip(frames, out):
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 4

    def test_riff_walk_skips_unknown_chunks(self):
        import struct

        import numpy as np

        from virapipe_spark.multimodal import decode_avi_mjpeg, encode_avi_mjpeg

        img = np.full((8, 8), 50, dtype=np.uint8)
        blob = bytearray(encode_avi_mjpeg([img], fps=10))
        # splice an unknown odd-length chunk (with pad byte) before movi
        movi_at = bytes(blob).find(b"LIST", 12)
        junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
        spliced = bytes(blob[:movi_at]) + junk + bytes(blob[movi_at:])
        spliced = (
            spliced[:4]
            + struct.pack("<I", len(spliced) - 8)
            + spliced[8:]
        )
        fps, out = decode_avi_mjpeg(spliced)
        assert len(out) == 1 and np.array_equal(out[0], img)

    def test_rejects_non_avi(self):
        import pytest

        from virapipe_spark.multimodal import decode_avi_mjpeg

        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")

    def test_sample_frames_decodes_real_video(self, spark):
        import hashlib

        import numpy as np

        from virapipe_spark import multimodal as mm

        frames = [
            np.full((16, 16), 60 + 10 * i, dtype=np.uint8) for i in range(4)
        ]
        blob = mm.encode_avi_mjpeg(frames, fps=10)
        media = spark.createDataFrame(
            [(9, "video", bytearray(blob), 16, 16, 0, 400)],
            "media_id long, kind string, data binary, width int, "
            "height int, sample_rate int, duration_ms int",
        )
        rows = mm.sample_frames(media, every_ms=100).orderBy("t_ms").collect()
        assert [(r["frame_idx"], r["t_ms"]) for r in rows] == [
            (0, 0), (1, 100), (2, 200), (3, 300),
        ]
        for r, f in zip(rows, frames):
            assert r["frame_hash"] == hashlib.md5(f.tobytes()).hexdigest()[:12]


class TestFlacFrameNumbering:
    def test_utf8_frame_codes_canonical_and_many_frames_roundtrip(self):
        """FLAC's UTF-8-style frame numbering: every code decodes back
        and uses the CANONICAL (shortest) length per the 5n+1 payload
        capacity — the original bound produced overlong 3-byte codes
        for 11-bit frame numbers. A 200-frame stream (crossing the
        one-byte boundary at frame 128) round-trips exactly."""
        import numpy as np

        from virapipe_spark import multimodal as mm

        for n in list(range(0, 5000)) + [2**16, 2**20, 2**30]:
            enc = mm._utf8_code(n)
            assert mm._utf8_decode(mm._FlacBitReader(enc)) == n
            if n < 0x80:
                want = 1
            else:
                want = 2
                while n.bit_length() > 5 * want + 1:
                    want += 1
            assert len(enc) == want, (n, len(enc), want)
        rng = np.random.default_rng(9)
        x = rng.normal(0, 4000, 200 * 64).astype(np.int16)
        rate, y = mm.decode_flac(mm.encode_flac(8000, x, block_size=64))
        assert np.array_equal(x, y)
