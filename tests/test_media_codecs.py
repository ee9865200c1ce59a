"""Real uncompressed-media codecs (ml/media_codecs.py) and their Spark
integration: WAV PCM decode, PPM decode/resize, by-value executor
shipping through mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.ml.media_codecs import (
    decode_features,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    image_features,
    resize_nearest,
    sniff,
    wav_features,
)


def _sine_wav(rate=8000, seconds=0.5, freq=440.0, amp=0.5) -> bytes:
    t = np.arange(int(rate * seconds)) / rate
    return encode_wav(amp * np.sin(2 * np.pi * freq * t), rate)


def _gradient_ppm(w=16, h=8) -> bytes:
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 10  # R ramps by col
    arr[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 20  # G ramps by row
    arr[:, :, 2] = 7
    return encode_ppm(arr)


class TestWav:
    def test_roundtrip_and_rate(self):
        payload = _sine_wav()
        samples, rate = decode_wav(payload)
        assert rate == 8000
        assert samples.shape == (4000, 1)
        assert abs(samples).max() == pytest.approx(0.5, abs=1e-3)

    def test_rms_of_sine_is_amp_over_sqrt2(self):
        feats = wav_features(_sine_wav(amp=0.8))
        duration, _, n_ch, rms, peak = feats[:5]
        assert duration == pytest.approx(0.5)
        assert n_ch == 1.0
        assert rms == pytest.approx(0.8 / np.sqrt(2), abs=1e-3)
        assert peak == pytest.approx(0.8, abs=1e-3)
        # 8 window energies, all ~rms for a steady tone
        assert len(feats) == 13
        assert all(w == pytest.approx(rms, abs=1e-2) for w in feats[5:])

    def test_silence_vs_tone_windows(self):
        rate = 8000
        tone = 0.9 * np.sin(2 * np.pi * 440 * np.arange(2000) / rate)
        signal = np.concatenate([np.zeros(2000), tone])
        feats = wav_features(encode_wav(signal, rate))
        assert sum(feats[5:9]) < 0.01  # first half silent
        assert sum(feats[9:13]) > 1.0  # second half loud


class TestPpm:
    def test_roundtrip(self):
        payload = _gradient_ppm()
        arr = decode_ppm(payload)
        assert arr.shape == (8, 16, 3)
        assert encode_ppm(arr) == payload

    def test_comment_header(self):
        arr = np.full((2, 2, 3), 9, dtype=np.uint8)
        payload = b"P6\n# a comment\n2 2\n255\n" + arr.tobytes()
        assert (decode_ppm(payload) == 9).all()

    def test_resize_nearest_halves(self):
        arr = decode_ppm(_gradient_ppm())
        small = resize_nearest(arr, 8, 4)
        assert small.shape == (4, 8, 3)
        # nearest sampling: pixel (r, c) of small == (2r, 2c) of big
        assert (small == arr[::2, ::2]).all()

    def test_image_features(self):
        arr = decode_ppm(_gradient_ppm())
        h, w, r, g, b, *quads = image_features(arr)
        assert (h, w) == (8.0, 16.0)
        assert b == pytest.approx(7.0)
        assert r == pytest.approx(np.arange(16).mean() * 10)
        assert quads[1] > quads[0]  # right half has higher R → higher luma


class TestSniff:
    def test_sniff_types(self):
        assert sniff(_sine_wav()) == "wav"
        assert sniff(_gradient_ppm()) == "ppm"
        assert sniff(b"\xff\xd8\xff jpeg-ish") == "jpeg"  # decodable since round 4
        assert sniff(b"\x00\x01 not media") is None
        assert sniff(None) is None

    def test_decode_features_dispatch(self):
        assert len(decode_features(_sine_wav())) == 13
        assert len(decode_features(_gradient_ppm())) == 9
        assert decode_features(b"plain text") is None


class TestSparkIntegration:
    def _media_df(self, spark):
        rows = [
            (1, _sine_wav(), "audio", None, None, 0),
            (2, _gradient_ppm(), "image", 16, 8, 0),
            (3, b"opaque compressed blob", "video", None, None, 0),
        ]
        df = spark.createDataFrame(
            rows,
            "media_id long, payload binary, media_type string, "
            "width int, height int, n_bytes long",
        )
        return df.withColumn("n_bytes", F.length("payload").cast("bigint"))

    def test_extract_features_real_and_fake_paths(self, spark):
        from lexam_data_pipeline_spark.ml.multimodal import extract_features

        feats = {
            r["media_id"]: r["feature"]
            for r in extract_features(self._media_df(spark)).collect()
        }
        assert feats[1] == pytest.approx(wav_features(_sine_wav()), abs=1e-6)
        assert feats[2] == pytest.approx(
            image_features(decode_ppm(_gradient_ppm())), abs=1e-4
        )
        assert len(feats[3]) == 8  # compressed blob → deterministic fake

    def test_extract_features_strict_raises_on_compressed_only(self, spark):
        from lexam_data_pipeline_spark.ml.multimodal import extract_features

        real_only = self._media_df(spark).filter(F.col("media_id") != 3)
        out = extract_features(real_only, deterministic_fake=False).collect()
        assert len(out) == 2  # real codecs need no fake mode

    def test_resize_really_resizes_ppm(self, spark):
        from lexam_data_pipeline_spark.ml.multimodal import resize_media

        media = self._media_df(spark).filter(F.col("media_id") == 2)
        out = resize_media(media, 4, 4).collect()[0]
        arr = decode_ppm(bytes(out["payload"]))
        assert arr.shape == (4, 4, 3)
        big = decode_ppm(_gradient_ppm())
        assert (arr == big[(np.arange(4) * 8) // 4][:, (np.arange(4) * 16) // 4]).all()


class TestCodecProperties:
    """Hypothesis roundtrips — pure bytes↔numpy, no Spark in the loop."""

    def test_ppm_roundtrip_random_images(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=50, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(
                    st.integers(1, 12), st.integers(1, 12), st.just(3)
                ),
            )
        )
        def roundtrip(arr):
            assert (decode_ppm(encode_ppm(arr)) == arr).all()

        roundtrip()

    def test_wav_roundtrip_random_signals(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=30, deadline=None)
        @given(
            arrays(
                np.float64,
                st.integers(1, 500),
                elements=st.floats(-1.0, 1.0 - 1 / 32768, allow_nan=False),
            ),
            st.sampled_from([8000, 16000, 44100]),
        )
        def roundtrip(signal, rate):
            decoded, got_rate = decode_wav(encode_wav(signal, rate))
            assert got_rate == rate
            assert decoded.shape == (len(signal), 1)
            # 16-bit quantization error bound
            assert np.abs(decoded[:, 0] - signal).max() <= 1.5 / 32768

        roundtrip()

    def test_palette_png_roundtrip_random_images(self):
        """Color-type-3: decode(encode(indices, palette)) must equal
        palette[indices] for every filter type."""
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png_palette,
        )

        @settings(max_examples=40, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(st.integers(1, 12), st.integers(1, 12)),
                elements=st.integers(0, 15),
            ),
            arrays(np.uint8, st.just((16, 3))),
            st.integers(0, 4),
        )
        def roundtrip(idx, palette, filter_type):
            payload = encode_png_palette(idx, palette, filter_type=filter_type)
            assert (decode_png(payload) == palette[idx]).all()

        roundtrip()

    def test_palette_png_error_paths(self):
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png_palette,
        )

        idx = np.zeros((4, 4), dtype=np.uint8)
        pal = np.zeros((16, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="out of range"):
            encode_png_palette(idx + 16, pal)
        with pytest.raises(ValueError, match="\\(h, w\\)"):
            encode_png_palette(idx[:, :, None], pal)
        # strip the PLTE chunk → decode must fail loudly
        payload = bytearray(encode_png_palette(idx, pal))
        plte = payload.find(b"PLTE")
        # whole chunk = 4 length + 4 type + 48 data + 4 CRC = 60 bytes
        del payload[plte - 4 : plte - 4 + 60]
        with pytest.raises(ValueError, match="missing PLTE"):
            decode_png(bytes(payload))

    def test_resize_identity_and_idempotence(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=30, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(st.integers(1, 10), st.integers(1, 10), st.just(3)),
            ),
            st.integers(1, 10),
            st.integers(1, 10),
        )
        def check(arr, tw, th):
            h, w, _ = arr.shape
            assert (resize_nearest(arr, w, h) == arr).all()  # identity
            once = resize_nearest(arr, tw, th)
            assert once.shape == (th, tw, 3)
            assert (resize_nearest(once, tw, th) == once).all()  # idempotent

        check()


class TestPng:
    """Pure-stdlib PNG codec (zlib inflate + spec filters incl. Paeth)."""

    def _arr(self, h=6, w=5, ch=3):
        rng = np.random.RandomState(7)
        return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)

    def test_roundtrip_every_filter_type(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_png, encode_png

        arr = self._arr()
        for ftype in range(5):
            got = decode_png(encode_png(arr, filter_type=ftype))
            assert (got == arr).all(), f"filter {ftype}"

    def test_channel_variants(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_png, encode_png

        for ch in (1, 2, 3, 4):
            arr = self._arr(ch=ch)
            got = decode_png(encode_png(arr, filter_type=4))
            assert got.shape == arr.shape and (got == arr).all()

    def test_crc_corruption_detected(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_png, encode_png

        payload = bytearray(encode_png(self._arr()))
        # flip one bit inside the IDAT data
        idx = payload.index(b"IDAT") + 6
        payload[idx] ^= 0x01
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(payload))

    def test_16bit_and_bad_interlace_rejected(self):
        """16-bit stays honestly unsupported; interlace method 1 is now
        DECODED (TestAdam7), so only out-of-spec methods reject."""
        import struct
        import zlib as _zlib

        from lexam_data_pipeline_spark.ml.media_codecs import PNG_SIG, decode_png

        def mk(depth, interlace):
            ihdr = struct.pack(">IIBBBBB", 1, 1, depth, 2, 0, 0, interlace)
            chunk = (
                struct.pack(">I", len(ihdr))
                + b"IHDR"
                + ihdr
                + struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
            )
            return PNG_SIG + chunk

        with pytest.raises(NotImplementedError, match="16-bit"):
            decode_png(mk(16, 0))
        with pytest.raises(ValueError, match="interlace method"):
            decode_png(mk(8, 2))

    def test_sniff_and_feature_dispatch(self):
        from lexam_data_pipeline_spark.ml.media_codecs import encode_png

        payload = encode_png(self._arr(ch=3), filter_type=4)
        assert sniff(payload) == "png"
        feats = decode_features(payload)
        assert feats is not None and feats[0] == 6.0 and feats[1] == 5.0

    def test_png_and_ppm_features_agree(self):
        """Same pixels through both image codecs → identical features."""
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png,
        )

        arr = self._arr()
        png_feats = image_features(decode_png(encode_png(arr, filter_type=3)))
        ppm_feats = image_features(decode_ppm(encode_ppm(arr)))
        assert png_feats == ppm_feats

    def test_roundtrip_random_images_all_filters(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        from lexam_data_pipeline_spark.ml.media_codecs import decode_png, encode_png

        @settings(max_examples=40, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(st.integers(1, 10), st.integers(1, 10), st.sampled_from([1, 3, 4])),
            ),
            st.integers(0, 4),
        )
        def roundtrip(arr, ftype):
            assert (decode_png(encode_png(arr, filter_type=ftype)) == arr).all()

        roundtrip()

    def test_resize_media_handles_png(self, spark):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_png, encode_png
        from lexam_data_pipeline_spark.ml.multimodal import resize_media

        arr = self._arr(h=8, w=8)
        media = spark.createDataFrame(
            [(1, bytearray(encode_png(arr, filter_type=4)), "image", 8, 8, 0)],
            "media_id long, payload binary, media_type string, width int, height int, n_bytes long",
        )
        out = resize_media(media, 4, 4, deterministic_fake=False).collect()[0]
        resized = decode_png(bytes(out["payload"]))
        assert resized.shape == (4, 4, 3)
        assert (resized == resize_nearest(arr, 4, 4)).all()


class TestRealMediaTable:
    """media_table_real: the whole multimodal tier with NO fake path."""

    def test_q_multimodal_features_no_fake(self, spark, sf_small):
        from lexam_data_pipeline_spark.ml.multimodal import q_multimodal_features

        rows = {r["media_type"]: r for r in q_multimodal_features(spark, sf_small).collect()}
        assert set(rows) == {"image", "audio", "video"}
        for r in rows.values():
            assert r["n_media"] > 0 and r["total_bytes"] > 0

    def test_real_payloads_decode_strictly(self, spark, sf_small):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.ml.multimodal import (
            extract_features,
            media_table_real,
        )

        docs = load_table(spark, sf_small, "documents").limit(30)
        feats = extract_features(media_table_real(docs), deterministic_fake=False)
        got = feats.collect()
        assert len(got) == 30
        # image/video features start with [h, w, ...] = [8, 8, ...]
        for r in got:
            if r["media_type"] in ("image", "video"):
                assert r["feature"][0] == 8.0 and r["feature"][1] == 8.0
            else:  # audio: [duration, rate/1e5, channels, rms, peak, ...]
                assert r["feature"][2] == 1.0
                assert abs(r["feature"][1] - 0.08) < 1e-6  # float32 column


class TestBmp:
    """24-bit uncompressed BMP: byte-layout codec (bottom-up BGR rows,
    4-byte stride padding)."""

    def test_roundtrip_including_padding_widths(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_bmp, encode_bmp

        rng = np.random.RandomState(3)
        for w in (1, 2, 3, 4, 5, 7):  # widths exercising every pad amount
            arr = rng.randint(0, 256, size=(4, w, 3), dtype=np.uint8)
            got = decode_bmp(encode_bmp(arr))
            assert got.shape == arr.shape and (got == arr).all(), w

    def test_bmp_and_ppm_features_agree(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_bmp, encode_bmp

        rng = np.random.RandomState(4)
        arr = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert image_features(decode_bmp(encode_bmp(arr))) == image_features(
            decode_ppm(encode_ppm(arr))
        )

    def test_sniff_and_dispatch(self):
        from lexam_data_pipeline_spark.ml.media_codecs import encode_bmp

        payload = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
        assert sniff(payload) == "bmp"
        assert decode_features(payload)[:2] == [2.0, 2.0]

    def test_unsupported_variants_rejected(self):
        import struct as _struct

        from lexam_data_pipeline_spark.ml.media_codecs import decode_bmp, encode_bmp

        payload = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        _struct.pack_into("<H", payload, 28, 8)  # depth → 8-bit
        with pytest.raises(NotImplementedError, match="8-bit"):
            decode_bmp(bytes(payload))
        payload = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        _struct.pack_into("<I", payload, 30, 1)  # compression → RLE8
        with pytest.raises(NotImplementedError, match="compressed"):
            decode_bmp(bytes(payload))

    def test_roundtrip_random_images(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        from lexam_data_pipeline_spark.ml.media_codecs import decode_bmp, encode_bmp

        @settings(max_examples=40, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(st.integers(1, 12), st.integers(1, 12), st.just(3)),
            )
        )
        def roundtrip(arr):
            assert (decode_bmp(encode_bmp(arr)) == arr).all()

        roundtrip()

    def test_resize_media_handles_bmp(self, spark):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_bmp, encode_bmp
        from lexam_data_pipeline_spark.ml.multimodal import resize_media

        rng = np.random.RandomState(5)
        arr = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        media = spark.createDataFrame(
            [(1, bytearray(encode_bmp(arr)), "image", 8, 8, 0)],
            "media_id long, payload binary, media_type string, width int, height int, n_bytes long",
        )
        out = resize_media(media, 4, 4, deterministic_fake=False).collect()[0]
        assert (decode_bmp(bytes(out["payload"])) == resize_nearest(arr, 4, 4)).all()


class TestJpeg:
    """Baseline JPEG codec.  Verification strategy (no image library
    exists in this container to act as an oracle): the DECODER is
    checked non-circularly against hand-assembled byte streams built
    in this test straight from T.81 (DC-only blocks whose huffman bits
    are computed by hand), including a 4:2:0 fixture that exercises the
    interleaved-MCU + upsampling path the encoder (4:4:4 only) never
    produces; the ENCODER is then checked through decode roundtrips."""

    # -- hand-built fixtures -------------------------------------------
    @staticmethod
    def _tables_segments() -> bytes:
        """DQT (all-16 table, id 0) + DHT (DC: 12 cats at 4 bits -> code
        == category; AC: 162 symbols at 8 bits, sorted -> EOB is symbol
        0x00 = first = code 0) — written literally, independent of the
        encoder's table constants."""
        import struct as st

        dqt = b"\xff\xdb" + st.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
        dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
        dc_vals = bytes(range(12))
        ac_syms = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
        ac_bits = bytes([0] * 7 + [len(ac_syms)] + [0] * 8)
        dht = (
            b"\xff\xc4" + st.pack(">H", 19 + 12) + bytes([0x00]) + dc_bits + dc_vals
            + b"\xff\xc4" + st.pack(">H", 19 + len(ac_syms)) + bytes([0x10])
            + ac_bits + bytes(ac_syms)
        )
        return dqt + dht

    @staticmethod
    def _bits_to_bytes(bits: str) -> bytes:
        bits += "1" * (-len(bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = int(bits[i : i + 8], 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)

    def test_handbuilt_grayscale_dc_only(self):
        """8x8 gray, all pixels 128: DC diff 0 -> DC code '0000' (cat 0),
        EOB '00000000'; quant irrelevant for a zero block."""
        import struct as st

        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg

        sof = (
            b"\xff\xc0" + st.pack(">H", 11) + bytes([8]) + st.pack(">HH", 8, 8)
            + bytes([1]) + bytes([1, 0x11, 0])
        )
        sos = b"\xff\xda" + st.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0x3F, 0])
        entropy = self._bits_to_bytes("0000" + "00000000")
        jpg = b"\xff\xd8" + self._tables_segments() + sof + sos + entropy + b"\xff\xd9"
        out = decode_jpeg(jpg)
        assert out.shape == (8, 8, 1)
        assert (out == 128).all()

    def test_handbuilt_420_solid_color(self):
        """16x16 RGB at 4:2:0: one MCU = 4 Y blocks + Cb + Cr.  DC-only
        values chosen so YCbCr=(124,86,182) -> RGB=(200,100,50) exactly.
        Hand bits: Y1 diff -2 (cat2 '0010' + '01'), Y2-4 diff 0, Cb diff
        -21 (cat5 '0101' + '01010'), Cr diff 27 (cat5 '0101' + '11011')."""
        import struct as st

        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg

        sof = (
            b"\xff\xc0" + st.pack(">H", 17) + bytes([8]) + st.pack(">HH", 16, 16)
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        )
        sos = b"\xff\xda" + st.pack(">H", 12) + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0x3F, 0])
        eob = "00000000"
        bits = (
            "0010" + "01" + eob            # Y1: diff -2 -> DC -2*16=-32 -> Y 124
            + ("0000" + eob) * 3           # Y2..Y4: diff 0 (pred carries)
            + "0101" + "01010" + eob       # Cb: diff -21 -> -336 -> 86
            + "0101" + "11011" + eob       # Cr: diff 27 -> 432 -> 182
        )
        jpg = b"\xff\xd8" + self._tables_segments() + sof + sos + self._bits_to_bytes(bits) + b"\xff\xd9"
        out = decode_jpeg(jpg)
        assert out.shape == (16, 16, 3)
        assert (out == np.array([200, 100, 50], dtype=np.uint8)).all()

    # -- roundtrips ----------------------------------------------------
    def test_roundtrip_solid_exact(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg, encode_jpeg

        for v in (0, 77, 128, 255):
            img = np.full((12, 20, 3), v, np.uint8)
            assert (decode_jpeg(encode_jpeg(img, 90)) == img).all(), v

    def test_roundtrip_smooth_gradient_close(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg, encode_jpeg

        yy, xx = np.mgrid[0:24, 0:40]
        img = np.stack(
            [(yy * 5) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256], axis=2
        ).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0

    def test_roundtrip_restart_markers(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg, encode_jpeg

        yy, xx = np.mgrid[0:17, 0:33]
        img = ((yy * 7 + xx * 3) % 256).astype(np.uint8)[:, :, None]
        a = decode_jpeg(encode_jpeg(img, 85))
        b = decode_jpeg(encode_jpeg(img, 85, restart_interval=2))
        # restart segmentation must not change decoded pixels at all
        assert (a == b).all()

    def test_roundtrip_random_images_bounded_error(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg, encode_jpeg

        @settings(max_examples=15, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(
                    st.integers(1, 20), st.integers(1, 20), st.sampled_from([1, 3])
                ),
            ),
            st.sampled_from([60, 85, 95]),
        )
        def roundtrip(img, q):
            dec = decode_jpeg(encode_jpeg(img, q))
            assert dec.shape == img.shape
            assert dec.dtype == np.uint8
            # lossy bound: worst case (noise) stays within gross range
            assert np.abs(dec.astype(int) - img.astype(int)).mean() < 90.0

        roundtrip()

    # -- honesty / dispatch --------------------------------------------
    def test_progressive_raises(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg, encode_jpeg

        enc = encode_jpeg(np.zeros((8, 8, 1), np.uint8))
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xc2", 1))

    def test_truncated_raises(self):
        from lexam_data_pipeline_spark.ml.media_codecs import decode_jpeg, encode_jpeg

        enc = encode_jpeg(np.full((8, 8, 3), 9, np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) // 2])

    def test_sniff_and_decode_features(self):
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_features,
            encode_jpeg,
            sniff,
        )

        img = np.full((10, 10, 3), 100, np.uint8)
        enc = encode_jpeg(img, 95)
        assert sniff(enc) == "jpeg"
        feats = decode_features(enc)
        assert feats is not None and feats[0] == 10 and feats[1] == 10
        assert abs(feats[2] - 100) < 2  # mean R on a solid image


class TestAdam7:
    """Adam7 interlaced PNG: 7 independently-filtered sub-images
    scattered by the spec pass grid (round-6 verdict item 4)."""

    def test_interlaced_roundtrip_random_images(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png,
        )

        @settings(max_examples=60, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(
                    st.integers(1, 20),
                    st.integers(1, 20),
                    st.sampled_from([1, 2, 3, 4]),
                ),
            ),
            st.integers(0, 4),
        )
        def roundtrip(arr, filter_type):
            enc = encode_png(arr, filter_type=filter_type, interlace=True)
            dec = decode_png(enc)
            assert dec.shape == arr.shape
            assert (dec == arr).all()

        roundtrip()

    def test_interlaced_palette_roundtrip(self):
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays

        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png_palette,
        )

        @settings(max_examples=40, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(st.integers(1, 15), st.integers(1, 15)),
                elements=st.integers(0, 15),
            ),
            arrays(np.uint8, st.just((16, 3))),
            st.integers(0, 4),
        )
        def roundtrip(idx, palette, filter_type):
            payload = encode_png_palette(
                idx, palette, filter_type=filter_type, interlace=True
            )
            assert (decode_png(payload) == palette[idx]).all()

        roundtrip()

    def test_interlaced_equals_sequential_decode(self):
        """Both encodings of the same array decode identically — the
        deinterlace is pure byte reordering, no value change."""
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png,
        )

        rng = np.random.RandomState(11)
        arr = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
        seq = decode_png(encode_png(arr, filter_type=4))
        lac = decode_png(encode_png(arr, filter_type=4, interlace=True))
        assert (seq == lac).all()

    def test_small_images_skip_empty_passes(self):
        """A 1×1 image uses ONLY pass 1 (the other six are empty and
        contribute zero bytes — not even filter bytes); 2×2 uses passes
        1/6/7.  Exactness across those edge grids pins the empty-pass
        arithmetic."""
        from lexam_data_pipeline_spark.ml.media_codecs import (
            _adam7_passes,
            decode_png,
            encode_png,
        )

        assert len(list(_adam7_passes(1, 1))) == 1
        assert len(list(_adam7_passes(2, 2))) == 3
        assert len(list(_adam7_passes(8, 8))) == 7
        for h, w in [(1, 1), (2, 2), (1, 7), (7, 1), (4, 4), (5, 3)]:
            arr = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
            assert (decode_png(encode_png(arr, interlace=True)) == arr).all()

    @staticmethod
    def _rebuild_idat(payload: bytes, mutate) -> bytes:
        """Decompress the IDAT, apply ``mutate`` to the raw scanline
        stream, recompress, and rebuild the PNG with VALID chunk CRCs —
        so the decoder's own size arithmetic (not the CRC gate) is what
        a test exercises."""
        import struct
        import zlib as _zlib

        from lexam_data_pipeline_spark.ml.media_codecs import PNG_SIG

        pos, out, raw = 8, [], b""
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if ctype == b"IDAT":
                raw += data
            else:
                out.append((ctype, data))
            pos += 12 + length
        new_idat = _zlib.compress(mutate(_zlib.decompress(raw)))
        rebuilt = PNG_SIG
        for ctype, data in out:
            if ctype == b"IEND":
                break
            rebuilt += (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )
        rebuilt += (
            struct.pack(">I", len(new_idat)) + b"IDAT" + new_idat
            + struct.pack(">I", _zlib.crc32(b"IDAT" + new_idat) & 0xFFFFFFFF)
        )
        rebuilt += (
            struct.pack(">I", 0) + b"IEND"
            + struct.pack(">I", _zlib.crc32(b"IEND") & 0xFFFFFFFF)
        )
        return rebuilt

    def test_truncated_interlaced_stream_fails_loudly(self):
        """A REAL truncation (valid CRCs, last pass bytes missing) must
        trip the decoder's per-pass/total size arithmetic — the
        'Adam7 stream size mismatch' guard — not return garbage
        (round-6 review finding: the old test only reached the CRC
        gate, leaving the size arithmetic uncovered)."""
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_png,
            encode_png,
        )

        arr = np.arange(9 * 9 * 3, dtype=np.uint8).reshape(9, 9, 3)
        enc = bytes(encode_png(arr, interlace=True))
        # drop the final pass-7 scanline: per-pass unfilter sizes still
        # line up for passes 1-6, the total-consumed check must fire
        truncated = self._rebuild_idat(enc, lambda raw: raw[: -(9 * 3 + 1)])
        with pytest.raises(ValueError, match="scanline data size|Adam7 stream"):
            decode_png(truncated)
        # and padding extra bytes past pass 7 must also fail loudly
        padded = self._rebuild_idat(enc, lambda raw: raw + b"\x00" * 5)
        with pytest.raises(ValueError, match="Adam7 stream size mismatch"):
            decode_png(padded)


class TestGIF:
    """GIF87a/89a: LZW + palette, optional interlace — stdlib-only,
    roundtripped against the in-repo encoder (round-7 cheap-remainder
    codec, following the Adam7 pattern)."""

    def test_roundtrip_random_images_exact(self):
        from hypothesis import given, settings, strategies as st

        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_gif,
            encode_gif,
        )

        @given(
            w=st.integers(1, 40),
            h=st.integers(1, 40),
            seed=st.integers(0, 2**31),
            interlace=st.booleans(),
            colors=st.integers(1, 8),
        )
        @settings(max_examples=40, deadline=None)
        def check(w, h, seed, interlace, colors):
            rng = np.random.default_rng(seed)
            palette = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
            arr = palette[rng.integers(0, colors, size=(h, w))]
            dec = decode_gif(encode_gif(arr, interlace=interlace))
            assert np.array_equal(dec, arr)

        check()

    def test_dictionary_growth_past_one_width_step(self):
        """A long structured image forces the LZW code width to grow
        (and with >4096 phrases, a mid-stream CLEAR) — the paths a tiny
        random fixture never reaches."""
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_gif,
            encode_gif,
        )

        y, x = np.mgrid[0:128, 0:128]
        arr = np.stack([(y * 3) % 256, (x * 5) % 256, (x + y) % 256], axis=2)
        arr = (arr & 0xC0).astype(np.uint8)  # <=64 distinct colors
        assert np.array_equal(decode_gif(encode_gif(arr)), arr)

    def test_interlaced_equals_sequential_decode(self):
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_gif,
            encode_gif,
        )

        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        arr = pal[rng.integers(0, 16, (21, 13))]
        seq = decode_gif(encode_gif(arr, interlace=False))
        inter = decode_gif(encode_gif(arr, interlace=True))
        assert np.array_equal(seq, inter)

    def test_sniff_and_decode_features(self):
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_features,
            encode_gif,
            sniff,
        )

        img = np.full((6, 9, 3), 77, np.uint8)
        enc = encode_gif(img)
        assert sniff(enc) == "gif"
        feats = decode_features(enc)
        assert feats is not None and feats[0] == 6 and feats[1] == 9
        assert abs(feats[2] - 77) < 1e-9

    def test_truncated_and_corrupt_fail_loudly(self):
        import pytest

        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_gif,
            encode_gif,
        )

        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        arr = pal[rng.integers(0, 4, (12, 12))]
        enc = bytearray(encode_gif(arr))
        with pytest.raises(ValueError):
            decode_gif(bytes(enc[:20]))  # header only: no image block
        # chop the data sub-blocks: decoder must not fabricate pixels
        cut = bytes(enc[: len(enc) // 2]) + b"\x00\x3b"
        with pytest.raises(ValueError):
            decode_gif(cut)

    def test_too_many_colors_rejected(self):
        import pytest

        from lexam_data_pipeline_spark.ml.media_codecs import encode_gif

        rng = np.random.default_rng(9)
        with pytest.raises(ValueError, match="quantize"):
            encode_gif(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))

    def test_256_color_min_code_size_8(self):
        """A full 256-color palette needs min LZW code size 8 — the
        widest initial dictionary the format allows."""
        from lexam_data_pipeline_spark.ml.media_codecs import (
            decode_gif,
            encode_gif,
        )

        pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3)
        arr = pal[np.arange(256).reshape(16, 16) % 256]
        assert np.array_equal(decode_gif(encode_gif(arr)), arr)


class TestLzwFinalCodeWidthBump:
    """Round-8 advice fix: the decoder inserts an implied table entry
    for the FINAL data code and may bump its read width before EOI; the
    encoder must mirror that bookkeeping instead of relying on LSB-first
    zero padding.  Construct streams whose final-code insertion lands
    exactly ON a width boundary and prove the roundtrip."""

    def _roundtrip(self, indices: bytes, min_code_size: int) -> bytes:
        from lexam_data_pipeline_spark.ml.media_codecs import (
            _lzw_decode,
            _lzw_encode,
        )

        data = _lzw_encode(indices, min_code_size)
        return _lzw_decode(data, min_code_size, len(indices))

    def test_boundary_final_codes_all_small_alphabets(self):
        """Sweep stream lengths across every width boundary for 2-, 4-
        and 16-symbol alphabets: each length ends its stream at a
        different distance from a bump, so the exact final-code-on-
        boundary case is guaranteed to occur in the sweep."""
        import itertools

        for mcs in (1, 2, 4):
            n_sym = 1 << mcs
            # non-repeating-pair stream → one table insert per code
            base = bytes(
                a
                for a, b in itertools.product(range(n_sym), repeat=2)
                for a in (a, b)
            )
            stream = (base * 40)[:600]
            for ln in range(2, 140):
                s = stream[:ln]
                assert self._roundtrip(s, mcs) == s, (mcs, ln)

    def test_endings_swept_across_dictionary_reset(self):
        """Sweep stream endings across the region where the 4096-entry
        dictionary CLEAR fires, so endings land both just-before and
        just-after a reset — including the first-code-after-clear case
        the encoder's bump bookkeeping must NOT touch
        (first_since_clear guard)."""
        import hashlib

        raw = b"".join(
            hashlib.md5(str(i).encode()).digest() for i in range(700)
        )
        stream = bytes(b & 0xF for b in raw)  # 11200 high-entropy nibbles
        # the 4096th table insert lands near symbol 9271 for this stream
        # (verified by replaying the insert count); sweep endings across
        # that region with step 1 right around it
        for ln in (*range(9000, 9250, 13), *range(9250, 9330), *range(9330, 9800, 13)):
            s = stream[:ln]
            assert self._roundtrip(s, 4) == s, ln
