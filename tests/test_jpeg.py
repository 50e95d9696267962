"""Baseline JPEG codec tests (`sources/jpeg.py`).

Round-trip tests alone can hide symmetric bugs (an error the encoder
and decoder share cancels out), so the building blocks are pinned
independently: DCT/IDCT as exact inverses, canonical Huffman code
construction against spec-known codewords, zigzag as a permutation,
magnitude/EXTEND as inverses — plus structural checks on the emitted
marker segments."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pm25ml_spark.sources.jpeg import (
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _extend,
    _magnitude,
    build_huffman_codes,
    dct2,
    decode_jpeg,
    encode_jpeg,
    idct2,
)


def _test_image(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (128 + 100 * np.sin(xx / 9.0)).clip(0, 255),
            (128 + 100 * np.cos(yy / 7.0)).clip(0, 255),
            (xx * 255 / w).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-9))


class TestBuildingBlocks:
    def test_dct_idct_inverse(self):
        rng = np.random.RandomState(0)
        blocks = rng.uniform(-128, 127, (10, 8, 8))
        np.testing.assert_allclose(idct2(dct2(blocks)), blocks, atol=1e-10)

    def test_dct_dc_is_block_mean(self):
        block = np.full((1, 8, 8), 12.0)
        coefs = dct2(block)
        # orthonormal DCT: DC = 8 * mean
        assert coefs[0, 0, 0] == pytest.approx(96.0)
        assert np.abs(coefs[0]).sum() == pytest.approx(96.0)

    def test_huffman_canonical_codes(self):
        codes = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        # spec-known: first (shortest) DC luma codeword is '00' for symbol 0
        assert codes[0] == (0b00, 2)
        assert codes[1] == (0b010, 3)  # next in canonical order
        # prefix-free: no code is a prefix of another
        as_bits = {
            format(c, f"0{n}b") for c, n in codes.values()
        }
        for a in as_bits:
            for b in as_bits:
                assert a == b or not b.startswith(a)

    def test_zigzag_is_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))
        # spec-known prefix of the scan order
        assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]

    def test_magnitude_extend_inverse(self):
        for v in [-255, -128, -1, 0, 1, 2, 127, 255]:
            n = _magnitude(v)
            code = v if v >= 0 else v + (1 << n) - 1
            assert _extend(code, n) == v


class TestRoundTrip:
    def test_rgb_quality90(self):
        img = _test_image()
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == img.shape
        assert _psnr(out, img) > 40

    def test_rgb_subsampled_420(self):
        img = _test_image()
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert _psnr(out, img) > 32

    def test_grayscale(self):
        g = (np.mgrid[0:40, 0:56][0] * 255 / 40).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=95))
        assert out.shape == g.shape
        assert _psnr(out, g) > 42

    def test_restart_markers(self):
        img = _test_image()
        data = encode_jpeg(img, quality=90, restart_interval=4)
        assert b"\xff\xdd" in data  # DRI present
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
        assert _psnr(decode_jpeg(data), img) > 40

    def test_non_multiple_of_8_dims(self):
        img = _test_image(h=21, w=35)
        out = decode_jpeg(encode_jpeg(img, quality=92))
        assert out.shape == (21, 35, 3)
        assert _psnr(out, img) > 38

    def test_odd_dims_subsampled(self):
        img = _test_image(h=21, w=35)
        out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
        assert out.shape == (21, 35, 3)
        assert _psnr(out, img) > 30

    def test_quality_monotone(self):
        img = _test_image()
        sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
        assert sizes == sorted(sizes)


class TestStructureAndErrors:
    def test_marker_layout(self):
        data = encode_jpeg(_test_image(), quality=80)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
        # SOF0 dims parse back
        i = data.index(b"\xff\xc0")
        h, w = struct.unpack(">HH", data[i + 5 : i + 9])
        assert (h, w) == (48, 64)

    def test_unsupported_process_rejected(self):
        # SOI + minimal SOF3 (lossless) segment — still out of scope
        # (SOF2 progressive became a supported process in round 6)
        data = b"\xff\xd8" + b"\xff\xc3" + struct.pack(">H", 11) + bytes(9)
        with pytest.raises(ValueError, match="unsupported JPEG process"):
            decode_jpeg(data)

    def test_not_jpeg_rejected(self):
        with pytest.raises(ValueError, match="missing SOI"):
            decode_jpeg(b"\x89PNG....")

    def test_truncated_stream(self):
        data = encode_jpeg(_test_image(), quality=80)
        with pytest.raises(ValueError):
            decode_jpeg(data[: len(data) // 2])


class TestMultimodalIntegration:
    def test_decode_to_array_jpeg(self):
        from pm25ml_spark.sources.multimodal import decode_to_array

        img = _test_image()
        payload = encode_jpeg(img, quality=92)
        gray = decode_to_array(payload, img.shape[1], img.shape[0])
        assert gray.shape == (48, 64)
        # luma of the decoded RGB ≈ luma of the original
        from pm25ml_spark.sources.imaging import to_grayscale

        assert _psnr(gray, to_grayscale(img)) > 38

    def test_spark_feature_extraction_over_jpeg(self, spark):
        """JPEG payloads through the distributed feature extractor."""
        import pandas as pd

        from pm25ml_spark.sources.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        rows = []
        for i in range(6):
            img = _test_image(h=24 + 8 * (i % 2), w=32)
            payload = encode_jpeg(img, quality=85, subsample=i % 2 == 0)
            rows.append(
                (i, "image", "jpeg", img.shape[1], img.shape[0], len(payload),
                 bytearray(payload))
            )
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        feats = extract_features(media).toPandas().sort_values("media_id")
        assert len(feats) == 6
        assert feats["mean_intensity"].between(80, 180).all()
        assert (feats["std_intensity"] > 0).all()


class TestProgressive:
    """SOF2: spectral selection + successive approximation (round 6).

    The progressive encoder emits the SAME quantized coefficients as the
    baseline encoder at 4:4:4, so decode(progressive) must equal
    decode(baseline) bit-for-bit — any drift means a scan decoder bug.
    """

    def test_gray_bit_matches_baseline(self):
        from pm25ml_spark.sources.jpeg import encode_jpeg_progressive

        img = _test_image(h=29, w=43)
        base = decode_jpeg(encode_jpeg(img, quality=80))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=80))
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("quality", [50, 85, 95])
    def test_rgb_bit_matches_baseline(self, quality):
        from pm25ml_spark.sources.jpeg import encode_jpeg_progressive

        rng = np.random.RandomState(11 + quality)
        img = rng.randint(0, 256, (37, 26, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=quality))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("shape", [(52, 20), (17, 17), (9, 57), (16, 16)])
    def test_subsampled_420_progressive_matches_baseline(self, shape):
        """4:2:0 + progressive — the real web-crawl default. Exercises
        the interleaved DC MCU walk (4 Y blocks per MCU) and the
        non-interleaved AC scans over each component's OWN ceil-dims
        grid, which at 4:2:0 is a strict subset of the MCU-padded grid
        (shapes chosen to make them differ)."""
        from pm25ml_spark.sources.jpeg import encode_jpeg_progressive

        rng = np.random.RandomState(sum(shape))
        img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=75, subsample=True))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=75, subsample=True)
        )
        assert np.array_equal(base, prog)

    def test_progressive_is_actually_sof2_multi_scan(self):
        from pm25ml_spark.sources.jpeg import encode_jpeg_progressive

        data = encode_jpeg_progressive(_test_image(), quality=85)
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        assert data.count(b"\xff\xda") >= 4  # spectral-selection scans

    def test_decode_to_array_routes_progressive(self):
        from pm25ml_spark.sources.jpeg import encode_jpeg_progressive
        from pm25ml_spark.sources.multimodal import decode_to_array

        from pm25ml_spark.sources.imaging import to_grayscale

        img = _test_image(h=24, w=32)
        arr = decode_to_array(
            encode_jpeg_progressive(img, quality=90), 32, 24
        )
        assert arr.shape == (24, 32)
        luma = to_grayscale(img).astype(int)
        assert np.abs(arr.astype(int) - luma).mean() < 4

    def test_truncated_progressive_quarantines(self):
        from pm25ml_spark.sources.jpeg import encode_jpeg_progressive

        data = encode_jpeg_progressive(_test_image(), quality=85)
        # cut inside the FIRST scan: decode cannot finish any band
        first_sos = data.find(b"\xff\xda")
        with pytest.raises(ValueError):
            decode_jpeg(data[: first_sos + 20])


def test_dc_predictor_overflow_is_masked_not_deprecated():
    """A hostile progressive stream can walk the DC predictor past 2^31;
    the store into the int32 coefficient plane must be an EXPLICIT masked
    cast. NumPy 1.x raises DeprecationWarning on implicit out-of-bound
    Python-int -> int32 stores and NumPy 2 makes it an OverflowError, so
    this runs with warnings-as-errors to pin the future-proof path."""
    import warnings

    from pm25ml_spark.sources.jpeg import _dc_prog

    class _Huff:
        def decode(self, reader):
            return 15  # max-size DC diff every block

    class _Reader:
        def receive(self, n):
            return (1 << n) - 1  # all-ones: maximal positive diff

        def bit(self):
            return 1

    preds = {1: 2**40}  # predictor already far outside int32
    zz = np.zeros(64, dtype=np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning class fails
        _dc_prog(_Reader(), {0: _Huff()}, {1: (0, 0)}, preds, 1, zz, 0, 13)
    want = ((preds[1] << 13) + 2**31) % 2**32 - 2**31
    assert int(zz[0]) == want  # wrapped, deterministic, no crash
