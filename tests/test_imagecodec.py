"""BMP/PPM codec unit tests: byte-level golden checks plus round-trips
covering the format traps (row padding, bottom-up order, BGR swizzle,
PPM comment headers)."""

import numpy as np
import pytest

from beametrics_spark.operators.imagecodec import (
    BMP_PIXEL_OFFSET,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    fixture_payload,
    fixture_pixels,
)


def test_bmp_golden_bytes_2x2():
    """Hand-checked 2x2 BMP: header fields, bottom-up rows, BGR order,
    2-byte row padding (2 px * 3 B = 6 → stride 8)."""
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]],   # top row: red, green
         [[0, 0, 255], [10, 20, 30]]], # bottom row: blue, rgb(10,20,30)
        dtype=np.uint8,
    )
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    assert int.from_bytes(data[10:14], "little") == BMP_PIXEL_OFFSET
    assert int.from_bytes(data[18:22], "little") == 2  # width
    assert int.from_bytes(data[22:26], "little") == 2  # height
    assert int.from_bytes(data[28:30], "little") == 24  # bpp
    assert len(data) == BMP_PIXEL_OFFSET + 8 * 2
    raster = data[BMP_PIXEL_OFFSET:]
    # first stored row is the BOTTOM image row, BGR: blue→(255,0,0)
    assert raster[0:6] == bytes([255, 0, 0, 30, 20, 10])
    assert raster[8:14] == bytes([0, 0, 255, 0, 255, 0])


def test_bmp_round_trip_odd_width():
    """Width 3 forces 1-byte padding (9 → 12); pixels must survive."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    w, h, out = decode_bmp(encode_bmp(px))
    assert (w, h) == (3, 5)
    assert np.array_equal(out, px)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX123456")
    # 8-bit BMP header → unsupported
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    data[28] = 8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(data))


def test_ppm_golden_and_comment_header():
    px = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    data = encode_ppm(px)
    assert data == b"P6\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    # same raster with a comment-bearing header must parse identically
    commented = b"P6\n# synthetic fixture\n2 1\n# maxval next\n255\n" + bytes(
        [1, 2, 3, 4, 5, 6]
    )
    w, h, out = decode_ppm(commented)
    assert (w, h) == (2, 1)
    assert np.array_equal(out, px)


def test_ppm_crlf_header():
    """A CRLF-writing encoder must not shift the raster by one byte."""
    px = np.array([[[9, 8, 7], [6, 5, 4]]], dtype=np.uint8)
    crlf = b"P6\r\n2 1\r\n255\r\n" + px.tobytes()
    w, h, out = decode_ppm(crlf)
    assert (w, h) == (2, 1)
    assert np.array_equal(out, px)


def test_ppm_lone_cr_with_0x0a_raster_start():
    """A spec-valid header ending in a lone '\\r' whose raster happens to
    BEGIN with byte 0x0A must not lose its first sample to the CRLF
    tolerance — the 2-byte skip only applies when it is the
    interpretation consistent with the declared dimensions."""
    px = np.array([[[0x0A, 8, 7], [6, 5, 4]]], dtype=np.uint8)
    lone_cr = b"P6\r2 1\r255\r" + px.tobytes()
    w, h, out = decode_ppm(lone_cr)
    assert (w, h) == (2, 1)
    assert np.array_equal(out, px)


def test_ppm_round_trip():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
    w, h, out = decode_ppm(encode_ppm(px))
    assert (w, h) == (7, 4)
    assert np.array_equal(out, px)


def test_decode_image_sniffs_format():
    px = fixture_pixels(2)
    mt_bmp, bmp = fixture_payload(2)   # even → BMP
    mt_ppm, ppm = fixture_payload(3)   # odd → PPM
    assert (mt_bmp, mt_ppm) == ("image/bmp", "image/ppm")
    assert np.array_equal(decode_image(bmp)[2], px)
    w, h, out = decode_image(ppm)
    assert np.array_equal(out, fixture_pixels(3))
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"\x89PNG....")


def test_real_decode_media_rejects_codec_formats(spark, sf_dir):
    """fake=False on media that needs a real codec still raises — the
    honest-stub contract is unchanged for non-BMP/PPM types."""
    from pyspark.errors.exceptions.base import PySparkException

    from beametrics_spark.operators.multimodal import decode_media, media_table

    df = decode_media(media_table(spark, sf_dir), fake=False)
    with pytest.raises(PySparkException, match="no codec"):
        df.collect()
