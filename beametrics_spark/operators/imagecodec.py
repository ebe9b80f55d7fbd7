"""Pure-numpy BMP and PPM codecs — the real (non-stub) decode path for
multimodal columns.

No image library exists in this container, but BMP (BITMAPINFOHEADER,
24-bit uncompressed) and PPM (P6) need none: both are header + raw RGB
samples. Implementing them gives ``decode_media(fake=False)`` a real
leg whose Spark-side plumbing (binary column → Arrow batch → parsed
dims/features) is identical to what a PIL/ffmpeg-backed decoder would
use at 100 TB — swap the parser, keep the pipeline.

Layout references are the public format specs: Windows BITMAPFILEHEADER
(14 bytes, 'BM' magic, pixel-array offset at byte 10) +
BITMAPINFOHEADER (40 bytes, little-endian width/height/bpp), rows
bottom-up, BGR order, each row padded to 4 bytes; and netpbm P6
(ASCII "P6", whitespace/comment-separated width/height/maxval, then
binary RGB triples).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_PIXEL_OFFSET = 54  # 14-byte file header + 40-byte info header


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_PIXEL_OFFSET + img_size, 0, 0, BMP_PIXEL_OFFSET
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, BGR sample order
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit uncompressed BMP bytes → (width, height, RGB uint8 (h,w,3))."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, w, h = struct.unpack_from("<Iii", data, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported, got {bpp}/{compression}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1]  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → binary P6 PPM bytes."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def decode_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """Binary P6 PPM bytes → (width, height, RGB uint8 (h,w,3)).

    Header tokens may be separated by any whitespace and interleaved
    with '#' comment lines, per the netpbm spec.
    """
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    # single whitespace after maxval, then raster begins; tolerate a
    # CRLF-writing encoder (else every sample would shift one byte) —
    # but ONLY when the 2-byte skip is the interpretation consistent
    # with the declared dimensions: a spec-valid file whose header ends
    # with a lone '\r' may legitimately start its raster with 0x0A
    if data[pos : pos + 2] == b"\r\n" and len(data) - pos - 2 == w * h * 3:
        pos += 2
    else:
        pos += 1
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    raw = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, raw.reshape(h, w, 3)


def decode_image(data: bytes) -> tuple[int, int, np.ndarray]:
    """Sniff BMP vs PPM by magic and decode."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError(f"unrecognized image magic {data[:2]!r}")


# Deterministic fixture formula, shared with the DuckDB oracle: pixel
# channel c of (x, y) in doc d is (d*7 + x*3 + y*5 + c*11) % 256, on a
# (16 + d%17) x (16 + d%13) canvas; even docs serialize as BMP, odd as
# PPM. Everything downstream of the encoder exercises the REAL parser.
def fixture_pixels(doc_id: int) -> np.ndarray:
    w = 16 + doc_id % 17
    h = 16 + doc_id % 13
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((doc_id * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)


def fixture_payload(doc_id: int) -> tuple[str, bytes]:
    px = fixture_pixels(doc_id)
    if doc_id % 2 == 0:
        return "image/bmp", encode_bmp(px)
    return "image/ppm", encode_ppm(px)
