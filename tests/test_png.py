"""Built-in PNG codec (pg2any_spark.functions.png): real decode of
real PNG bytes — round trips, every scanline filter, resize math."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pg2any_spark.functions import png as P


@pytest.mark.parametrize(
    "shape",
    [(7, 5), (7, 5, 1), (4, 9, 3), (3, 3, 4), (1, 1), (2, 1, 2)],
)
def test_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % (2**31))
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    got = P.decode_png(P.encode_png(arr))
    want = arr[:, :, 0] if arr.ndim == 3 and arr.shape[2] == 1 else arr
    assert np.array_equal(got, want)


def test_encode_deterministic():
    arr = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    assert P.encode_png(arr) == P.encode_png(arr)


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference forward filtering (PNG spec §9) to craft scanlines the
    encoder never emits, so decode's unfilter paths are exercised."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y, f in zip(range(h), filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out.extend(line.astype(np.uint8).tobytes())
    return bytes(out)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def test_decode_all_filters():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    raw = _forward_filter(img, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    data = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        # split IDAT in two to exercise multi-chunk reassembly
        + _chunk(b"IDAT", zlib.compress(raw)[:10])
        + _chunk(b"IDAT", zlib.compress(raw)[10:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(data), img)


def test_decode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"GIF89a...")
    # 16-bit depth is out of profile
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        P.decode_png(data)


def test_resize_nearest_math():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = P.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    # floor(i * 4 / 8) → each source pixel duplicated 2×2
    assert np.array_equal(up[:2, :2], np.full((2, 2), img[0, 0]))
    down = P.resize_nearest(img, 2, 2)
    assert np.array_equal(down, img[[0, 2]][:, [0, 2]])
    # identity when dims match
    assert np.array_equal(P.resize_nearest(img, 4, 4), img)
