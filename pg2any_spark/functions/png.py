"""Minimal real PNG codec (stdlib zlib + numpy) for the multimodal
operators.

Supports the common still-image profile: 8-bit depth, grayscale /
gray+alpha / RGB / RGBA, non-interlaced, all five scanline filters on
decode (encode emits filter 0). This is a *real* decoder — it parses
actual PNG bytes per the PNG specification (RFC 2083) — so the
multimodal pipeline has a working kernel even in environments without
PIL/opencv; PIL, when installed, remains the fast path for every other
format (see ``operators.multimodal``).

Perf note: unfiltering is sequential by specification (each byte
depends on the previous reconstructed byte) — filters 1/3/4 fall back
to a per-byte loop. Fine for the mapInPandas batch path where decode
cost is dominated by payload IO; swap in PIL for throughput-critical
image corpora.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count (spec §11.2.2).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H×W gray, or H×W×{1,2,3,4}) → PNG bytes.

    Emits filter 0 on every scanline: deterministic output (same array
    → same bytes, any zlib level aside — level pinned to 6), which is
    what makes PNG payloads content-addressable downstream."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = arr.shape
    color = _COLOR_TYPE[ch]
    body = arr.reshape(h, w * ch)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H×W for grayscale, else H×W×C).

    Handles chunk traversal, multi-IDAT streams, and all five scanline
    filters (None/Sub/Up/Average/Paeth). Rejects interlaced, paletted,
    and 16-bit images — out of profile for this kernel; use PIL."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit non-interlaced "
            "gray/gray+alpha/RGB/RGBA are in profile"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        cur = row.astype(np.int32)
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 2:  # Up — vectorizable (depends only on prior row)
            cur = (cur + prev) & 0xFF
        elif f == 1:  # Sub
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: source index =
    ``floor(i * src / dst)`` — pure integer math, identical on every
    engine/platform (no fp rounding in the index map)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(target_h, dtype=np.int64) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w, dtype=np.int64) * w) // target_w, w - 1)
    return img[ys][:, xs]
