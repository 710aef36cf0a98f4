"""Property-based tests (hypothesis) for the pure-Python kernels —
the components whose input space is too big for example tests: the
PNG codec, dialect literal rendering, and config validation. Spark-free
and fast; `derandomize` keeps CI deterministic."""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from pg2any_spark.config import ConfigError, backoff_seconds, validate_slot_name
from pg2any_spark.functions import png as P
from pg2any_spark.functions.dialects import DIALECTS

SETTINGS = settings(max_examples=60, derandomize=True, deadline=None)


# --- PNG codec -------------------------------------------------------------


@SETTINGS
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    got = P.decode_png(P.encode_png(arr))
    want = arr[:, :, 0] if ch == 1 else arr
    assert np.array_equal(got, want)


@SETTINGS
@given(
    h=st.integers(2, 8),
    w=st.integers(2, 8),
    filters=st.lists(st.integers(0, 4), min_size=8, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_unfilters_every_filter_sequence(h, w, filters, seed):
    """decode must invert ANY per-row filter choice, not just the
    filter-0 rows our encoder emits."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur, prev = flat[y], (flat[y - 1] if y else np.zeros(stride, np.int32))
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b, c = prev[x], (prev[x - 3] if x >= 3 else 0)
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

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    data = (
        P.PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(data), img)


@SETTINGS
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    tw=st.integers(1, 10),
    th=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_properties(h, w, tw, th, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = P.resize_nearest(img, tw, th)
    assert out.shape == (th, tw)
    # every output pixel is a source pixel (nearest-neighbor, no blend)
    assert set(np.unique(out)) <= set(np.unique(img))
    # corners map to source corners
    assert out[0, 0] == img[0, 0]


# --- dialect literal rendering --------------------------------------------


@SETTINGS
@given(
    dialect=st.sampled_from(["mysql", "sqlserver", "sqlite", "ansi"]),
    s=st.text(min_size=0, max_size=40),
)
def test_render_value_escapes_quotes(dialect, s):
    d = DIALECTS[dialect]
    rendered = d.render_value(s)
    if s in ("t", "f"):  # PG bool convention renders as 1/0
        assert rendered in ("1", "0")
        return
    assert rendered.startswith("'") and rendered.endswith("'")
    body = rendered[1:-1]
    # no unescaped single quote may survive in the body
    assert re.search(r"(?<!')'(?!')", body) is None


@SETTINGS
@given(
    dialect=st.sampled_from(["mysql", "sqlserver", "sqlite", "ansi"]),
    b=st.binary(min_size=0, max_size=32),
)
def test_render_hex_roundtrips_bytes(dialect, b):
    d = DIALECTS[dialect]
    rendered = d.render_value(b)
    hex_part = re.sub(r"^(X'|0x)", "", rendered).rstrip("'")
    assert bytes.fromhex(hex_part) == b if b else hex_part in ("", "''")


@SETTINGS
@given(
    dialect=st.sampled_from(["mysql", "sqlserver", "sqlite", "ansi"]),
    ident=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1,
        max_size=20,
    ),
)
def test_quote_identifier_escapes_closer(dialect, ident):
    d = DIALECTS[dialect]
    quoted = d.quote_identifier(ident)
    assert quoted.startswith(d.quote_open) and quoted.endswith(d.quote_close)
    body = quoted[len(d.quote_open):-len(d.quote_close)]
    # the closing quote char only ever appears doubled inside the body
    assert body.replace(d.quote_close * 2, "") .count(d.quote_close) == 0


# --- config ---------------------------------------------------------------


@SETTINGS
@given(attempt=st.integers(0, 100))
def test_backoff_monotone_and_capped(attempt):
    b = backoff_seconds(attempt)
    assert 0 < b <= 30.0
    if attempt > 0:
        assert b >= backoff_seconds(attempt - 1) or b == 30.0


@SETTINGS
@given(s=st.text(min_size=1, max_size=30))
def test_slot_name_validation_matches_charset(s):
    ok = bool(s) and all(c in "abcdefghijklmnopqrstuvwxyz0123456789_" for c in s)
    try:
        validate_slot_name(s)
        assert ok, f"accepted invalid slot name {s!r}"
    except ConfigError:
        assert not ok, f"rejected valid slot name {s!r}"
