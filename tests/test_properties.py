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


# ---------------------------------------------------------------------------
# pgoutput codec roundtrip (arbitrary relations / values / op sequences)
# ---------------------------------------------------------------------------

import base64
import datetime as _dt

from pg2any_spark.schemas import UNCHANGED_TOAST
from pg2any_spark.sources import pgoutput as PG

_TS = _dt.datetime(2026, 1, 1)

# PG text values cannot contain NUL; hypothesis text() is already
# valid (surrogate-free) unicode
_pg_text = st.text(min_size=0, max_size=20).filter(lambda s: "\x00" not in s)
_cell = st.one_of(st.none(), _pg_text)
_ident = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz_"),
    min_size=1, max_size=8,
)


@st.composite
def _tx_scripts(draw):
    n_cols = draw(st.integers(2, 5))
    cols = ["id"] + [f"c{i}_{draw(_ident)}" for i in range(n_cols - 1)]
    # last column is bytea so binary-mode values are exercised
    oids = [25] * (n_cols - 1) + [17]
    txs = []
    for t in range(draw(st.integers(1, 4))):
        ops = []
        for _ in range(draw(st.integers(1, 5))):
            kind = draw(st.sampled_from(["c", "u", "d"]))
            vals = [draw(_pg_text) or "k"]  # key never null
            for i in range(1, n_cols):
                if oids[i] == 17:
                    v = draw(st.one_of(st.none(), st.binary(max_size=12)))
                else:
                    v = draw(_cell)
                vals.append(v)
            ops.append((kind, vals))
        txs.append(ops)
    return cols, oids, txs


def _expected_map(cols, oids, vals):
    out = {}
    for col, oid, v in zip(cols, oids, vals):
        if isinstance(v, bytes):
            v = base64.b64encode(v).decode("ascii")
        out[col] = v
    return out


def _encode_tx(ops, xid, lsn0, stream_xid=None):
    frames = []
    for i, (kind, vals) in enumerate(ops):
        old = [vals[0]] + [None] * (len(vals) - 1)
        if kind == "c":
            frames.append(PG.encode_insert(7, vals, stream_xid=stream_xid))
        elif kind == "u":
            frames.append(PG.encode_update(
                7, vals, old_values=old, old_kind="K",
                stream_xid=stream_xid))
        else:
            frames.append(PG.encode_delete(
                7, old, old_kind="K", stream_xid=stream_xid))
    return frames


@given(_tx_scripts())
@settings(max_examples=40, deadline=None)
def test_pgoutput_roundtrip_arbitrary_streams(script):
    cols, oids, txs = script
    rel = PG.encode_relation(
        7, "public", "t",
        [(PG.COL_KEY_FLAG if c == "id" else 0, c, oid, -1)
         for c, oid in zip(cols, oids)],
    )
    dec = PG.PgOutputDecoder()
    dec.feed(rel, 0)
    released = []
    lsn = 10
    for xid, ops in enumerate(txs, start=1):
        assert dec.feed(PG.encode_begin(lsn, _TS, xid), lsn) == []
        for fr in _encode_tx(ops, xid, lsn):
            assert dec.feed(fr, lsn) == []  # buffered until commit
            lsn += 1
        released.extend(dec.feed(PG.encode_commit(lsn, lsn, _TS), lsn))
        lsn += 10
    dec.check_closed("prop")

    flat = [op for ops in txs for op in ops]
    assert len(released) == len(flat)
    for row, (kind, vals) in zip(released, flat):
        assert row["op"] == kind
        assert row["commit_ts"] is not None
        if kind == "c":
            assert row["after"] == _expected_map(cols, oids, vals)
            assert row["before"] is None
        elif kind == "u":
            assert row["after"] == _expected_map(cols, oids, vals)
            assert row["before"]["id"] == vals[0]
        else:
            assert row["after"] is None
            assert row["before"]["id"] == vals[0]
        assert row["key_columns"] == ["id"]


@given(_tx_scripts())
@settings(max_examples=20, deadline=None)
def test_pgoutput_streamed_equals_direct(script):
    cols, oids, txs = script
    rel_cols = [(PG.COL_KEY_FLAG if c == "id" else 0, c, oid, -1)
                for c, oid in zip(cols, oids)]

    def direct():
        dec = PG.PgOutputDecoder()
        dec.feed(PG.encode_relation(7, "public", "t", rel_cols), 0)
        out, lsn = [], 10
        for xid, ops in enumerate(txs, start=1):
            dec.feed(PG.encode_begin(lsn, _TS, xid), lsn)
            for fr in _encode_tx(ops, xid, lsn):
                dec.feed(fr, lsn)
                lsn += 1
            out.extend(dec.feed(PG.encode_commit(lsn, lsn, _TS), lsn))
            lsn += 10
        return out

    def streamed():
        dec = PG.PgOutputDecoder(protocol_version=2)
        dec.feed(PG.encode_relation(7, "public", "t", rel_cols), 0)
        out, lsn = [], 10
        for xid, ops in enumerate(txs, start=1):
            dec.feed(PG.encode_stream_start(xid, True), lsn)
            for fr in _encode_tx(ops, xid, lsn, stream_xid=xid):
                dec.feed(fr, lsn)
                lsn += 1
            dec.feed(PG.encode_stream_stop(), lsn)
            out.extend(dec.feed(
                PG.encode_stream_commit(xid, lsn, lsn, _TS), lsn))
            lsn += 10
        return out

    a, b = direct(), streamed()
    strip = lambda r: {k: v for k, v in r.items() if k != "txid"}  # noqa: E731
    assert [strip(r) for r in a] == [strip(r) for r in b]


@given(st.integers(1, 3), st.data())
@settings(max_examples=25, deadline=None)
def test_pgoutput_toast_sentinel_roundtrip(n_extra, data):
    cols = ["id"] + [f"v{i}" for i in range(n_extra)]
    rel = PG.encode_relation(
        7, "public", "t",
        [(PG.COL_KEY_FLAG if c == "id" else 0, c, 25, -1) for c in cols],
    )
    vals = ["k"] + [
        data.draw(st.sampled_from([UNCHANGED_TOAST, "x", None]))
        for _ in range(n_extra)
    ]
    dec = PG.PgOutputDecoder(toast_merge=True)
    dec.feed(rel, 0)
    dec.feed(PG.encode_begin(5, _TS, 1), 5)
    old = ["k"] + [None] * n_extra
    dec.feed(PG.encode_update(7, vals, old_values=old, old_kind="K"), 5)
    rows = dec.feed(PG.encode_commit(5, 5, _TS), 5)
    assert rows[0]["after"] == dict(zip(cols, vals))
    # and WITHOUT toast_merge the same frame is fatal, never a NULL
    if UNCHANGED_TOAST in vals:
        dec2 = PG.PgOutputDecoder()
        dec2.feed(rel, 0)
        dec2.feed(PG.encode_begin(5, _TS, 1), 5)
        import pytest as _pt

        with _pt.raises(ValueError, match="unchanged-TOAST"):
            dec2.feed(
                PG.encode_update(7, vals, old_values=old, old_kind="K"), 5
            )


@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=200
    ),
    st.integers(min_value=2, max_value=40),
)
@settings(max_examples=20, derandomize=True, deadline=None)
def test_global_rank_and_prefix_sum_match_windows(spark, keys, parts):
    """Property: for ANY key multiset (heavy duplicates included) and
    ANY partition count, global_rank equals the single-partition
    ROW_NUMBER and global_running_sum equals the single-partition
    prefix sum — the literal-boundary bucketing must never duplicate
    or skip a rank, whatever the boundary collapse pattern."""
    from pyspark.sql import Row, Window, functions as F

    from pg2any_spark.operators import similarity as S

    df = spark.createDataFrame(
        [Row(id=i, x=float(k), v=(i % 5) + 1) for i, k in enumerate(keys)]
    ).repartition(4)
    order = [F.col("x"), F.col("id")]
    ranked = S.global_rank(df, order, rank_col="r", num_partitions=parts)
    summed = S.global_running_sum(
        df, order, "v", running_col="s", num_partitions=parts
    )
    w = Window.orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want_r = {
        r["id"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(w)).collect()
    }
    want_s = {
        r["id"]: r["s"]
        for r in df.withColumn("s", F.sum("v").over(wsum)).collect()
    }
    assert {r["id"]: r["r"] for r in ranked.collect()} == want_r
    assert {r["id"]: r["s"] for r in summed.collect()} == want_s


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),
        min_size=2,
        max_size=60,
    ),
)
@settings(max_examples=10, derandomize=True, deadline=None)
def test_exact_auc_matches_pair_counting(spark, rows):
    """Property: for ANY (integer score, label) multiset — tie-heavy
    by construction (scores 0..8) — the histogram+prefix-sum AUC
    equals brute-force Mann-Whitney pair counting: auc_num == 2·U
    where U = Σ_{p,n} [s_p > s_n] + ½[s_p = s_n]."""
    from pyspark.sql import Row

    from pg2any_spark.operators import similarity as S

    df = spark.createDataFrame(
        [Row(s=s, y=bool(y)) for s, y in rows], "s long, y boolean"
    )
    got = S.exact_auc_report(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u2 = sum(
        2 if sp > sn else (1 if sp == sn else 0) for sp in pos for sn in neg
    )
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc_num"] == u2
    assert got["auc_den"] == 2 * len(pos) * len(neg)
