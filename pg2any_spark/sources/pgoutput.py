"""pgoutput logical-replication wire codec → canonical change events.

The reference consumes PostgreSQL's ``pgoutput`` logical replication
protocol through its author's companion crate (``pg_walstream``,
imported at ``client.rs:10``); the message layout itself is public
PostgreSQL documentation (protocol §55.5, "Logical Replication Message
Formats"). This module implements that layout both ways:

- **encoders** — build wire-exact frames (used by the synthetic WAL
  generator and the golden-byte tests; also what a test harness needs
  to fabricate server traffic),
- **decoder** — parse frames into the engine's canonical
  CHANGE_EVENT_SCHEMA envelope, with the reference's transaction
  semantics: data messages buffer under their transaction and emit ON
  COMMIT stamped with the commit timestamp (the reference's
  transaction manager does exactly this), protocol v2 streamed
  transactions reassemble across Stream Start/Stop segments, and
  Stream Abort discards the buffered subtransaction.

Spark wiring (``decode_wal_segments``): the parallel unit is a WAL
SEGMENT — frames arrive as ``(segment_id, seq, wal_lsn, frame)`` rows
and each segment decodes independently inside one ``applyInPandas``
group, in ``seq`` order, carrying the segment's Relation registry and
open-transaction state in plain Python (both bounded: relations by
table count, buffers by the largest open transaction — the same bound
the reference's transaction manager spills at). Segments must be
self-contained (each re-sends Relation messages before first use, the
behavior real servers exhibit after reconnect); the decoded envelope
then flows into the ordinary appliers, whose max-LSN reduction gives
global order regardless of segment boundaries.
"""

from __future__ import annotations

import datetime
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA, UNCHANGED_TOAST

#: PostgreSQL timestamp epoch (µs since 2000-01-01 UTC).
PG_EPOCH = datetime.datetime(2000, 1, 1)

#: Relation column flag bit: column is part of the replica-identity key.
COL_KEY_FLAG = 1

#: bytea's type oid — the one type whose binary-mode representation is
#: the value itself, so a 'b' tuple kind can be carried faithfully in
#: the text envelope (as base64, the reference's Kafka byte mapping;
#: dialects render it back as hex literals — ``dialects/ansi.rs:35-39``).
OID_BYTEA = 17

_IDENTITY = {"d": "default", "n": "nothing", "f": "full", "i": "index"}
_IDENTITY_REV = {v: k for k, v in _IDENTITY.items()}


# ---------------------------------------------------------------------------
# encoders (wire-exact, big-endian per the protocol)
# ---------------------------------------------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def ts_to_pg_us(ts: datetime.datetime) -> int:
    # exact integer arithmetic: total_seconds() is a float whose ~0.2 µs
    # representation error at 2026-era magnitudes can truncate 1 µs low
    td = ts - PG_EPOCH
    return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds


def encode_begin(final_lsn: int, commit_ts: datetime.datetime, xid: int) -> bytes:
    return b"B" + struct.pack(">QqI", final_lsn, ts_to_pg_us(commit_ts), xid)


def encode_commit(
    commit_lsn: int, end_lsn: int, commit_ts: datetime.datetime, flags: int = 0
) -> bytes:
    return b"C" + struct.pack(
        ">BQQq", flags, commit_lsn, end_lsn, ts_to_pg_us(commit_ts)
    )


def encode_relation(
    rel_id: int,
    namespace: str,
    name: str,
    columns: list[tuple[int, str, int, int]],
    replica_identity: str = "default",
) -> bytes:
    out = [
        b"R",
        struct.pack(">I", rel_id),
        _cstr(namespace),
        _cstr(name),
        _IDENTITY_REV[replica_identity].encode(),
        struct.pack(">H", len(columns)),
    ]
    for flags, col_name, type_oid, type_mod in columns:
        out.append(struct.pack(">B", flags))
        out.append(_cstr(col_name))
        out.append(struct.pack(">Ii", type_oid, type_mod))
    return b"".join(out)


def encode_tuple(values: list[str | bytes | None]) -> bytes:
    """Tuple-data block. ``str`` → text kind 't'; ``bytes`` → binary
    kind 'b' (what a subscriber negotiating the ``binary`` option
    receives); the ``UNCHANGED_TOAST`` sentinel → kind 'u' (unchanged
    TOASTed column, value not sent); ``None`` → 'n'."""
    out = [struct.pack(">H", len(values))]
    for v in values:
        if v is None:
            out.append(b"n")
        elif v == UNCHANGED_TOAST:
            out.append(b"u")
        elif isinstance(v, bytes):
            out.append(b"b" + struct.pack(">I", len(v)) + v)
        else:
            b = v.encode("utf-8")
            out.append(b"t" + struct.pack(">I", len(b)) + b)
    return b"".join(out)


def _xid_prefix(xid: int | None) -> bytes:
    # protocol v2: data messages inside a streamed transaction carry
    # the xid immediately after the message-type byte
    return struct.pack(">I", xid) if xid is not None else b""


def encode_insert(
    rel_id: int, new_values: list[str | None], stream_xid: int | None = None
) -> bytes:
    return (
        b"I"
        + _xid_prefix(stream_xid)
        + struct.pack(">I", rel_id)
        + b"N"
        + encode_tuple(new_values)
    )


def encode_update(
    rel_id: int,
    new_values: list[str | None],
    old_values: list[str | None] | None = None,
    old_kind: str = "K",
    stream_xid: int | None = None,
) -> bytes:
    out = [b"U", _xid_prefix(stream_xid), struct.pack(">I", rel_id)]
    if old_values is not None:
        out.append(old_kind.encode())
        out.append(encode_tuple(old_values))
    out.append(b"N")
    out.append(encode_tuple(new_values))
    return b"".join(out)


def encode_delete(
    rel_id: int,
    old_values: list[str | None],
    old_kind: str = "K",
    stream_xid: int | None = None,
) -> bytes:
    return (
        b"D"
        + _xid_prefix(stream_xid)
        + struct.pack(">I", rel_id)
        + old_kind.encode()
        + encode_tuple(old_values)
    )


def encode_truncate(
    rel_ids: list[int], options: int = 0, stream_xid: int | None = None
) -> bytes:
    return (
        b"T"
        + _xid_prefix(stream_xid)
        + struct.pack(">IB", len(rel_ids), options)
        + b"".join(struct.pack(">I", r) for r in rel_ids)
    )


def encode_stream_start(xid: int, first_segment: bool) -> bytes:
    return b"S" + struct.pack(">IB", xid, 1 if first_segment else 0)


def encode_stream_stop() -> bytes:
    return b"E"


def encode_stream_commit(
    xid: int, commit_lsn: int, end_lsn: int, commit_ts: datetime.datetime
) -> bytes:
    return b"c" + struct.pack(
        ">IBQQq", xid, 0, commit_lsn, end_lsn, ts_to_pg_us(commit_ts)
    )


def encode_stream_abort(xid: int, subxid: int) -> bytes:
    return b"A" + struct.pack(">II", xid, subxid)


# -- two-phase commit (publication option two_phase; protocol §55.5.
# The reference exposes the knob at config.rs:41 and its decoder crate
# carries the frames; here they are first-class codec surface.) -------


def encode_begin_prepare(
    prepare_lsn: int, end_lsn: int, ts: datetime.datetime, xid: int, gid: str
) -> bytes:
    return (
        b"b"
        + struct.pack(">QQqI", prepare_lsn, end_lsn, ts_to_pg_us(ts), xid)
        + _cstr(gid)
    )


def _prepare_frame(
    type_byte: bytes, lsn1: int, lsn2: int, ts: datetime.datetime,
    xid: int, gid: str,
) -> bytes:
    # shared layout of Prepare ('P') / Stream Prepare ('p') / Commit
    # Prepared ('K'): flags, two LSNs, timestamp, xid, gid
    return (
        type_byte
        + struct.pack(">BQQqI", 0, lsn1, lsn2, ts_to_pg_us(ts), xid)
        + _cstr(gid)
    )


def encode_prepare(
    prepare_lsn: int, end_lsn: int, ts: datetime.datetime, xid: int, gid: str
) -> bytes:
    return _prepare_frame(b"P", prepare_lsn, end_lsn, ts, xid, gid)


def encode_stream_prepare(
    prepare_lsn: int, end_lsn: int, ts: datetime.datetime, xid: int, gid: str
) -> bytes:
    return _prepare_frame(b"p", prepare_lsn, end_lsn, ts, xid, gid)


def encode_commit_prepared(
    commit_lsn: int, end_lsn: int, ts: datetime.datetime, xid: int, gid: str
) -> bytes:
    return _prepare_frame(b"K", commit_lsn, end_lsn, ts, xid, gid)


def encode_rollback_prepared(
    prepare_end_lsn: int,
    rollback_end_lsn: int,
    prepare_ts: datetime.datetime,
    rollback_ts: datetime.datetime,
    xid: int,
    gid: str,
) -> bytes:
    return (
        b"r"
        + struct.pack(
            ">BQQqqI", 0, prepare_end_lsn, rollback_end_lsn,
            ts_to_pg_us(prepare_ts), ts_to_pg_us(rollback_ts), xid,
        )
        + _cstr(gid)
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Relation:
    __slots__ = (
        "namespace", "name", "columns", "key_columns", "identity", "types"
    )

    def __init__(self, namespace, name, columns, key_columns, identity,
                 types=None):
        self.namespace = namespace
        self.name = name
        self.columns = columns  # ordered column names
        self.key_columns = key_columns
        self.identity = identity
        self.types = types or []  # ordered column type oids


def _read_cstr(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("utf-8"), end + 1


def _read_tuple(
    buf: bytes, off: int, toast_merge: bool = False
) -> tuple[list[str | bytes | None], int]:
    """Parse one tuple-data block. Text values decode to ``str``;
    kind 'u' (unchanged TOAST — the value was NOT sent) becomes the
    ``UNCHANGED_TOAST`` sentinel when the pipeline opted into
    merge-with-stored-row apply (``toast_merge=True``), and RAISES
    otherwise — a default apply would run the sentinel through the
    typed cast and silently NULL-overwrite the stored value, the one
    unacceptable failure mode; kind 'b' (binary mode) stays raw
    ``bytes`` for ``_to_map`` to validate against the column's type
    oid (only bytea's binary form is its own value)."""
    (n,) = struct.unpack_from(">H", buf, off)
    off += 2
    vals: list[str | bytes | None] = []
    for _ in range(n):
        kind = buf[off : off + 1]
        off += 1
        if kind == b"n":
            vals.append(None)
        elif kind == b"u":
            if not toast_merge:
                raise ValueError(
                    "unchanged-TOAST column ('u') received but the "
                    "apply is not in toast_merge mode: applying it "
                    "would overwrite the stored value with NULL; "
                    "enable toast_merge or use REPLICA IDENTITY FULL "
                    "on the publisher"
                )
            vals.append(UNCHANGED_TOAST)
        elif kind in (b"t", b"b"):
            (ln,) = struct.unpack_from(">I", buf, off)
            off += 4
            if off + ln > len(buf):
                raise ValueError(
                    f"truncated tuple: column declares {ln} bytes, "
                    f"{len(buf) - off} remain"
                )
            raw = buf[off : off + ln]
            vals.append(raw.decode("utf-8") if kind == b"t" else bytes(raw))
            off += ln
        else:
            raise ValueError(f"malformed tuple column kind {kind!r}")
    return vals, off


class PgOutputDecoder:
    """Stateful pgoutput frame decoder for ONE ordered stream/segment.

    ``feed(frame, wal_lsn)`` returns the list of canonical envelope
    rows released by that frame — data frames buffer under their
    transaction and are released by Commit / Stream Commit (stamped
    with the commit timestamp), mirroring the reference's
    transaction-manager semantics; Stream Abort discards. Unknown or
    truncated frames raise (a silently skipped event is replica
    divergence, the one unacceptable failure mode).
    """

    def __init__(self, protocol_version: int = 1, toast_merge: bool = False):
        self.protocol_version = protocol_version
        #: accept unchanged-TOAST ('u') columns as sentinels; off by
        #: default so a pipeline that cannot resolve them fails loudly
        #: at decode instead of silently diverging at apply
        self.toast_merge = toast_merge
        self.relations: dict[int, _Relation] = {}
        self.tx: dict[int, list[dict]] = {}  # xid -> buffered rows
        self.current_xid: int | None = None
        self.in_stream: int | None = None
        # streamed data messages carry the SUBtransaction's xid, so a
        # toplevel's changes can buffer under several xids; Stream
        # Commit must release them all (arrival order) and Stream
        # Abort of a subxid must discard only that subxact's buffer
        self.stream_children: dict[int, list[int]] = {}
        # two-phase: xid -> gid for transactions Prepared but not yet
        # Committed/Rolled-back Prepared; their buffers stay in self.tx
        # so an unresolved prepare at segment end is flagged open
        self.prepared: dict[int, str] = {}

    # -- helpers ---------------------------------------------------------

    def _rel(self, rel_id: int) -> _Relation:
        rel = self.relations.get(rel_id)
        if rel is None:
            raise ValueError(
                f"data message for unknown relation {rel_id}; segments "
                "must re-send Relation before first use"
            )
        return rel

    def _to_map(self, rel: _Relation, vals: list[str | bytes | None]) -> dict:
        out = {}
        for i, (col, v) in enumerate(zip(rel.columns, vals)):
            if isinstance(v, bytes):
                # binary-mode value ('b'): only bytea's binary form IS
                # the value; any other type's network encoding would be
                # silently mis-cast by the text-envelope apply — the
                # one unacceptable failure mode, so fail loudly.
                oid = rel.types[i] if i < len(rel.types) else None
                if oid != OID_BYTEA:
                    raise ValueError(
                        f"binary-mode value for non-bytea column "
                        f"{rel.name}.{col} (type oid {oid}) not "
                        "supported; do not request the binary option"
                    )
                import base64

                v = base64.b64encode(v).decode("ascii")
            out[col] = v
        return out

    def _buffer(self, xid: int | None, row: dict) -> None:
        key = xid if xid is not None else self.current_xid
        if key is None:
            raise ValueError("data message outside any transaction")
        if xid is not None and self.in_stream is not None:
            kids = self.stream_children.setdefault(self.in_stream, [])
            if xid not in kids:
                kids.append(xid)
        self.tx.setdefault(key, []).append(row)

    def _data_xid(self, buf: bytes) -> tuple[int | None, int]:
        """v2 streamed data messages carry xid after the type byte."""
        if self.protocol_version >= 2 and self.in_stream is not None:
            (xid,) = struct.unpack_from(">I", buf, 1)
            return xid, 5
        return None, 1

    # -- main ------------------------------------------------------------

    def _guard_prepared_xid(self, xid: int) -> None:
        # PostgreSQL cannot reassign an xid while its prepared
        # transaction is pending, so a new Begin/Stream Start reusing
        # one means stream corruption or a lost resolution frame —
        # merging onto the held buffer would release prepared rows
        # under an unrelated commit (and make the later Rollback
        # Prepared a silent no-op). Fail loudly instead.
        if xid in self.prepared:
            raise ValueError(
                f"transaction {xid} began while still PREPARED "
                f"(gid {self.prepared[xid]!r}): missing Commit/Rollback "
                "Prepared — corrupt or truncated stream"
            )

    def _pop_prepared(self, frame: bytes, xid: int, gid: str, what: str) -> None:
        held = self.prepared.get(xid)
        if held is None:
            raise ValueError(
                f"{what} for unprepared transaction {xid} (gid {gid!r}): "
                "segments must carry Prepare and its resolution together"
            )
        if held != gid:
            raise ValueError(
                f"{what} for transaction {xid} names gid {gid!r} but the "
                f"prepared gid is {held!r}: mis-paired resolution frame"
            )
        del self.prepared[xid]

    def feed(self, frame: bytes, wal_lsn: int) -> list[dict]:
        t = frame[0:1]
        if t == b"B":
            final_lsn, ts_us, xid = struct.unpack_from(">QqI", frame, 1)
            self._guard_prepared_xid(xid)
            self.current_xid = xid
            self.tx.setdefault(xid, [])
            return []
        if t == b"R":
            off = 1
            if self.protocol_version >= 2 and self.in_stream is not None:
                off += 4  # xid prefix on streamed Relation
            (rel_id,) = struct.unpack_from(">I", frame, off)
            off += 4
            namespace, off = _read_cstr(frame, off)
            name, off = _read_cstr(frame, off)
            identity = _IDENTITY[frame[off : off + 1].decode()]
            off += 1
            (ncols,) = struct.unpack_from(">H", frame, off)
            off += 2
            cols, keys, types = [], [], []
            for _ in range(ncols):
                flags = frame[off]
                off += 1
                col_name, off = _read_cstr(frame, off)
                (type_oid,) = struct.unpack_from(">I", frame, off)
                off += 8  # type oid + typmod (typmod unused)
                cols.append(col_name)
                types.append(type_oid)
                if flags & COL_KEY_FLAG:
                    keys.append(col_name)
            self.relations[rel_id] = _Relation(
                namespace, name, cols, keys, identity, types
            )
            return []
        if t in (b"I", b"U", b"D", b"T"):
            xid, off = self._data_xid(frame)
            if t == b"T":
                nrels, _options = struct.unpack_from(">IB", frame, off)
                off += 5
                rows = []
                for _ in range(nrels):
                    (rel_id,) = struct.unpack_from(">I", frame, off)
                    off += 4
                    rel = self._rel(rel_id)
                    rows.append(
                        self._row(rel, "t", wal_lsn, None, None)
                    )
                for r in rows:
                    self._buffer(xid, r)
                return []
            (rel_id,) = struct.unpack_from(">I", frame, off)
            off += 4
            rel = self._rel(rel_id)
            before = after = None
            if t == b"I":
                if frame[off : off + 1] != b"N":
                    raise ValueError("malformed Insert: missing N tuple")
                after, off = _read_tuple(frame, off + 1, self.toast_merge)
                row = self._row(rel, "c", wal_lsn, None, self._to_map(rel, after))
            elif t == b"U":
                kind = frame[off : off + 1]
                old = None
                if kind in (b"K", b"O"):
                    old, off = _read_tuple(frame, off + 1, self.toast_merge)
                    kind = frame[off : off + 1]
                if kind != b"N":
                    raise ValueError("malformed Update: missing N tuple")
                new, off = _read_tuple(frame, off + 1, self.toast_merge)
                row = self._row(
                    rel,
                    "u",
                    wal_lsn,
                    self._to_map(rel, old) if old is not None else None,
                    self._to_map(rel, new),
                )
            else:  # Delete
                kind = frame[off : off + 1]
                if kind not in (b"K", b"O"):
                    raise ValueError("malformed Delete: missing K/O tuple")
                old, off = _read_tuple(frame, off + 1, self.toast_merge)
                row = self._row(rel, "d", wal_lsn, self._to_map(rel, old), None)
            self._buffer(xid, row)
            return []
        if t == b"C":
            _flags, commit_lsn, _end, ts_us = struct.unpack_from(">BQQq", frame, 1)
            return self._release(self.current_xid, ts_us)
        if t == b"S":
            (xid,) = struct.unpack_from(">I", frame, 1)
            self._guard_prepared_xid(xid)
            self.in_stream = xid
            self.tx.setdefault(xid, [])
            return []
        if t == b"E":
            self.in_stream = None
            return []
        if t == b"c":
            xid, _flags, _clsn, _elsn, ts_us = struct.unpack_from(">IBQQq", frame, 1)
            rows = self._release(xid, ts_us)
            for kid in self.stream_children.pop(xid, []):
                if kid != xid:
                    rows.extend(self._release(kid, ts_us, txid=xid))
            return rows
        if t in (b"O", b"Y", b"M"):
            # metadata frames a real server interleaves with data:
            # Origin (replication origin name), Type (custom type
            # description), Message (pg_logical_emit_message payload).
            # None carries row changes — consume and continue, the
            # behavior downstream CDC consumers (e.g. Debezium's
            # pgoutput adapter) default to. Raising here would wedge a
            # stream on frames that are explicitly informational.
            return []
        if t == b"b":
            # Begin Prepare: opens a two-phase transaction — data
            # buffers exactly like Begin's; release is deferred past
            # Prepare to Commit Prepared.
            _plsn, _elsn, _ts, xid = struct.unpack_from(">QQqI", frame, 1)
            self._guard_prepared_xid(xid)
            self.current_xid = xid
            self.tx.setdefault(xid, [])
            return []
        if t in (b"P", b"p"):
            # Prepare / Stream Prepare: the transaction's changes are
            # complete but HELD — PREPARE TRANSACTION decoupled its
            # durability from its visibility. Nothing releases until
            # Commit Prepared ('K'); Rollback Prepared ('r') discards.
            _f, _plsn, _elsn, _ts, xid = struct.unpack_from(">BQQqI", frame, 1)
            gid, _ = _read_cstr(frame, 30)
            if xid not in self.tx:
                raise ValueError(
                    f"Prepare for unknown transaction {xid} (gid {gid!r}): "
                    "missing Begin Prepare / Stream Start"
                )
            self.prepared[xid] = gid
            if xid == self.current_xid:
                self.current_xid = None
            return []
        if t == b"K":
            # Commit Prepared: release exactly like Commit — including
            # a streamed-prepared toplevel's subtransaction buffers.
            _f, _clsn, _elsn, ts_us, xid = struct.unpack_from(">BQQqI", frame, 1)
            gid, _ = _read_cstr(frame, 30)
            self._pop_prepared(frame, xid, gid, "Commit Prepared")
            rows = self._release(xid, ts_us)
            for kid in self.stream_children.pop(xid, []):
                if kid != xid:
                    rows.extend(self._release(kid, ts_us, txid=xid))
            return rows
        if t == b"r":
            # Rollback Prepared: the prepared buffer (and any streamed
            # subtransaction buffers) dies without a trace.
            (_f, _pelsn, _relsn, _pts, _rts, xid) = struct.unpack_from(
                ">BQQqqI", frame, 1
            )
            gid, _ = _read_cstr(frame, 38)
            self._pop_prepared(frame, xid, gid, "Rollback Prepared")
            for kid in self.stream_children.pop(xid, []):
                self.tx.pop(kid, None)
            self.tx.pop(xid, None)
            return []
        if t == b"A":
            xid, subxid = struct.unpack_from(">II", frame, 1)
            if subxid == xid:
                # whole streamed transaction aborts: drop it and every
                # subtransaction buffered under it
                for kid in self.stream_children.pop(xid, []):
                    self.tx.pop(kid, None)
                self.tx.pop(xid, None)
            else:
                # subtransaction abort: only its buffer dies; the
                # toplevel (and its other subxacts) remain pending
                self.tx.pop(subxid, None)
                kids = self.stream_children.get(xid)
                if kids and subxid in kids:
                    kids.remove(subxid)
            return []
        raise ValueError(f"unknown pgoutput message type {t!r}")

    def open_xids(self) -> list[int]:
        """Transactions left open at stream end: any xid with buffered
        rows no Commit released, every PREPARED-but-unresolved
        transaction (even zero-row: its missing resolution frame is
        truncation), plus an un-committed current transaction.
        Zero-row streamed registrations (Stream Start with no data)
        are not flagged — nothing would be lost."""
        xids = {x for x, rows in self.tx.items() if rows}
        xids.update(self.prepared)
        if self.current_xid is not None:
            xids.add(self.current_xid)
        return sorted(xids)

    def check_closed(self, label) -> None:
        """Raise if the stream/segment ended with open transactions —
        producer truncation or mis-sharding; finishing quietly would
        silently skip their events, the one unacceptable failure mode
        this module documents. (An orphaned Commit already raises;
        this closes the Begin-side hole.)"""
        open_xids = self.open_xids()
        if open_xids:
            raise ValueError(
                f"segment {label} ended with transaction(s) {open_xids} "
                "still open (no Commit seen): truncated or mis-sharded "
                "WAL segment"
            )

    def _row(self, rel, op, lsn, before, after) -> dict:
        return {
            "op": op,
            "schema": rel.namespace,
            "table": rel.name,
            "txid": 0,  # stamped at release
            "lsn": lsn,
            "commit_ts": None,  # stamped at release
            "before": before,
            "after": after,
            "key_columns": list(rel.key_columns) or None,
            "replica_identity": rel.identity,
        }

    def _release(
        self, xid: int | None, ts_us: int, txid: int | None = None
    ) -> list[dict]:
        if xid is None:
            raise ValueError("Commit without Begin")
        rows = self.tx.pop(xid, [])
        ts = PG_EPOCH + datetime.timedelta(microseconds=ts_us)
        for r in rows:
            r["txid"] = txid if txid is not None else xid
            r["commit_ts"] = ts
        if xid == self.current_xid:
            self.current_xid = None
        return rows


class StreamingPgOutputDecoder(PgOutputDecoder):
    """Constant-memory variant: data rows EMIT IMMEDIATELY (stamped
    with their (sub)transaction's xid, no commit timestamp yet) and
    Commit / Stream Commit emit one marker row per released xid; a
    downstream join on xid stamps the commit timestamp + final txid
    and drops uncommitted/aborted rows (``stamp_commits``).

    This is the Spark answer to the reference's 64 MB transaction
    spill (``transaction_manager.rs:638-706``): the reference bounds
    consumer memory by spilling open transactions to disk segments; a
    distributed engine bounds it by NOT holding the transaction at all
    — rows flow through Arrow batches, and the commit join (tiny
    build side: one row per transaction) restores exactly the same
    release semantics, including Stream Abort discarding (an aborted
    xid simply never gets a marker, so the inner join drops its rows).
    Memory per task is O(relations + open transaction COUNT), not
    O(buffered rows) — scenario 5's 3M-row single transaction flows
    through without residence.
    """

    #: marker op for commit rows (never collides with c/u/d/t).
    COMMIT_OP = "_c"

    def __init__(
        self,
        protocol_version: int = 1,
        segment_id: int = 0,
        toast_merge: bool = False,
    ):
        super().__init__(protocol_version, toast_merge=toast_merge)
        self._pending: list[dict] = []
        self._open_rows: dict[int, int] = {}  # xid -> rows emitted
        # xids are NOT unique join keys: PostgreSQL reuses them after
        # wraparound and synthetic streams reuse them freely, so a
        # batch can hold many transaction INSTANCES of one xid. Each
        # instance keys the commit join by "<segment>:<seq of its
        # first buffered row>" — derived purely from STREAM CONTENT,
        # so it is identical on every re-evaluation of the decode
        # lineage (a partition-counter scheme is NOT: Spark may plan
        # the two join branches with different partitioning and the
        # sides would disagree).
        self._segment_id = segment_id
        self._instances: dict[int, str] = {}
        self._cur_seq = 0

    def _instance(self, xid: int) -> str:
        inst = self._instances.get(xid)
        if inst is None:
            inst = f"{self._segment_id}:{self._cur_seq}"
            self._instances[xid] = inst
        return inst

    def _buffer(self, xid: int | None, row: dict) -> None:
        key = xid if xid is not None else self.current_xid
        if key is None:
            raise ValueError("data message outside any transaction")
        if xid is not None and self.in_stream is not None:
            kids = self.stream_children.setdefault(self.in_stream, [])
            if xid not in kids:
                kids.append(xid)
        self.tx.setdefault(key, [])  # membership only — rows not held
        self._open_rows[key] = self._open_rows.get(key, 0) + 1
        row["txid"] = key
        row["tx_instance"] = self._instance(key)
        row["commit_xid"] = None
        self._pending.append(row)

    def _release(
        self, xid: int | None, ts_us: int, txid: int | None = None
    ) -> list[dict]:
        if xid is None:
            raise ValueError("Commit without Begin")
        self.tx.pop(xid, None)
        self._open_rows.pop(xid, None)
        if xid == self.current_xid:
            self.current_xid = None
        # pop: the instance closes with the commit; a reused xid later
        # in the stream starts a fresh instance
        inst = self._instances.pop(xid, None)
        if inst is None:  # commit for an empty/unknown tx — join no-op
            inst = f"{self._segment_id}:{self._cur_seq}:c{xid}"
        return [{
            "op": self.COMMIT_OP,
            "schema": "",
            "table": "",
            "txid": txid if txid is not None else xid,  # final txid
            "lsn": 0,
            # the marker carries the commit timestamp as the SAME naive
            # datetime the buffering decoder stamps (PG_EPOCH + µs), so
            # both decode paths interpret it identically under ANY
            # session timezone — unix-µs arithmetic here would rebase
            # the chunked path to UTC while the batch path follows the
            # session zone
            "commit_ts": PG_EPOCH + datetime.timedelta(microseconds=ts_us),
            "before": None,
            "after": None,
            "key_columns": None,
            "replica_identity": None,
            "tx_instance": inst,
            "commit_xid": xid,
        }]

    def feed(self, frame: bytes, wal_lsn: int, seq: int = 0) -> list[dict]:
        self._cur_seq = seq
        if frame[0:1] == b"A":
            # an aborted instance's mapping must die with it: a later
            # transaction reusing the xid gets a FRESH instance, so the
            # aborted rows can never join its commit marker
            xid, subxid = struct.unpack_from(">II", frame, 1)
            if subxid == xid:
                for kid in self.stream_children.get(xid, []):
                    self._instances.pop(kid, None)
                    self._open_rows.pop(kid, None)
                self._instances.pop(xid, None)
                self._open_rows.pop(xid, None)
            else:
                self._instances.pop(subxid, None)
                self._open_rows.pop(subxid, None)
        elif frame[0:1] == b"r":
            # Rollback Prepared: same instance-death rule — the rolled
            # back rows (already emitted) must never join a marker
            (xid,) = struct.unpack_from(">I", frame, 34)
            for kid in self.stream_children.get(xid, []):
                self._instances.pop(kid, None)
                self._open_rows.pop(kid, None)
            self._instances.pop(xid, None)
            self._open_rows.pop(xid, None)
        markers = super().feed(frame, wal_lsn)
        out = self._pending
        self._pending = []
        out.extend(markers)
        return out

    def open_xids(self) -> list[int]:
        """Transactions left open at stream end — emitted rows without
        a Commit (their rows would silently vanish in the commit join),
        prepared-but-unresolved transactions, plus an un-committed
        current transaction, mirroring the batch decoder's truncation
        check."""
        xids = {x for x in self.tx if self._open_rows.get(x, 0) > 0}
        xids.update(self.prepared)
        if self.current_xid is not None:
            xids.add(self.current_xid)
        return sorted(xids)


#: Intermediate schema of the constant-memory decode: the change-event
#: envelope (commit_ts nullable — data rows carry it only after the
#: commit join) plus the commit-marker columns.
CHUNKED_DECODE_SCHEMA = StructType(
    [
        StructField("commit_ts", TimestampType(), True)
        if f.name == "commit_ts" else f
        for f in CHANGE_EVENT_SCHEMA.fields
    ]
    + [
        StructField("tx_instance", StringType(), False),
        StructField("commit_xid", LongType(), True),
    ]
)


def decode_wal_frames_raw(
    frames: DataFrame,
    protocol_version: int = 1,
    chunk_rows: int = 65_536,
    toast_merge: bool = False,
) -> DataFrame:
    """Constant-memory wire decode: ``(segment_id, seq, wal_lsn,
    frame)`` → interleaved data rows + commit markers
    (``CHUNKED_DECODE_SCHEMA``), via ``mapInPandas`` over
    segment-contiguous sorted partitions — the whole segment is NEVER
    materialized (Arrow streams bounded batches in, bounded chunks
    out), unlike ``decode_wal_segments`` whose ``applyInPandas`` group
    holds the full segment and whose decoder holds the largest open
    transaction. Compose with ``stamp_commits`` for the canonical
    envelope. Callers that consume the result more than once should
    persist it (see ``streaming.pipeline.start_pgoutput_apply``)."""
    import pandas as pd

    cols = [f.name for f in CHUNKED_DECODE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec: StreamingPgOutputDecoder | None = None
        current_seg = None
        out: list[dict] = []

        for pdf in batches:
            for seg, seq, lsn, frame in zip(
                pdf["segment_id"], pdf["seq"], pdf["wal_lsn"], pdf["frame"]
            ):
                if seg != current_seg:
                    if dec is not None:
                        dec.check_closed(current_seg)
                    dec = StreamingPgOutputDecoder(
                        protocol_version, segment_id=int(seg),
                        toast_merge=toast_merge,
                    )
                    current_seg = seg
                out.extend(dec.feed(bytes(frame), int(lsn), int(seq)))
                if len(out) >= chunk_rows:
                    yield pd.DataFrame(out, columns=cols)
                    out = []
        if dec is not None:
            dec.check_closed(current_seg)
        if out:
            yield pd.DataFrame(out, columns=cols)

    return (
        frames.repartition("segment_id")
        .sortWithinPartitions("segment_id", "seq")
        .mapInPandas(run, CHUNKED_DECODE_SCHEMA)
    )


def stamp_commits(raw: DataFrame, broadcast_commits: bool = True) -> DataFrame:
    """Resolve the constant-memory decode to the canonical envelope:
    inner-join data rows to their transaction's commit marker (drops
    uncommitted/aborted), stamp the commit timestamp and the FINAL
    txid (streamed subtransactions commit under their toplevel). The
    build side is one row per committed transaction — broadcast by
    default; pass ``broadcast_commits=False`` for pathological
    many-tiny-transaction batches where even that exceeds the driver
    budget (AQE then plans the join from stats).

    ``raw`` is consumed twice (markers + data): persist it first when
    the lineage is expensive."""
    from pyspark.sql import functions as F

    marker = StreamingPgOutputDecoder.COMMIT_OP
    commits = raw.filter(F.col("op") == marker).select(
        F.col("tx_instance").alias("__inst"),
        F.col("txid").alias("__final_txid"),
        F.col("commit_ts").alias("__cts"),
    )
    if broadcast_commits:
        commits = F.broadcast(commits)
    data = raw.filter(F.col("op") != marker)
    return data.join(
        commits, data["tx_instance"] == commits["__inst"], "inner"
    ).select(
        "op", "schema", "table",
        F.col("__final_txid").alias("txid"),
        "lsn",
        F.col("__cts").alias("commit_ts"),
        "before", "after", "key_columns", "replica_identity",
    )


def decode_wal_segments(
    frames: DataFrame, protocol_version: int = 1, toast_merge: bool = False
) -> DataFrame:
    """(segment_id, seq, wal_lsn, frame) rows → canonical change
    events: each segment decodes independently (one ``applyInPandas``
    group, frames in ``seq`` order), committed transactions emit with
    their commit timestamp, aborted streamed transactions emit
    nothing. Downstream appliers give global order via max-LSN — the
    segment is only a decode-parallelism unit, exactly like a WAL
    file."""
    import pandas as pd

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        dec = PgOutputDecoder(protocol_version, toast_merge=toast_merge)
        out: list[dict] = []
        seg = pdf["segment_id"].iloc[0] if len(pdf) else "?"
        for frame, lsn in zip(pdf["frame"], pdf["wal_lsn"]):
            out.extend(dec.feed(bytes(frame), int(lsn)))
        dec.check_closed(seg)
        return pd.DataFrame(
            out,
            columns=[f.name for f in CHANGE_EVENT_SCHEMA.fields],
        )

    return frames.groupBy("segment_id").applyInPandas(
        decode, CHANGE_EVENT_SCHEMA
    )


# ---------------------------------------------------------------------------
# outer replication framing (COPY-data envelopes + standby feedback)
# ---------------------------------------------------------------------------
#
# On a live connection, pgoutput messages never arrive bare: the server
# wraps each in an XLogData ('w') COPY-data envelope and interleaves
# Primary Keepalive ('k') messages; the client answers with Standby
# Status Update ('r') frames whose LSNs advance the slot (protocol
# §55.4, "Streaming Replication Protocol"). The reference consumes
# these through its client loop (``producer.rs:129-132`` dispatches
# w/k, ``client.rs:222-237`` computes the feedback LSN as
# last-received + 1); here the same layer is a thin codec over the
# frame stream so the ingest path models the whole conversation.


def encode_xlog_data(
    wal_start: int, wal_end: int, send_ts: datetime.datetime, payload: bytes
) -> bytes:
    """XLogData ('w'): the COPY-data envelope carrying one pgoutput
    message at WAL position ``wal_start``."""
    return b"w" + struct.pack(
        ">QQq", wal_start, wal_end, ts_to_pg_us(send_ts)
    ) + payload


def encode_keepalive(
    wal_end: int, send_ts: datetime.datetime, reply_requested: bool = False
) -> bytes:
    """Primary Keepalive ('k'): server heartbeat; ``reply_requested``
    demands an immediate standby status update (the server's liveness
    probe before it drops the connection)."""
    return b"k" + struct.pack(
        ">Qq?", wal_end, ts_to_pg_us(send_ts), reply_requested
    )


def encode_standby_status(
    written_lsn: int,
    flushed_lsn: int,
    applied_lsn: int,
    send_ts: datetime.datetime,
    reply_requested: bool = False,
) -> bytes:
    """Standby Status Update ('r'): the client's feedback frame. The
    server retains WAL from min(flushed, applied); reporting an LSN
    releases everything below it — the exactly-once contract says ACK
    only what the destination has durably applied."""
    return b"r" + struct.pack(
        ">QQQq?", written_lsn, flushed_lsn, applied_lsn,
        ts_to_pg_us(send_ts), reply_requested,
    )


def feedback_lsn(applied_lsn: int) -> int:
    """LSN to report in standby status: one past the last applied
    byte position (PostgreSQL LSN reporting convention; reference
    ``client.rs:222-237`` sends last-received + 1)."""
    return applied_lsn + 1


def decode_replication_message(buf: bytes) -> dict:
    """Parse one outer replication message ('w' XLogData / 'k'
    keepalive). Returns a dict with ``kind`` ('xlog' | 'keepalive'),
    positions, send timestamp (PG-epoch µs) and, for XLogData, the
    inner pgoutput ``payload``."""
    t = buf[0:1]
    if t == b"w":
        wal_start, wal_end, ts_us = struct.unpack_from(">QQq", buf, 1)
        return {
            "kind": "xlog",
            "wal_start": wal_start,
            "wal_end": wal_end,
            "send_ts_us": ts_us,
            "payload": bytes(buf[25:]),
        }
    if t == b"k":
        wal_end, ts_us, reply = struct.unpack_from(">Qq?", buf, 1)
        return {
            "kind": "keepalive",
            "wal_end": wal_end,
            "send_ts_us": ts_us,
            "reply_requested": bool(reply),
        }
    raise ValueError(f"unknown replication message type {t!r}")


def decode_standby_status(buf: bytes) -> dict:
    """Parse a Standby Status Update ('r') — the test harness's way to
    assert what a client ACKed."""
    if buf[0:1] != b"r":
        raise ValueError(f"not a standby status frame: {buf[0:1]!r}")
    written, flushed, applied, ts_us, reply = struct.unpack_from(
        ">QQQq?", buf, 1
    )
    return {
        "written_lsn": written,
        "flushed_lsn": flushed,
        "applied_lsn": applied,
        "send_ts_us": ts_us,
        "reply_requested": bool(reply),
    }


#: Envelope-frame table schema: outer replication messages as they
#: arrive on the socket, sharded into segments like the bare frames.
XLOG_ENVELOPE_SCHEMA = "segment_id long, seq long, envelope binary"


def unwrap_xlog_frames(envelopes: DataFrame) -> DataFrame:
    """(segment_id, seq, envelope) outer replication messages →
    WAL_FRAME_SCHEMA bare pgoutput frames: XLogData unwraps to its
    payload at its wal_start position; keepalives carry no WAL and are
    dropped (a live client answers them with standby status — see
    ``encode_standby_status`` — which is connection I/O, not data
    flow); unknown envelope types fail loudly. Arrow-batched
    ``mapInPandas``, no shuffle."""
    import pandas as pd

    def unwrap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            seg_out, seq_out, lsn_out, frames = [], [], [], []
            for seg, seq, env in zip(
                pdf["segment_id"], pdf["seq"], pdf["envelope"]
            ):
                msg = decode_replication_message(bytes(env))
                if msg["kind"] == "keepalive":
                    continue
                seg_out.append(int(seg))
                seq_out.append(int(seq))
                lsn_out.append(msg["wal_start"])
                frames.append(msg["payload"])
            yield pd.DataFrame(
                {
                    "segment_id": seg_out,
                    "seq": seq_out,
                    "wal_lsn": lsn_out,
                    "frame": frames,
                }
            )

    return envelopes.mapInPandas(unwrap, WAL_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# synthetic WAL frame stream (wire-exact, from the event synthesis)
# ---------------------------------------------------------------------------

#: Frame-table schema shared by the generator and decode tests.
WAL_FRAME_SCHEMA = "segment_id long, seq long, wal_lsn long, frame binary"

_CUSTOMER_REL_ID = 1


def _customer_text_maps(spark, sf_dir: str, extra: dict[str, float]):
    """Shared scaffold of the customer wire synths: ``(cols, base)``
    where ``base`` carries ``k`` (custkey), ``m_ins`` (every column
    rendered to text via the SAME Spark cast the event synthesis
    uses), and one additional map per ``extra`` entry with
    ``c_acctbal`` shifted by that delta."""
    from pyspark.sql import functions as F

    from pg2any_spark.sources.fixtures import load_table

    cust = load_table(spark, "customer", sf_dir)
    cols = cust.columns
    text = lambda c: F.col(c).cast("string")  # noqa: E731
    mk_map = lambda acct: F.map_from_arrays(  # noqa: E731
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[acct.cast("string") if c == "c_acctbal" else text(c)
                  for c in cols]),
    )
    sel = [
        F.col("c_custkey").alias("k"),
        mk_map(F.col("c_acctbal")).alias("m_ins"),
    ]
    for name, delta in extra.items():
        sel.append(mk_map(F.col("c_acctbal") + delta).alias(name))
    return cols, cust.select(*sel)


def _customer_rel_frames(spark, cols, n_segments: int) -> DataFrame:
    """One customer Relation frame per segment (segments are
    self-contained: each re-sends Relation before first use)."""
    from pyspark.sql import Row

    rel = encode_relation(
        _CUSTOMER_REL_ID, "public", "customer",
        [(COL_KEY_FLAG if c == "c_custkey" else 0, c, 25, -1) for c in cols],
        "default",
    )
    from pg2any_spark.functions.localtable import literal_table

    return literal_table(
        spark,
        [Row(segment_id=s, seq=0, wal_lsn=0, frame=bytearray(rel))
         for s in range(n_segments)],
        WAL_FRAME_SCHEMA,
    )


def synth_customer_wal_frames(
    spark, sf_dir: str, n_segments: int = 8
) -> DataFrame:
    """Wire-exact pgoutput frame stream for the customer CDC scenario
    (insert-all → update %3 → delete %7, the ``cdc_apply_customer``
    shape): every change event becomes a Begin / data / Commit frame
    triple at its WAL position, sharded into ``n_segments``
    self-contained segments (each opens with a Relation frame, as a
    real server re-sends after reconnect). Text values come from the
    SAME Spark cast-to-string rendering the event synthesis uses, so
    decode→apply is byte-faithful to the non-wire path. Encoding is
    Arrow-batched ``mapInPandas``; only the ``n_segments`` Relation
    frames are driver-built."""
    import pandas as pd
    from pyspark.sql import Row

    from pg2any_spark.sources.cdc_gen import synth_customer_events
    from pg2any_spark.sources.fixtures import load_table

    cols = load_table(spark, "customer", sf_dir).columns
    key = "c_custkey"
    events = synth_customer_events(spark, sf_dir)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            seg, seq, lsn_out, frames = [], [], [], []

            def emit(s, q, l, fr):
                seg.append(s)
                seq.append(q)
                lsn_out.append(l)
                frames.append(fr)

            for r in pdf.itertuples(index=False):
                lsn = int(r.lsn)
                xid = int(r.txid)
                ts = r.commit_ts.to_pydatetime()
                s = lsn % n_segments
                # seq must give every event's Begin/data/Commit a
                # contiguous, collision-free slot even when two
                # DIFFERENT keys' events share an LSN (the synthesis
                # LSN spaces insert=k / update=k+10M / delete=k+20M
                # collide once keys exceed 10M — e.g. the key-shifted
                # 10x fixture, where seq = lsn*4 interleaved two
                # transactions' frames into "Commit without Begin").
                # Ranking by op at equal LSN keeps the order total and
                # deterministic; same-LSN events always land in the
                # same segment (s = lsn % n_segments), so the
                # within-segment seq sort is the only order that
                # matters.
                rank = {"c": 0, "u": 1, "d": 2}[r.op]
                base_seq = lsn * 16 + rank * 4
                emit(s, base_seq + 1, lsn, encode_begin(lsn, ts, xid))
                if r.op == "c":
                    data = encode_insert(
                        _CUSTOMER_REL_ID, [r.after.get(c) for c in cols]
                    )
                elif r.op == "u":
                    old = [
                        r.before.get(c) if c == key else None for c in cols
                    ]
                    data = encode_update(
                        _CUSTOMER_REL_ID,
                        [r.after.get(c) for c in cols],
                        old_values=old,
                        old_kind="K",
                    )
                else:  # delete
                    old = [
                        r.before.get(c) if c == key else None for c in cols
                    ]
                    data = encode_delete(_CUSTOMER_REL_ID, old, old_kind="K")
                emit(s, base_seq + 2, lsn, data)
                emit(s, base_seq + 3, lsn, encode_commit(lsn, lsn, ts))
            yield pd.DataFrame(
                {
                    "segment_id": seg,
                    "seq": seq,
                    "wal_lsn": lsn_out,
                    "frame": frames,
                }
            )

    data_frames = events.mapInPandas(gen, WAL_FRAME_SCHEMA)
    return _customer_rel_frames(spark, cols, n_segments).unionByName(
        data_frames
    )


def synth_customer_toast_wal_frames(
    spark, sf_dir: str, n_segments: int = 8
) -> DataFrame:
    """Wire-exact pgoutput frame stream exercising unchanged-TOAST
    ('u') tuple columns: insert every customer, then for custkey%3==0
    TWO successive updates — the first explicitly rewrites
    ``c_mktsegment`` to ``TOASTED-<k>`` (a changed TOASTed value is
    re-sent), the second bumps ``c_acctbal`` by 1000 while sending
    ``c_mktsegment`` as kind 'u' (unchanged, value withheld — what any
    real table with a large TOASTed column and default replica
    identity emits on every unrelated UPDATE) — then delete
    custkey%7==0. Correct merge-with-stored-row apply must keep
    ``TOASTED-<k>``: a NULL-overwrite bug or a stale-base resolution
    both show up in the final state. Mirrors the reference's UPDATE
    SET rendering only the columns it has (``sql_renderer.rs:205-234``).

    Final-state oracle::

        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_custkey % 3 = 0
                    THEN 'TOASTED-' || CAST(c_custkey AS VARCHAR)
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 7 <> 0
    """
    import pandas as pd

    cols, base = _customer_text_maps(spark, sf_dir, {"m_upd": 1000.0})
    key = "c_custkey"
    ts = datetime.datetime(2026, 1, 1)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []

            def tx(k, lsn, data_frame):
                seg = int(k) % n_segments
                rows.append((seg, lsn * 4 + 1, lsn, encode_begin(lsn, ts, lsn)))
                rows.append((seg, lsn * 4 + 2, lsn, data_frame))
                rows.append((seg, lsn * 4 + 3, lsn, encode_commit(lsn, lsn, ts)))

            for r in pdf.itertuples(index=False):
                k = int(r.k)
                ins = [r.m_ins.get(c) for c in cols]
                old = [r.m_ins.get(c) if c == key else None for c in cols]
                tx(k, k * 10, encode_insert(_CUSTOMER_REL_ID, ins))
                if k % 3 == 0:
                    u1 = [
                        f"TOASTED-{k}" if c == "c_mktsegment"
                        else r.m_ins.get(c)
                        for c in cols
                    ]
                    tx(k, k * 10 + 1, encode_update(
                        _CUSTOMER_REL_ID, u1, old_values=old, old_kind="K"))
                    u2 = [
                        UNCHANGED_TOAST if c == "c_mktsegment"
                        else r.m_upd.get(c) if c == "c_acctbal"
                        else r.m_ins.get(c)
                        for c in cols
                    ]
                    tx(k, k * 10 + 2, encode_update(
                        _CUSTOMER_REL_ID, u2, old_values=old, old_kind="K"))
                if k % 7 == 0:
                    tx(k, k * 10 + 3,
                       encode_delete(_CUSTOMER_REL_ID, old, old_kind="K"))
            yield pd.DataFrame(
                rows, columns=["segment_id", "seq", "wal_lsn", "frame"]
            )

    data_frames = base.mapInPandas(gen, WAL_FRAME_SCHEMA)
    return _customer_rel_frames(spark, cols, n_segments).unionByName(
        data_frames
    )


def synth_customer_schema_evo_wal_frames(
    spark, sf_dir: str, n_segments: int = 8
) -> DataFrame:
    """Wire-exact pgoutput stream exercising MID-STREAM SCHEMA
    EVOLUTION: the publisher's table gains a column (``ALTER TABLE
    customer ADD COLUMN c_tier text``) while replication is live.
    PostgreSQL signals this by re-sending the Relation message with
    the new column list before the next DML on the relation (protocol
    §55.5: a Relation message is sent "before the first DML after a
    schema change"); the reference inherits the updated column set the
    same way, through its replication crate's relation cache.

    Phases (``seq`` orders decode inside each segment; apply order is
    by ``lsn``):

    1. old 5-column schema — insert every customer, delete %7==0;
    2. Relation re-sent with 6 columns (one frame per segment — each
       segment is an independent decode unit, like a reconnect);
    3. new schema — for %3==0 an UPDATE carrying all six columns:
       ``c_acctbal + 1000`` and ``c_tier = 'TIER-<k%5>'``.

    Rows decoded under the old schema simply lack ``c_tier`` in their
    images; ``typed_from_map`` projects the missing key to NULL, so
    the destination backfills NULL exactly like ``ALTER TABLE ADD
    COLUMN`` does. A decoder that pins the first Relation it saw (or
    conflates the re-send with corruption) mis-zips the 6-value
    tuples and corrupts every post-change row.

    Final-state oracle::

        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment,
               CASE WHEN c_custkey % 3 = 0
                    THEN 'TIER-' || CAST(c_custkey % 5 AS VARCHAR)
               END AS c_tier
        FROM customer WHERE c_custkey % 7 <> 0
    """
    import pandas as pd
    from pyspark.sql import Row

    cols, base = _customer_text_maps(spark, sf_dir, {"m_upd": 1000.0})
    cols2 = [*cols, "c_tier"]
    key = "c_custkey"
    ts = datetime.datetime(2026, 1, 1)
    # Relation-v2 frames sit above every phase-1 seq at any SF; phase-2
    # data frames sit above the re-send.
    REL2_SEQ = 10**15

    rel2 = encode_relation(
        _CUSTOMER_REL_ID, "public", "customer",
        [(COL_KEY_FLAG if c == key else 0, c, 25, -1) for c in cols2],
        "default",
    )
    from pg2any_spark.functions.localtable import literal_table

    rel2_frames = literal_table(
        spark,
        [Row(segment_id=s, seq=REL2_SEQ, wal_lsn=0, frame=bytearray(rel2))
         for s in range(n_segments)],
        WAL_FRAME_SCHEMA,
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []

            def tx(k, seq_base, lsn, data_frame):
                seg = int(k) % n_segments
                rows.append((seg, seq_base + 1, lsn, encode_begin(lsn, ts, lsn)))
                rows.append((seg, seq_base + 2, lsn, data_frame))
                rows.append((seg, seq_base + 3, lsn, encode_commit(lsn, lsn, ts)))

            for r in pdf.itertuples(index=False):
                k = int(r.k)
                ins = [r.m_ins.get(c) for c in cols]
                old = [r.m_ins.get(c) if c == key else None for c in cols]
                # phase 1: old schema
                tx(k, k * 10, k * 10, encode_insert(_CUSTOMER_REL_ID, ins))
                if k % 7 == 0:
                    # delete outranks the phase-2 update by LSN, so
                    # %21 keys stay deleted
                    tx(k, k * 10 + 6, k * 10 + 3,
                       encode_delete(_CUSTOMER_REL_ID, old, old_kind="K"))
                # phase 3: new 6-column schema
                if k % 3 == 0:
                    u = [
                        r.m_upd.get(c) if c == "c_acctbal"
                        else r.m_ins.get(c)
                        for c in cols
                    ] + [f"TIER-{k % 5}"]
                    old2 = [r.m_ins.get(c) if c == key else None
                            for c in cols2]
                    tx(k, REL2_SEQ + k * 10, k * 10 + 1, encode_update(
                        _CUSTOMER_REL_ID, u, old_values=old2, old_kind="K"))
            yield pd.DataFrame(
                rows, columns=["segment_id", "seq", "wal_lsn", "frame"]
            )

    data_frames = base.mapInPandas(gen, WAL_FRAME_SCHEMA)
    return (
        _customer_rel_frames(spark, cols, n_segments)
        .unionByName(rel2_frames)
        .unionByName(data_frames)
    )


def synth_streaming_tx_wal_frames(
    spark, sf_dir: str, n_segments: int = 4
) -> DataFrame:
    """Protocol-v2 wire stream with INTERLEAVED streamed transactions
    (the ``cdc_apply_streaming_tx`` scenario, on the wire): per
    segment — tx 100 streams its first insert chunk (odd custkeys),
    tx 200 streams a blanket +9999 update of even keys, tx 100 streams
    its second chunk (even keys), tx 200 ABORTS (must leave no trace),
    tx 300 streams +500 updates of custkey%10==0, then 100 and 300
    Stream-Commit. Sequence-number blocks order the chunks inside each
    segment; update WAL positions sit above insert positions so the
    max-LSN apply needs no extra ordering column."""
    import pandas as pd
    from pyspark.sql import Row, functions as F

    from pg2any_spark.sources.fixtures import load_table

    cust = load_table(spark, "customer", sf_dir)
    cols = cust.columns
    key = "c_custkey"
    text = lambda c: F.col(c).cast("string")  # noqa: E731
    mk_map = lambda acct: F.map_from_arrays(  # noqa: E731
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[acct.cast("string") if c == "c_acctbal" else text(c)
                  for c in cols]),
    )
    base = cust.select(
        F.col(key).alias("k"),
        mk_map(F.col("c_acctbal")).alias("m_ins"),
        mk_map(F.col("c_acctbal") + 9999.0).alias("m_abort"),
        mk_map(F.col("c_acctbal") + 500.0).alias("m_commit"),
    )
    ts = datetime.datetime(2026, 1, 1)
    B = 1_000_000_000
    UPDATE_BASE = 10_000_000

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []

            def emit(k, seq, lsn, frame):
                rows.append((int(k) % n_segments, seq, lsn, frame))

            for r in pdf.itertuples(index=False):
                k = int(r.k)
                ins = [r.m_ins.get(c) for c in cols]
                old = [r.m_ins.get(c) if c == key else None for c in cols]
                # data seq = block + k + 1: strictly after the block's
                # Stream Start (at block+0) even for custkey 0
                chunk = 1 * B if k % 2 == 1 else 3 * B
                emit(k, chunk + k + 1, k,
                     encode_insert(_CUSTOMER_REL_ID, ins, stream_xid=100))
                if k % 2 == 0:
                    emit(k, 2 * B + k + 1, k + UPDATE_BASE,
                         encode_update(
                             _CUSTOMER_REL_ID,
                             [r.m_abort.get(c) for c in cols],
                             old_values=old, old_kind="K", stream_xid=200,
                         ))
                if k % 10 == 0:
                    emit(k, 5 * B + k + 1, k + UPDATE_BASE,
                         encode_update(
                             _CUSTOMER_REL_ID,
                             [r.m_commit.get(c) for c in cols],
                             old_values=old, old_kind="K", stream_xid=300,
                         ))
            yield pd.DataFrame(
                rows, columns=["segment_id", "seq", "wal_lsn", "frame"]
            )

    data = base.mapInPandas(gen, WAL_FRAME_SCHEMA)
    rel = encode_relation(
        _CUSTOMER_REL_ID, "public", "customer",
        [(COL_KEY_FLAG if c == key else 0, c, 25, -1) for c in cols],
        "default",
    )
    marks = []
    for s in range(n_segments):

        def m(seq, frame, lsn=0):
            marks.append(
                Row(segment_id=s, seq=seq, wal_lsn=lsn, frame=bytearray(frame))
            )

        m(0, rel)
        m(1 * B, encode_stream_start(100, True))
        m(1 * B + 900_000_000, encode_stream_stop())
        m(2 * B, encode_stream_start(200, True))
        m(2 * B + 900_000_000, encode_stream_stop())
        m(3 * B, encode_stream_start(100, False))
        m(3 * B + 900_000_000, encode_stream_stop())
        m(4 * B, encode_stream_abort(200, 200))
        m(5 * B, encode_stream_start(300, True))
        m(5 * B + 900_000_000, encode_stream_stop())
        m(6 * B, encode_stream_commit(100, 50_000_000, 50_000_000, ts))
        m(7 * B, encode_stream_commit(300, 60_000_000, 60_000_000, ts))
    from pg2any_spark.functions.localtable import literal_table

    mark_df = literal_table(spark, marks, WAL_FRAME_SCHEMA)
    return mark_df.unionByName(data)


def synth_customer_two_phase_wal_frames(
    spark, sf_dir: str, n_segments: int = 8
) -> DataFrame:
    """Wire-exact TWO-PHASE pgoutput stream (publication option
    ``two_phase``; reference knob ``config.rs:41``): every change
    arrives as a PREPARED transaction — Begin Prepare / data / Prepare
    — resolved in-segment by Commit Prepared or Rollback Prepared.
    Per customer: a prepared-and-committed INSERT; for custkey%3==0 a
    prepared-and-committed UPDATE (``c_mktsegment`` →
    ``PREPARED-<k>``); for custkey%5==0 a prepared UPDATE bumping
    ``c_acctbal`` by 999999 that is ROLLED BACK (must leave zero
    trace — an apply that releases at Prepare instead of Commit
    Prepared corrupts every fifth balance); for custkey%7==0 a
    prepared-and-committed DELETE.

    Final-state oracle::

        SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               CASE WHEN c_custkey % 3 = 0
                    THEN 'PREPARED-' || CAST(c_custkey AS VARCHAR)
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 7 <> 0
    """
    import pandas as pd

    cols, base = _customer_text_maps(spark, sf_dir, {"m_bad": 999999.0})
    key = "c_custkey"
    ts = datetime.datetime(2026, 1, 1)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []

            def tx(k, lsn, data_frame, commit=True):
                seg = int(k) % n_segments
                gid = f"gid-{lsn}"
                rows.append((seg, lsn * 8 + 1, lsn,
                             encode_begin_prepare(lsn, lsn, ts, lsn, gid)))
                rows.append((seg, lsn * 8 + 2, lsn, data_frame))
                rows.append((seg, lsn * 8 + 3, lsn,
                             encode_prepare(lsn, lsn, ts, lsn, gid)))
                if commit:
                    rows.append((seg, lsn * 8 + 4, lsn,
                                 encode_commit_prepared(lsn, lsn, ts, lsn, gid)))
                else:
                    rows.append((seg, lsn * 8 + 4, lsn,
                                 encode_rollback_prepared(
                                     lsn, lsn, ts, ts, lsn, gid)))

            for r in pdf.itertuples(index=False):
                k = int(r.k)
                ins = [r.m_ins.get(c) for c in cols]
                old = [r.m_ins.get(c) if c == key else None for c in cols]
                tx(k, k * 10, encode_insert(_CUSTOMER_REL_ID, ins))
                if k % 3 == 0:
                    u1 = [
                        f"PREPARED-{k}" if c == "c_mktsegment"
                        else r.m_ins.get(c)
                        for c in cols
                    ]
                    tx(k, k * 10 + 1, encode_update(
                        _CUSTOMER_REL_ID, u1, old_values=old, old_kind="K"))
                if k % 5 == 0:
                    bad = [
                        r.m_bad.get(c) if c == "c_acctbal"
                        else f"PREPARED-{k}" if c == "c_mktsegment" and k % 3 == 0
                        else r.m_ins.get(c)
                        for c in cols
                    ]
                    tx(k, k * 10 + 2, encode_update(
                        _CUSTOMER_REL_ID, bad, old_values=old, old_kind="K"),
                        commit=False)
                if k % 7 == 0:
                    tx(k, k * 10 + 3,
                       encode_delete(_CUSTOMER_REL_ID, old, old_kind="K"))
            yield pd.DataFrame(
                rows, columns=["segment_id", "seq", "wal_lsn", "frame"]
            )

    data_frames = base.mapInPandas(gen, WAL_FRAME_SCHEMA)
    return _customer_rel_frames(spark, cols, n_segments).unionByName(
        data_frames
    )
