"""Ordered CDC apply: change-event stream → destination table state.

This is the Spark-native equivalent of the reference's entire consumer
path (reference ``consumer.rs:42-101`` LSN-ordered heap +
``transaction_manager.rs:1586-1604`` LSN dedup + the per-destination
DML apply). Semantics reproduced:

- **Total LSN order** (reference O1): the reference applies
  transactions strictly in commit-LSN order with a single consumer.
  Correctness only requires order *per key* — two events on different
  rows commute — so we reduce each key to its max-LSN event with
  ``max_by``. ``max_by`` is an *aggregate*, not a window: Spark plans
  it with a map-side partial aggregation before the shuffle, so the
  shuffle carries one row per (already-seen) key per input partition,
  not one row per event. At 100 TB that is the difference between
  shuffling the event stream and shuffling ~|keys|.
- **Replica identity** (reference ``sql_renderer.rs:331-375``):
  default/index → match on key columns; full → the before-image still
  contains the keys, so key matching is unchanged (NULL keys use
  null-safe equality); nothing → raise, as the reference errors.
- **TRUNCATE as a barrier** (reference ``sql_renderer.rs:300-320``):
  a truncate at LSN t discards the base table and every event with
  lsn < t; events after t rebuild the table.
- **Key-changing UPDATEs**: PostgreSQL emits the old key in ``before``
  and the new row in ``after``; the rendered SQL moves the row
  (``sql_renderer.rs:205-234``). We decompose such updates into a
  delete(old key) + insert(new row) pair at the same LSN (delete
  sequenced first), which preserves the reference's end state.
- **LSN dedup / exactly-once** (reference O2): re-delivered events
  have the same (lsn) and reduce to the same max-LSN winner —
  idempotent by construction. Cross-restart dedup comes from
  Structured Streaming checkpoint offsets (see streaming.pipeline).

Values arrive text-rendered (MAP<STRING,STRING>); ``typed_from_map``
casts them into the destination schema, applying PostgreSQL's text
conventions (boolean ``t``/``f``) the way each destination dialect does
(reference ``dialects/ansi.rs:41-73``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructType

from pg2any_spark.schemas import (
    IDENTITY_NOTHING,
    OP_DELETE,
    OP_TRUNCATE,
    UNCHANGED_TOAST,
)


class ReplicaIdentityError(ValueError):
    """Raised for REPLICA IDENTITY NOTHING updates/deletes, mirroring the
    reference's hard error (``sql_renderer.rs:370-374``)."""


def _cast_text(value: Column, dtype) -> Column:
    """Cast one text-rendered cell to its destination type."""
    if isinstance(dtype, BooleanType):
        # PG wire booleans are 't'/'f' (dialects rewrite to 1/0).
        return (
            F.when(value == "t", F.lit(True))
            .when(value == "f", F.lit(False))
            .otherwise(value.cast("boolean"))
        )
    if isinstance(dtype, BinaryType):
        # bytea rides the text envelope two ways: binary-mode 'b'
        # tuples arrive base64 (sources.pgoutput._to_map), TEXT-mode
        # tuples arrive in PG's hex text form '\x<hex>' (the wire
        # default). Decode each by its own marker — unbase64 on a hex
        # literal silently yields garbage bytes, violating the
        # module's fail-loud doctrine (destinations render back as hex
        # literals, functions.dialects.render_hex). A value that is
        # neither (e.g. a server running bytea_output='escape', whose
        # backslash-octal text would ALSO decode to garbage under
        # unbase64) errors loudly instead of corrupting silently.
        b64_shape = value.rlike("^[A-Za-z0-9+/]*={0,2}$") & (
            F.length(value) % 4 == 0
        )
        # the hex branch only accepts WELL-FORMED hex (even length,
        # hex digits only) — '\xZZ12' or odd-length '\xABC' would
        # otherwise unhex to NULL, silently nulling a corrupt value
        hex_shape = value.rlike("^\\\\x([0-9a-fA-F]{2})*$")
        return (
            F.when(value.isNull(), F.lit(None).cast("binary"))
            .when(
                hex_shape,
                F.unhex(F.substring(value, 3, 2147483647)),
            )
            .when(b64_shape, F.unbase64(value))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "bytea text is neither PG hex ('\\x…') nor "
                            "base64 — bytea_output='escape' is unsupported: "
                        ),
                        value,
                    )
                ).cast("binary")
            )
        )
    return value.cast(dtype)


def typed_from_map(map_col: str | Column, schema: StructType) -> list[Column]:
    """Project a MAP<STRING,STRING> row image into typed columns."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    return [_cast_text(m.getItem(f.name), f.dataType).alias(f.name) for f in schema.fields]


def _key_from_images(key: str, dtype) -> Column:
    """Key value of an event: new image wins (key-changing updates are
    pre-split, so after/before agree whenever both are present)."""
    return _cast_text(F.coalesce(F.col("after").getItem(key), F.col("before").getItem(key)), dtype)


def split_key_changing_updates(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Decompose UPDATEs whose key changed into delete+insert.

    The delete is sequenced immediately before the insert by doubling
    the LSN space (2*lsn for the delete, 2*lsn+1 for the insert) —
    order among distinct LSNs is preserved.
    """
    key_changed = F.col("op") == "u"
    has_before = F.col("before").isNotNull()
    changed = None
    for k in key_cols:
        old_k, new_k = F.col("before").getItem(k), F.col("after").getItem(k)
        c = has_before & old_k.isNotNull() & new_k.isNotNull() & (old_k != new_k)
        changed = c if changed is None else (changed | c)
    key_changed = key_changed & changed

    stable = events.filter(~key_changed).withColumn("lsn", F.col("lsn") * 2 + 1)
    movers = events.filter(key_changed)
    as_delete = movers.select(
        F.lit("d").alias("op"), "schema", "table", "txid",
        (F.col("lsn") * 2).alias("lsn"), "commit_ts",
        "before", F.lit(None).cast("map<string,string>").alias("after"),
        "key_columns", "replica_identity",
    )
    as_insert = movers.select(
        F.lit("c").alias("op"), "schema", "table", "txid",
        (F.col("lsn") * 2 + 1).alias("lsn"), "commit_ts",
        F.lit(None).cast("map<string,string>").alias("before"), "after",
        "key_columns", "replica_identity",
    )
    return stable.unionByName(as_delete).unionByName(as_insert)


def apply_changes(
    events: DataFrame,
    schema: StructType,
    key_cols: list[str],
    base: DataFrame | None = None,
    table: str | None = None,
    check_replica_identity: bool = False,
    split_key_updates: bool = False,
    order_cols: list[str] | None = None,
    scan_for_truncate: bool = True,
    toast_merge: bool = False,
) -> DataFrame:
    """Apply an ordered CDC event stream; return the final table state.

    Parameters
    ----------
    events: change events in CHANGE_EVENT_SCHEMA.
    schema: destination (typed) schema.
    key_cols: replica-identity key columns (MERGE ON columns).
    base: existing destination table state, if any.
    table: filter events to this table name first.
    check_replica_identity: raise on identity 'nothing' DML, like the
        reference. Costs one aggregation pass; off by default.
    split_key_updates: handle key-changing UPDATEs (costs one extra
        pass over the events; enable when the source can change keys).
    order_cols: replay-order columns, lexicographic. Default ["lsn"];
        a reassembled streaming-tx feed uses ["commit_lsn", "lsn"]
        (transactions in commit order, events in write order inside).
    scan_for_truncate: the truncate barrier needs one dedicated pass
        over the events (a scalar max). Against a file/Kafka source the
        op='t' filter pushes down and the pass is nearly free, but for
        a computed event stream it recomputes the whole lineage — pass
        False when the feed cannot contain TRUNCATE (most OLTP tables;
        the reference likewise treats truncate as a rare, per-dialect
        special case, ``sql_renderer.rs:300-320``).
    toast_merge: resolve ``UNCHANGED_TOAST`` sentinel cells (pgoutput
        tuple kind 'u': an UPDATE did not re-send an unchanged TOASTed
        column). Per key and per column, the effective value is the
        latest event that actually SET the column (a per-column
        ``max_by`` beside the winner — still one map-side-combinable
        aggregate, still one row per key on the shuffle), falling back
        to the replica's stored row when no event in the batch ever
        set it (one extra equi-join against ``base``, keyed like the
        untouched-rows anti-join). This is the reference's semantics —
        its UPDATE SET renders only the columns it has, leaving the
        rest stored (``sql_renderer.rs:205-234``). Off by default: the
        sentinel scan + wider aggregate are wasted work for REPLICA
        IDENTITY FULL publishers that never send 'u'.
    """
    order_cols = order_cols or ["lsn"]
    if table is not None:
        events = events.filter(F.col("table") == table)

    if check_replica_identity:
        bad = events.filter(
            (F.col("replica_identity") == IDENTITY_NOTHING)
            & F.col("op").isin("u", "d")
        ).head(1)
        if bad:
            raise ReplicaIdentityError(
                "UPDATE/DELETE with REPLICA IDENTITY NOTHING cannot be applied"
            )

    if split_key_updates:
        if toast_merge:
            # a key-changing UPDATE that also withholds an unchanged
            # TOAST column would need the OLD key's stored row to
            # resolve the sentinel, but the delete+insert decomposition
            # re-homes the row under the NEW key — the fallback join
            # would miss and NULL the column. Rare (key change + TOAST
            # withhold in one statement) and detectable: refuse loudly.
            sentinel_mover = events.filter(
                (F.col("op") == "u")
                & F.array_contains(
                    F.map_values(F.col("after")), UNCHANGED_TOAST
                )
                & F.col("before").isNotNull()
            )
            changed = None
            for k in key_cols:
                old_k = F.col("before").getItem(k)
                new_k = F.col("after").getItem(k)
                c = old_k.isNotNull() & new_k.isNotNull() & (old_k != new_k)
                changed = c if changed is None else (changed | c)
            if sentinel_mover.filter(changed).head(1):
                raise ValueError(
                    "key-changing UPDATE with an unchanged-TOAST "
                    "column cannot be applied: the stored value lives "
                    "under the old key; use REPLICA IDENTITY FULL on "
                    "the publisher for key-changing tables"
                )
        events = split_key_changing_updates(events, key_cols)

    # --- TRUNCATE barrier -------------------------------------------------
    # Scalar aggregate: one row to the driver regardless of scale.
    order_expr = F.struct(*order_cols)
    trunc_row = None
    if scan_for_truncate:
        trunc_row = events.filter(F.col("op") == OP_TRUNCATE).agg(
            F.max(order_expr).alias("m")
        ).collect()[0]["m"]
    dml = events.filter(F.col("op") != OP_TRUNCATE)
    if trunc_row is not None:
        barrier = F.struct(*[F.lit(trunc_row[c]).alias(c) for c in order_cols])
        dml = dml.filter(order_expr > barrier)
        base = None  # everything before the truncate is gone

    dtypes = {f.name: f.dataType for f in schema.fields}
    keyed = dml.select(
        *[_key_from_images(k, dtypes[k]).alias(f"__key_{k}") for k in key_cols],
        "op",
        *order_cols,
        "after",
    )

    # --- last-writer-wins per key (map-side combinable) -------------------
    order_struct = F.struct(*order_cols)
    win_agg = [F.max_by(F.struct("op", "after"), order_struct).alias("w")]
    if toast_merge:
        # one extra max_by per NON-KEY destination column: the latest
        # event that actually SET it (skipping 'u' sentinel cells;
        # deletes carry no after image so their ordering key is NULL
        # and max_by ignores them). Key columns resolve from the group
        # key itself — aggregating them again would just widen the
        # shuffle row. Still a single map-side-combinable aggregate.
        for f in schema.fields:
            if f.name in key_cols:
                continue
            cell = F.col("after").getItem(f.name)
            set_cond = F.col("after").isNotNull() & ~cell.eqNullSafe(
                UNCHANGED_TOAST
            )
            win_agg.append(
                F.max_by(
                    F.struct(cell.alias("v")),
                    F.when(set_cond, order_struct),
                ).alias(f"__set_{f.name}")
            )
    winner = keyed.groupBy(*[f"__key_{k}" for k in key_cols]).agg(*win_agg)

    if toast_merge:
        alive = winner.filter(F.col("w.op") != OP_DELETE)
        if base is not None:
            # resolve never-set columns from the stored row: equi-join
            # on the key (same key partitioning the anti-join below
            # reuses; AQE broadcasts when the touched-key set is small)
            cond = None
            for k in key_cols:
                c = alive[f"__key_{k}"].eqNullSafe(base[k])
                cond = c if cond is None else (cond & c)
            alive = alive.join(base, on=cond, how="left")
        out_cols = []
        for f in schema.fields:
            if f.name in key_cols:
                # the group key IS the value (already typed)
                out_cols.append(F.col(f"__key_{f.name}").alias(f.name))
                continue
            set_struct = F.col(f"__set_{f.name}")
            resolved = _cast_text(set_struct["v"], f.dataType)
            stored = (
                base[f.name] if base is not None
                else F.lit(None).cast(f.dataType)
            )
            # struct-null = no event ever set the column → stored row;
            # struct present with v = NULL is an EXPLICIT set-to-NULL
            # and must not fall back
            out_cols.append(
                F.when(set_struct.isNotNull(), resolved)
                .otherwise(stored)
                .alias(f.name)
            )
        survivors = alive.select(out_cols)
    else:
        survivors = winner.filter(F.col("w.op") != OP_DELETE).select(
            typed_from_map(F.col("w.after"), schema)
        )

    if base is None:
        return survivors

    # Base rows whose key was never touched by an event. Left-anti join
    # shuffles on the key; AQE converts to broadcast when the touched-key
    # set is small.
    touched = winner.select(
        *[F.col(f"__key_{k}").alias(k) for k in key_cols]
    )
    cond = None
    for k in key_cols:
        c = base[k].eqNullSafe(touched[k])
        cond = c if cond is None else (cond & c)
    untouched = base.join(touched, on=cond, how="left_anti")
    return untouched.select(*[f.name for f in schema.fields]).unionByName(survivors)
