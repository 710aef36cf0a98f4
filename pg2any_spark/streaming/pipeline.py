"""Structured Streaming CDC pipeline.

This is the streaming face of the engine: the reference's entire
producer/consumer/recovery machinery (SURVEY §2.4 O2–O11 — durable
transaction files, LSN dedup, resumable replay, graceful drain,
startup recovery) collapses into ``readStream → foreachBatch(apply) →
checkpointLocation``:

- **exactly-once** (reference O2, ``transaction_manager.rs:1586-1604``):
  checkpoint offsets make each input file/batch processed once; within
  a batch, re-delivered events reduce idempotently (max-LSN wins).
- **restart recovery** (reference O4/O10): restart with the same
  checkpoint resumes after the last committed batch — verified by the
  kill-and-restart test in tests/test_streaming.py.
- **ordering** (reference O1): per-key order enforced inside each
  batch by the max-LSN reduction; batch boundaries follow source
  offset order, which is monotone in LSN for an ordered event feed.

The batch apply here targets a Parquet replica via full-state rewrite
(correct at fixture scale, and the swap is atomic via directory
rename). On a real deployment the same ``apply_fn`` body issues
``MERGE INTO`` against Delta/Iceberg — the event → winner-per-key
reduction is identical, only the final write changes.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from pg2any_spark.operators.apply import apply_changes
from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA, OP_TRUNCATE


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based change-event stream (parquet). A Kafka/Debezium feed
    swaps in ``spark.readStream.format("kafka")`` + ``from_json`` with
    the same envelope schema; everything downstream is unchanged."""
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def _atomic_replace(staging: str, target: str) -> None:
    old = target + f".old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(staging, target)
    if os.path.exists(old):
        shutil.rmtree(old)


def _recover_replica(target: str) -> None:
    """Crash recovery for the staging→target swap, run before every
    batch. A hard kill (SIGKILL, the reference's chaos ``docker stop``
    analogue) can land between the two renames in ``_atomic_replace``,
    leaving the replica missing with its previous state parked in an
    ``.old-*`` directory. Because the stream's checkpoint only commits
    AFTER the swap, the interrupted batch will replay — so the correct
    recovery is to roll the ``.old-*`` state back into place and let
    the idempotent re-apply run (max-LSN winners make re-applied events
    a no-op over an already-applied base). Leftover ``.old-*`` dirs
    next to a live target (kill after swap, before cleanup) and
    orphaned ``.staging-*`` dirs (kill mid-write) are deleted."""
    olds = sorted(glob.glob(target + ".old-*"), key=os.path.getmtime)
    if olds and not os.path.exists(target):
        os.rename(olds[-1], target)
        olds = olds[:-1]
    for d in olds:
        shutil.rmtree(d, ignore_errors=True)
    for d in glob.glob(target + ".staging-*"):
        shutil.rmtree(d, ignore_errors=True)


def apply_batch_to_parquet(
    spark: SparkSession,
    batch_df: DataFrame,
    target_path: str,
    schema: StructType,
    key_cols: list[str],
    table: str | None = None,
    toast_merge: bool = False,
) -> None:
    """One micro-batch: current replica ⊕ batch events → new replica."""
    _recover_replica(target_path)
    base = None
    if os.path.exists(target_path):
        base = spark.read.parquet(target_path)
    final = apply_changes(
        batch_df, schema, key_cols, base=base, table=table,
        toast_merge=toast_merge,
    )
    staging = target_path + f".staging-{uuid.uuid4().hex[:8]}"
    final.write.mode("overwrite").parquet(staging)
    _atomic_replace(staging, target_path)


#: Partition column for bucketed replicas (not part of the user schema).
BUCKET_COL = "__bucket"

#: join_view_apply_batch materializes the batch's touched join keys
#: through the driver (collect + broadcast) — fine for a normal
#: micro-batch, ballooning for a giant backfill batch. Above this many
#: distinct keys the set is staged to parquet and semi-joined without
#: a broadcast hint instead; module-level so tests can pin it low and
#: force the overflow path.
TOUCHED_KEYS_COLLECT_MAX = 1_000_000


def _bucket_of(
    key_cols: list[str],
    n_buckets: int,
    schema: StructType | None = None,
    from_images: bool = False,
):
    """Bucket expression: pmod(murmur3(key), n).

    Both paths hash the CANONICAL string rendering — typed key cast to
    string. The image path therefore round-trips the wire text through
    the destination type first (``schema`` required): a non-canonical
    wire rendering ('042', '1.50', 't') must land in the same bucket
    as the typed row it produces, or the pruned base read and the
    written partition diverge and dynamic overwrite destroys an
    unpruned bucket.
    """
    if from_images:
        from pg2any_spark.operators.apply import _cast_text

        parts = [
            _cast_text(
                F.coalesce(
                    F.col("after").getItem(k), F.col("before").getItem(k)
                ),
                schema[k].dataType,
            ).cast("string")
            for k in key_cols
        ]
    else:
        parts = [F.col(k).cast("string") for k in key_cols]
    return F.pmod(F.hash(*parts), F.lit(n_buckets))


def apply_batch_to_bucketed_parquet(
    spark: SparkSession,
    batch_df: DataFrame,
    target_path: str,
    schema: StructType,
    key_cols: list[str],
    n_buckets: int = 64,
    table: str | None = None,
    toast_merge: bool = False,
) -> None:
    """One micro-batch against a BUCKET-PARTITIONED replica: only the
    partitions containing touched keys are re-derived and overwritten.
    ``toast_merge`` resolves unchanged-TOAST sentinels against the
    touched-bucket slice (the stored rows the fallback join needs are
    exactly the ones the pruned base read loads).

    The replica is laid out as ``target/__bucket=N/*.parquet`` with
    ``__bucket = pmod(hash(key), n_buckets)``. Per batch:

    1. the touched-bucket list comes from one tiny distinct over the
       batch's key images (≤ n_buckets values — driver-safe);
    2. the base read prunes to touched partitions (directory-level
       partition pruning, visible as PartitionFilters in the scan);
    3. the max-LSN apply runs over that slice only;
    4. ``partitionOverwriteMode=dynamic`` replaces exactly the
       partitions present in the output; buckets whose rows were all
       deleted are cleared explicitly.

    Batch cost is O(touched buckets), not O(table) — at a 100 TB
    replica with 4096 buckets, a batch touching 1% of keys rewrites
    ~1% of the table (this is MERGE INTO's pruning, built from plain
    parquet). Crash contract: the checkpoint commits only after the
    batch, so a mid-write crash replays the batch; re-applying onto
    already-updated buckets is a no-op (max-LSN idempotence), and
    Spark's job-level commit keeps each partition directory
    old-or-new, never half-written.

    TRUNCATE events are not supported on this path (a truncate is a
    whole-table barrier, incompatible with touched-bucket pruning) and
    FAIL LOUDLY — silently dropping one would leave the replica
    permanently diverged from the source. Use the full-rewrite applier
    (``apply_batch_to_parquet``) for feeds that can carry truncates.
    """
    _recover_replica(target_path)  # compact_replica crash mid-swap
    if table is not None:
        batch_df = batch_df.filter(F.col("table") == table)
    # One job yields both the touched-bucket list and the truncate
    # check; truncate events carry NULL key images, so their rows are
    # flagged (not bucketed) before the distinct. Unlike the touched-
    # KEY set in join_view_apply_batch, this collect is bounded by the
    # CONFIGURED bucket count (≤ 2·n_buckets rows after the distinct),
    # not by batch size — no overflow guard needed at any batch size.
    touched_rows = (
        batch_df.select(
            _bucket_of(key_cols, n_buckets, schema, from_images=True).alias("b"),
            (F.col("op") == OP_TRUNCATE).alias("t"),
        )
        .distinct()
        .collect()
    )
    if any(r["t"] for r in touched_rows):
        raise ValueError(
            "TRUNCATE event in batch: the bucketed incremental applier "
            "cannot express a whole-table barrier as a touched-bucket "
            "rewrite. Route this table through apply_batch_to_parquet "
            "(full-rewrite applier), which handles truncates."
        )
    touched = [r["b"] for r in touched_rows]
    if not touched:
        return
    base = None
    if os.path.exists(target_path):
        base = (
            spark.read.option("basePath", target_path)
            .parquet(target_path)
            .filter(F.col(BUCKET_COL).isin(touched))
            .drop(BUCKET_COL)
        )
    final = (
        apply_changes(
            batch_df, schema, key_cols, base=base, scan_for_truncate=False,
            toast_merge=toast_merge,
        )
        .withColumn(BUCKET_COL, _bucket_of(key_cols, n_buckets))
        .persist()  # one apply computation serves both actions below
    )
    try:
        # dynamic overwrite only replaces partitions PRESENT in the
        # output: a touched bucket that lost its last row must be
        # cleared manually. Computed BEFORE the write — afterwards the
        # lazy plan would re-read the just-overwritten base.
        remaining = {
            r[0] for r in final.select(BUCKET_COL).distinct().collect()
        }
        (
            final.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(target_path)
        )
    finally:
        final.unpersist()
    for b in set(touched) - remaining:
        shutil.rmtree(
            os.path.join(target_path, f"{BUCKET_COL}={b}"), ignore_errors=True
        )


def read_bucketed_replica(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a bucketed replica without the internal partition column."""
    return spark.read.parquet(target_path).drop(BUCKET_COL)


def compact_replica(
    spark: SparkSession,
    target_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a parquet replica's small files (streaming appliers
    accrete one file set per micro-batch; scans degrade as the file
    count grows — the classic small-files problem). Rewrites the table
    into ``ceil(bytes / target_file_bytes)`` files via the same
    staged-rename swap the applier uses, so a crash mid-compaction
    leaves the original intact. Bucketed replicas keep their
    ``__bucket=`` layout (partition column is preserved by the
    rewrite). Returns the new file count.

    Run it out-of-band (maintenance window / every N batches) — it
    reads the whole replica, which is exactly what the incremental
    applier avoids per batch; at 100 TB you compact per-partition on a
    schedule, never the world at once.
    """
    sizes = [
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(target_path)
        for f in files
        if f.endswith(".parquet")
    ]
    if not sizes:
        return 0
    n_files = max(1, -(-sum(sizes) // target_file_bytes))
    df = spark.read.parquet(target_path)
    partitioned = BUCKET_COL in df.columns
    staging = target_path + f".staging-{uuid.uuid4().hex[:8]}"
    if partitioned:
        # one output file per bucket partition (repartition on the
        # partition column so each task owns whole buckets)
        writer = (
            df.repartition(F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(staging)
    _atomic_replace(staging, target_path)
    return sum(
        1
        for _root, _dirs, files in os.walk(target_path)
        for f in files
        if f.endswith(".parquet")
    )


def start_bucketed_cdc_apply(
    events: DataFrame,
    target_path: str,
    schema: StructType,
    key_cols: list[str],
    checkpoint_dir: str,
    n_buckets: int = 64,
    table: str | None = None,
    available_now: bool = True,
    toast_merge: bool = False,
) -> StreamingQuery:
    """CDC apply stream onto a bucket-partitioned replica — same
    checkpoint/exactly-once contract as ``start_cdc_apply``, with
    per-batch cost proportional to touched buckets instead of table
    size."""
    spark = events.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_to_bucketed_parquet(
            spark, batch_df, target_path, schema, key_cols, n_buckets, table,
            toast_merge=toast_merge,
        )

    writer = events.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cdc_apply(
    events: DataFrame,
    target_path: str,
    schema: StructType,
    key_cols: list[str],
    checkpoint_dir: str,
    table: str | None = None,
    available_now: bool = True,
    dedup_boundary: int = 0,
) -> StreamingQuery:
    """Start the CDC apply stream onto a Parquet replica.

    ``dedup_boundary`` is the reconciled resume position from
    ``config.reconcile_resume`` (reference ``slot.rs:62-97`` +
    ``transaction_manager.rs:1586-1604``): committed events at or below
    it were already applied in a previous incarnation, so they are
    filtered out before apply. With a fresh checkpoint against an
    already-applied source this is what prevents double-apply — the
    checkpoint handles the steady state, the boundary handles the
    hand-off, exactly as the reference's disk-LSN/slot split.
    """
    spark = events.sparkSession
    if dedup_boundary:
        events = events.filter(F.col("lsn") > dedup_boundary)

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_to_parquet(spark, batch_df, target_path, schema, key_cols, table)

    writer = events.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_pgoutput_apply(
    spark: SparkSession,
    frames_dir: str,
    target_path: str,
    schema: StructType,
    key_cols: list[str],
    checkpoint_dir: str,
    table: str | None = None,
    available_now: bool = True,
    protocol_version: int = 1,
    low_memory: bool = True,
    toast_merge: bool = False,
    xlog_envelopes: bool = False,
    max_files_per_trigger: int | None = None,
    broadcast_commits: bool = True,
) -> StreamingQuery:
    """Stream pgoutput WIRE FRAMES straight into a replica: readStream
    over ``(segment_id, seq, wal_lsn, frame)`` parquet → per-batch
    decode → the ordinary max-LSN apply. The full ingest path of the
    reference — wire protocol to destination table — as one
    checkpointed stream.

    ``low_memory=True`` (default) decodes via
    ``sources.pgoutput.decode_wal_frames_raw`` + ``stamp_commits``:
    rows stream through bounded Arrow batches and transactions are
    resolved by a commit join, so one multi-million-row transaction
    (the reference's chaos scenario 5, which its transaction manager
    survives by spilling 64 MB segments) cannot hold a Python worker's
    memory. ``low_memory=False`` keeps the original whole-segment
    ``applyInPandas`` decode (one group per segment — fine when
    segments are known-small).

    Contract: a WAL segment must arrive WHOLE within one micro-batch
    (land one file per segment and it holds for any trigger), because
    decoder state — the Relation registry and open-transaction
    bookkeeping — lives only for the batch; this is the same
    segment-self-containment the batch decoder documents, now doing
    double duty as the unit of checkpoint recovery: a replayed batch
    re-decodes the same frames to the same events and the max-LSN
    apply makes the rewrite a no-op.

    ``max_files_per_trigger`` caps how many frame FILES each
    micro-batch ingests — only safe when the producer lands every
    segment wholly inside one file (the segment-self-containment
    contract above, now per file). Leave ``None`` (the default) when
    file/segment alignment is not guaranteed: the stream then drains
    everything available in a single batch, which is always safe.
    Bounded batches are what let a long multi-transaction backlog
    checkpoint incrementally — the repeated-kill chaos scenario
    (tests/test_scenarios.py::test_s5_multi_kill_wire) strikes
    between those per-batch commits."""
    from pg2any_spark.sources.pgoutput import (
        WAL_FRAME_SCHEMA,
        XLOG_ENVELOPE_SCHEMA,
        decode_wal_frames_raw,
        decode_wal_segments,
        stamp_commits,
        unwrap_xlog_frames,
    )

    # With xlog_envelopes, frames_dir holds raw socket traffic: XLogData
    # ('w') COPY envelopes + keepalives, as a live client records them.
    # The wal_lsn comes from each envelope's wal_start — the same
    # position the client's standby-status feedback advances
    # (sources.pgoutput.feedback_lsn).
    reader = spark.readStream.schema(
        XLOG_ENVELOPE_SCHEMA if xlog_envelopes else WAL_FRAME_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    frames = reader.parquet(frames_dir)
    if xlog_envelopes:
        frames = unwrap_xlog_frames(frames)

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        # persist the decoded rows: the commit join (low_memory) or the
        # apply's truncate-barrier scan plus the apply itself would
        # otherwise run the Python decode twice per micro-batch; the
        # decoded envelope is far smaller than the frames and bounded
        # by the batch. MEMORY_AND_DISK: a scenario-5-sized batch must
        # spill, not OOM.
        from pyspark.storagelevel import StorageLevel

        if low_memory:
            cached = decode_wal_frames_raw(
                batch_df, protocol_version, toast_merge=toast_merge
            )
            cached = cached.persist(StorageLevel.MEMORY_AND_DISK)
            events = stamp_commits(cached, broadcast_commits=broadcast_commits)
        else:
            cached = decode_wal_segments(
                batch_df, protocol_version, toast_merge=toast_merge
            )
            cached = cached.persist(StorageLevel.MEMORY_AND_DISK)
            events = cached
        try:
            apply_batch_to_parquet(
                spark, events, target_path, schema, key_cols, table,
                toast_merge=toast_merge,
            )
        finally:
            cached.unpersist()

    writer = frames.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _start_multi_table(
    events: DataFrame,
    tables: dict[str, tuple[str, StructType, list[str]]],
    checkpoint_dir: str,
    available_now: bool,
    apply_one,
) -> StreamingQuery:
    """Shared multi-table dispatch scaffolding: one micro-batch is
    persisted once and fanned out to ``apply_one(batch_df, table,
    target, schema, key_cols)`` per publication table, all under ONE
    checkpoint so every replica advances atomically."""

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            for table, (target, schema, key_cols) in tables.items():
                apply_one(batch_df, table, target, schema, key_cols)
        finally:
            batch_df.unpersist()

    writer = events.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_multi_table_apply(
    events: DataFrame,
    tables: dict[str, tuple[str, StructType, list[str]]],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Apply ONE change-event stream onto MANY table replicas — the
    reference replicates every table in the publication through one
    slot (``lib.rs`` consumer loop dispatches per event table); here
    one micro-batch fans out to per-table applies inside a single
    foreachBatch, so all tables advance atomically with one checkpoint.

    ``tables`` maps table name → (target parquet path, schema,
    key columns). Each table's apply filters the batch down to its own
    events (`apply_changes(table=…)`), so an empty slice is a cheap
    no-op. One checkpoint covers all tables: a restart replays the
    whole batch for every table, and each apply is idempotent."""
    spark = events.sparkSession

    def apply_one(batch_df, table, target, schema, key_cols):
        apply_batch_to_parquet(
            spark, batch_df, target, schema, key_cols, table=table
        )

    return _start_multi_table(
        events, tables, checkpoint_dir, available_now, apply_one
    )


def start_multi_table_bucketed_apply(
    events: DataFrame,
    tables: dict[str, tuple[str, StructType, list[str]]],
    checkpoint_dir: str,
    n_buckets: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """One change-event stream maintaining MANY bucket-partitioned
    replicas — ``start_multi_table_apply``'s whole-publication
    dispatch (the reference's replication unit, ``consumer.rs:42-101``)
    composed with the touched-bucket incremental applier, so per-batch
    cost is O(touched buckets of touched tables), never O(any table).

    ``tables`` maps table name → (target path, schema, key columns).
    All replicas advance atomically under ONE checkpoint: a restart
    replays the whole batch for every table, each table's apply filters
    to its own events (an empty slice short-circuits before any bucket
    read), and re-applying onto already-updated buckets is a no-op
    (max-LSN idempotence) — the same exactly-once contract as the
    single-table bucketed applier, now publication-wide.
    """
    spark = events.sparkSession

    def apply_one(batch_df, table, target, schema, key_cols):
        apply_batch_to_bucketed_parquet(
            spark, batch_df, target, schema, key_cols,
            n_buckets=n_buckets, table=table,
        )

    return _start_multi_table(
        events, tables, checkpoint_dir, available_now, apply_one
    )


#: Marker file inside an aggregate-view directory recording the last
#: applied micro-batch id (leading underscore → invisible to parquet
#: directory reads). Written inside the staging dir BEFORE the atomic
#: rename, so view data and replay cursor commit together.
AGG_VIEW_BATCH_MARKER = "_LAST_BATCH"


def agg_view_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    view_path: str,
    delta_fn,
    group_cols: list[str],
) -> None:
    """Fold one micro-batch of ADDITIVE deltas into a grouped
    aggregate view, exactly-once.

    ``delta_fn(batch_df)`` renders events as view deltas (group
    columns + additive numeric columns — +1/−1 counts, signed sums);
    the fold is ``(old view ∪ deltas) groupBy sum``. Deltas are NOT
    idempotent under foreachBatch's at-least-once replay (re-adding a
    delta double-counts, unlike the appliers' max-LSN reduction), so
    the view directory carries the last applied batch id in
    ``_LAST_BATCH``, committed atomically with the data by the same
    staged-rename swap the appliers use: a crash between write and
    checkpoint replays the SAME batch id, which is a no-op. A batch
    id strictly BELOW the cursor can only mean the checkpoint and the
    view diverged (checkpoint deleted/repointed while the view
    survived — Spark restarts ids at 0); silently skipping would drop
    genuinely new events folded into the restarted id, so that case
    raises: delete the view with its checkpoint, or keep them
    together.

    Per-batch cost is O(|deltas| + |view|); a view is
    group-cardinality-sized by definition, which is what makes
    continuous maintenance viable when the base table is 100 TB — the
    reference's FULL replica identity exists precisely so delete
    deltas need no base-table lookup (``sql_renderer.rs:353-369``).
    """
    _recover_replica(view_path)
    marker = os.path.join(view_path, AGG_VIEW_BATCH_MARKER)
    if os.path.exists(marker):
        with open(marker) as f:
            last = int(f.read().strip())
        if batch_id == last:
            return  # crash-replay of the last folded batch
        if batch_id < last:
            raise ValueError(
                f"aggregate view at {view_path} has batch cursor {last} "
                f"but the stream delivered batch {batch_id}: the "
                "checkpoint and the view have diverged (restarted "
                "checkpoint against a surviving view?). Folding would "
                "silently drop or double-count deltas — rebuild the "
                "view together with its checkpoint."
            )
    deltas = delta_fn(batch_df)
    num_cols = [c for c in deltas.columns if c not in group_cols]
    if os.path.exists(view_path):
        folded = spark.read.parquet(view_path).unionByName(deltas)
    else:
        folded = deltas
    view = folded.groupBy(*group_cols).agg(
        *[F.sum(c).alias(c) for c in num_cols]
    )
    staging = view_path + f".staging-{uuid.uuid4().hex[:8]}"
    view.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, AGG_VIEW_BATCH_MARKER), "w") as f:
        f.write(str(batch_id))
    _atomic_replace(staging, view_path)


def start_incremental_agg_view(
    events: DataFrame,
    view_path: str,
    delta_fn,
    group_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain a grouped aggregate view from the change
    stream — the streaming twin of the batch ``cdc_incremental_agg_view``
    fold, with the checkpoint/restart contract of the appliers and
    batch-id replay protection from ``agg_view_apply_batch``."""
    spark = events.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        agg_view_apply_batch(
            spark, batch_df, batch_id, view_path, delta_fn, group_cols
        )

    writer = events.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scd2_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    history_path: str,
    schema: StructType,
    key_cols: list[str],
    table: str | None = None,
) -> None:
    """One micro-batch of incremental SCD2 history maintenance.

    Only the keys TOUCHED by the batch are recomputed: their open
    versions re-enter as pseudo insert events (original
    ``valid_from_lsn``), combine with the new events, and re-derive
    intervals via ``scd2_from_events``; closed versions and untouched
    keys carry over verbatim. Per batch the work is O(batch ∪ open
    versions of touched keys), never O(history) — the property that
    keeps a 100 TB history maintainable. The touched-key set is a
    per-batch-sized semi/anti join (broadcast-sized in steady state).

    Replay idempotence (foreachBatch is at-least-once): per touched
    key, batch events at or below the key's high-water LSN already in
    the history — ``greatest(max(valid_from_lsn), max(valid_to_lsn))``
    over its versions, the valid_to side covering keys whose last event
    was a DELETE — are dropped before recomputation. A crash-replayed
    batch (write done, checkpoint not committed) therefore reduces to
    the open versions' pseudo-inserts alone and re-derives the history
    verbatim, the same exactly-once contract as ``start_cdc_apply``'s
    max-LSN reduction.

    ``table`` filters a multi-table event feed down to one table's
    events, matching the other appliers' signatures. TRUNCATE events
    fail loudly (a truncate is not expressible as per-key versioning;
    rebuild via ``scd2_from_events`` after handling it upstream).

    Replica write is the same staged-rename full rewrite as
    ``apply_batch_to_parquet`` (at scale: MERGE INTO Delta/Iceberg,
    identical reduction).
    """
    from pg2any_spark.operators.apply import _cast_text
    from pg2any_spark.operators.scd2 import (
        open_versions_as_events,
        scd2_from_events,
    )
    from pg2any_spark.schemas import DML_OPS

    _recover_replica(history_path)
    if table is not None:
        batch_df = batch_df.filter(F.col("table") == table)
    # The same _cast_text the apply paths use keys the wire text (e.g.
    # boolean 't'/'f') identically to scd2_from_events — a plain cast
    # would NULL such keys out of the touched set and leave stale open
    # versions unretired.
    key_exprs = [
        _cast_text(
            F.coalesce(F.col("after").getItem(k), F.col("before").getItem(k)),
            schema[k].dataType,
        ).alias(k)
        for k in key_cols
    ]
    # One probe job per batch: truncate check + DML count. With a
    # table filter on a multi-table feed, most batches carry zero rows
    # for this table — skipping them keeps per-batch cost O(batch ∪
    # touched), never O(history) for other tables' traffic.
    probe = batch_df.agg(
        F.max((F.col("op") == OP_TRUNCATE).cast("int")).alias("has_trunc"),
        F.sum(F.col("op").isin(*DML_OPS[:3]).cast("int")).alias("n_dml"),
    ).first()
    if probe["has_trunc"]:
        raise ValueError(
            "TRUNCATE event in batch: SCD2 history maintenance has no "
            "per-key rendering of a whole-table barrier. Handle the "
            "truncate upstream, then rebuild with scd2_from_events."
        )
    if not probe["n_dml"] and os.path.exists(history_path):
        return  # nothing for this table in the batch; history stands
    ev = batch_df.filter(F.col("op").isin(*DML_OPS[:3])).select(
        "op", "lsn", "before", "after"
    )
    if os.path.exists(history_path):
        hist = spark.read.parquet(history_path)
        touched = ev.select(*key_exprs).distinct()
        hist_touched = hist.join(F.broadcast(touched), key_cols, "left_semi")
        open_touched = hist_touched.filter(F.col("is_current"))
        carried = hist.join(
            F.broadcast(touched), key_cols, "left_anti"
        ).unionByName(hist_touched.filter(~F.col("is_current")))
        # per-key high-water mark already reflected in the history
        hwm = hist_touched.groupBy(*key_cols).agg(
            F.greatest(
                F.max("valid_from_lsn"),
                F.max(F.coalesce("valid_to_lsn", F.lit(0))),
            ).alias("__hwm")
        )
        ev_new = (
            ev.select("op", "lsn", "before", "after", *key_exprs)
            .join(F.broadcast(hwm), key_cols, "left")
            .filter(F.col("__hwm").isNull() | (F.col("lsn") > F.col("__hwm")))
            .select("op", "lsn", "before", "after")
        )
        events = open_versions_as_events(open_touched, schema).unionByName(ev_new)
        recomputed = scd2_from_events(events, schema, key_cols)
        final = carried.unionByName(recomputed)
    else:
        final = scd2_from_events(ev, schema, key_cols)
    staging = history_path + f".staging-{uuid.uuid4().hex[:8]}"
    final.write.mode("overwrite").parquet(staging)
    _atomic_replace(staging, history_path)


def start_scd2_history(
    events: DataFrame,
    history_path: str,
    schema: StructType,
    key_cols: list[str],
    checkpoint_dir: str,
    table: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain an SCD2 history table from the change-event
    stream — the streaming twin of ``operators.scd2.scd2_from_events``,
    with the same checkpoint/exactly-once/restart contract as
    ``start_cdc_apply`` (crash-replayed batches are no-ops via the
    per-key high-water-mark filter in ``scd2_apply_batch``)."""
    spark = events.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        scd2_apply_batch(spark, batch_df, history_path, schema, key_cols, table)

    writer = events.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def join_view_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    left_path: str,
    left_schema: StructType,
    left_keys: list[str],
    left_table: str,
    right_path: str,
    right_schema: StructType,
    right_keys: list[str],
    right_table: str,
    left_join_col: str,
    right_join_col: str,
    view_path: str,
) -> None:
    """One micro-batch of incremental JOIN-view maintenance: keep
    ``view = left ⋈ right`` (inner, ``left.left_join_col ==
    right.right_join_col``) continuously correct under CDC to BOTH
    base tables.

    Strategy is keyed recompute — the join-view sibling of
    ``scd2_apply_batch``'s touched-key property: (1) apply the batch
    to both replicas (the appliers' own max-LSN idempotent reduction);
    (2) collect the batch's TOUCHED join-key values from either
    table's images (an update that MOVES an order between customers
    touches both old and new keys, because before AND after images
    contribute); (3) recompute the view rows for touched keys only —
    a join of the two replicas each semi-join-pruned to the
    batch-sized touched set — and carry every other view row verbatim.
    Per batch the join work is O(rows of touched keys), never O(view):
    the property that keeps a 100 TB view maintainable. Delete
    propagation is free (a vanished base row simply contributes no
    recomputed pair); the same goes for inserts that complete a pair.

    Replay idempotence: the replica applies are replay-idempotent, and
    the view rewrite is a deterministic function of (replicas, touched
    set) — a crash-replayed batch recomputes identical rows. TRUNCATE
    fails loudly (a whole-table barrier has no per-key rendering; see
    ``scd2_apply_batch``). Replica/view writes are the staged-rename
    full rewrite of ``apply_batch_to_parquet``; at scale, MERGE INTO
    Delta/Iceberg with the identical reduction.
    """
    from pg2any_spark.operators.apply import _cast_text

    _recover_replica(view_path)
    if batch_df.filter(F.col("op") == OP_TRUNCATE).head(1):
        raise ValueError(
            "TRUNCATE event in batch: join-view maintenance has no "
            "per-key rendering of a whole-table barrier. Handle the "
            "truncate upstream, then rebuild the view from replicas."
        )
    key_type = right_schema[right_join_col].dataType

    def touched_from(table: str, col: str) -> DataFrame:
        both = batch_df.filter(F.col("table") == table).select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.array(
                            F.col("after").getItem(col),
                            F.col("before").getItem(col),
                        ),
                        lambda x: x.isNotNull(),
                    )
                )
            ).alias("__raw")
        )
        return both.select(
            _cast_text(F.col("__raw"), key_type).alias("__jk")
        )

    # A left-table DELETE (or key-only UPDATE image) under default
    # replica identity carries only the PK — not the join column — so
    # its OLD join key must come from the PRE-apply replica, or the
    # departed customer's view rows would survive as stale state
    # (silent divergence, the one unacceptable failure mode). One
    # batch-sized PK lookup against the old replica covers it; pinned
    # by TestJoinView::test_streamed_equals_batch_join.
    touched = touched_from(left_table, left_join_col).unionByName(
        touched_from(right_table, right_join_col)
    )
    blind = batch_df.filter(
        (F.col("table") == left_table)
        & F.col("op").isin("u", "d")
        & F.col("before").isNotNull()
        & F.col("before").getItem(left_join_col).isNull()
    )
    if os.path.exists(left_path) and blind.head(1):
        old_left = spark.read.parquet(left_path)
        pks = blind.select(
            *[
                _cast_text(
                    F.col("before").getItem(k), left_schema[k].dataType
                ).alias(k)
                for k in left_keys
            ]
        ).distinct()
        looked_up = old_left.join(F.broadcast(pks), left_keys, "left_semi")
        touched = touched.unionByName(
            looked_up.select(
                F.col(left_join_col).cast(key_type).alias("__jk")
            )
        )
    # materialize the touched set BEFORE the replicas advance — its
    # lineage reads the pre-apply left replica, which the staged
    # rename below replaces. The set is batch-bounded (≤ key images in
    # the batch), so the common path collects through the driver; a
    # giant backfill batch would balloon that, so above the threshold
    # the set is staged to parquet instead — same pre-apply snapshot
    # semantics, zero driver materialization (round-8 verdict item 3).
    touched_d = touched.distinct()
    # One collect doubles as overflow probe and payload: collecting
    # MAX+1 rows bounds driver transfer exactly like the old
    # limit().count() probe did, but the common path no longer runs
    # the distinct shuffle twice (round-9 advisor finding).
    probe_rows = touched_d.limit(TOUCHED_KEYS_COLLECT_MAX + 1).collect()
    if len(probe_rows) <= TOUCHED_KEYS_COLLECT_MAX:
        touched = spark.createDataFrame(probe_rows, touched.schema)
        touched_stage = None
    else:
        touched_stage = view_path.rstrip("/") + ".__touched_stage"
        touched_d.write.mode("overwrite").parquet(touched_stage)
        touched = spark.read.parquet(touched_stage)
    # a collected batch-sized set broadcasts; the staged overflow set
    # may exceed the broadcast budget, so it joins as a plain (shuffle
    # or AQE-chosen) semi join instead
    hint = F.broadcast if touched_stage is None else (lambda df: df)
    apply_batch_to_parquet(
        spark, batch_df, left_path, left_schema, left_keys, table=left_table
    )
    apply_batch_to_parquet(
        spark, batch_df, right_path, right_schema, right_keys,
        table=right_table,
    )
    left_new = spark.read.parquet(left_path)
    right_new = spark.read.parquet(right_path)
    lp = left_new.join(
        hint(touched),
        left_new[left_join_col] == F.col("__jk"),
        "left_semi",
    )
    rp = right_new.join(
        hint(touched),
        right_new[right_join_col] == F.col("__jk"),
        "left_semi",
    )
    recomputed = lp.join(rp, lp[left_join_col] == rp[right_join_col])
    if os.path.exists(view_path):
        old = spark.read.parquet(view_path)
        carried = old.join(
            hint(touched),
            old[left_join_col] == F.col("__jk"),
            "left_anti",
        )
        final = carried.unionByName(recomputed)
    else:
        final = recomputed
    staging = view_path + f".staging-{uuid.uuid4().hex[:8]}"
    final.write.mode("overwrite").parquet(staging)
    _atomic_replace(staging, view_path)
    if touched_stage is not None:
        shutil.rmtree(touched_stage, ignore_errors=True)


def start_join_view(
    events: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """Continuously maintain an inner-join materialized view over two
    replicated tables from ONE interleaved change stream — the join
    sibling of ``start_incremental_agg_view``, with the appliers'
    checkpoint/restart contract. ``kwargs`` forward to
    ``join_view_apply_batch``."""
    spark = events.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        join_view_apply_batch(spark, batch_df, view_path=view_path, **kwargs)

    writer = events.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Cast a TIMESTAMP_NTZ event-time column to TIMESTAMP.

    ``withWatermark`` raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    NTZ columns, and NTZ is exactly what Spark 4 infers from the
    fixtures' ``Timestamp(isAdjustedToUTC=false)`` parquet encoding.
    Session TZ is pinned UTC so the instant is unchanged; plain
    TIMESTAMP columns pass through untouched.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop documents whose normalized-content
    fingerprint was already seen within the watermark horizon — the
    ingest-time counterpart of ``operators.dedup.exact_dedup`` for a
    continuously arriving corpus (re-crawls, mirrored feeds).

    ``dropDuplicatesWithinWatermark`` keys state on the fingerprint
    and expires it once the watermark passes, so state is bounded by
    (dedup horizon × arrival rate), not corpus size — the property
    that makes this viable on an unbounded 100 TB/day feed. Exact
    global dedup across all history belongs in the batch operator
    over the accumulated table.
    """
    from pg2any_spark.operators.text import normalize_text

    fingered = _ensure_event_time(docs, ts_col).withColumn(
        "fingerprint", F.md5(normalize_text(F.col(text_col)))
    )
    return fingered.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


#: Closed-session output of ``sessionize_stream``.
SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, duration_s long"
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: a custom stateful operator over
    ``applyInPandasWithState`` keyed by user — the continuous
    counterpart of the batch ``sessionize_events`` query (same
    gap-based session definition).

    State per user is ONE open session (start, last-event, count) —
    constant bytes per active user, not per event. A batch's events
    close sessions in-group when the gap is exceeded; sessions with no
    successor close via event-time timeout once the watermark passes
    ``last + gap`` (late events beyond the watermark are dropped by
    the same contract as every watermarked operator). At 100 TB/day
    state scales with concurrently-active users only.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    def close_frame(user_id, sessions):
        # ONE vectorized frame per key, never per-session 1-row frames
        # (pd.concat of 1-row frames cost ~0.1 ms per closed session —
        # at ~10^5 sessions/batch that was a measurable slice of
        # addBatch time)
        import pandas as pd

        starts = [s[0] for s in sessions]
        lasts = [s[1] for s in sessions]
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": pd.to_datetime(starts, unit="us"),
                "session_end": pd.to_datetime(lasts, unit="us"),
                "n_events": [s[2] for s in sessions],
                "duration_s": [
                    (last - start) // 1_000_000
                    for start, last in zip(starts, lasts)
                ],
            }
        )

    def sessionize(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield close_frame(user_id, [(start_us, last_us, n)])
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend(pdf["ts"].astype("int64") // 1000)
        ts_us.sort()
        open_sess = list(state.get) if state.exists else None
        closed = []
        for t in ts_us:
            if open_sess is None:
                open_sess = [t, t, 1]
            elif t - open_sess[1] <= gap_us:
                open_sess[1] = t
                open_sess[2] += 1
            else:
                closed.append(tuple(open_sess))
                open_sess = [t, t, 1]
        state.update(tuple(open_sess))
        state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        if closed:
            yield close_frame(user_id, closed)

    return (
        _ensure_event_time(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    watermark: str = "1 hour",
    right_by: str | None = None,
) -> DataFrame:
    """Stream-STREAM bounded interval join — the continuous twin of
    ``operators.temporal.interval_join`` (e.g. click↔purchase
    attribution over two live feeds).

    Both sides are watermarked, and the join condition bounds
    ``right_ts`` to [left_ts, left_ts + gap]; together those two facts
    let Spark expire buffered rows once the watermark passes their
    match horizon — state is bounded by (watermark + gap) × arrival
    rate per side, the requirement for an unbounded run. Without the
    time bound the state would grow forever (Spark rejects unbounded
    stream-stream inner joins on watermark alone for exactly that
    reason).

    Column names must be disjoint across sides; ``by`` is the left key
    name, ``right_by`` the right one (defaults to ``{by}_r``, matching
    the batch twin's rename convention for self-join feeds).
    """
    right_by = right_by or f"{by}_r"
    lw = _ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = _ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (lw[by] == rw[right_by])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
    )
    return lw.join(rw, cond)


def streaming_daily_counts(
    events: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events stream
    (the §2.5 surface the reference lacks): late data beyond the
    watermark is dropped, state is bounded."""
    return (
        _ensure_event_time(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("day"), "event_type", "n_events", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# continuous near-dup detection: streaming LSH index maintenance
# ---------------------------------------------------------------------------

#: Partition column of the streaming dedup index / match log. Each
#: micro-batch owns exactly one partition, which is what makes replay
#: idempotent (dynamic partition overwrite rewrites the same partition
#: with the same deterministic rows).
INGEST_BATCH_COL = "ingest_batch"


#: Second-level partition columns a dedup-index tree may carry for
#: probe-side pruning (band-key prefix / SRP bucket). Introspected by
#: the writers and ``compact_ingest_index`` so every write preserves
#: the layout.
INGEST_SUB_PARTITION_COLS = ("band_pfx", "bucket")


def _ingest_partition_cols(df: DataFrame) -> list[str]:
    return [INGEST_BATCH_COL] + [
        c for c in INGEST_SUB_PARTITION_COLS if c in df.columns
    ]


def band_pfx_expr(band_key_col: str = "band_key"):
    """The lexical indexes' probe-prune key: first 2 hex chars of the
    band key, forced non-numeric with a ``p`` prefix so partition-type
    inference can never coerce it (``"07"`` → 7 would break isin
    pruning). ONE definition shared by writer, probe, and legacy
    derivation."""
    return F.concat(F.lit("p"), F.substring(band_key_col, 1, 2))


def _tree_has_sub_level(path: str) -> bool:
    """True when an existing index tree carries the second partition
    level (``ingest_batch=N/<col>=v/``). Mixing layouts in one tree
    breaks Spark partition discovery, so writers and compaction match
    whatever layout the tree already has."""
    for d in sorted(os.listdir(path)):
        if d.startswith(INGEST_BATCH_COL + "="):
            full = os.path.join(path, d)
            return any("=" in e for e in os.listdir(full))
    return False


def pruned_index_read(
    spark: SparkSession,
    index_path: str,
    batch_id: int,
    prune_col: str,
    prune_values: list,
) -> DataFrame:
    """The probe-side index scan both streaming dedup indexes share:
    earlier-committed-batches filter plus sub-partition pruning on the
    batch's own key values (band prefixes / SRP buckets). Both
    conjuncts hit PARTITION columns, so the parquet source prunes
    whole directories — probe I/O is proportional to the batch's key
    footprint, not the accumulated index
    (tests/test_streaming.py audits the file set actually read).

    Backward compatible with legacy trees (written before the
    sub-partition layout, flat ``ingest_batch=N``): if the prune
    column is absent it is DERIVED for ``band_pfx`` (row-level filter
    — correct, no directory pruning) and the scan stays unpruned for
    other columns; ``compact_ingest_index`` migrates the tree to the
    pruned layout on the next maintenance window."""
    df = spark.read.parquet(index_path)
    if prune_col not in df.columns:
        if prune_col == "band_pfx" and "band_key" in df.columns:
            df = df.withColumn(prune_col, band_pfx_expr())
        else:
            return df.filter(F.col(INGEST_BATCH_COL) < batch_id)
    return df.filter(
        (F.col(INGEST_BATCH_COL) < batch_id)
        & F.col(prune_col).isin(prune_values)
    )


def _overwrite_ingest_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Write rows under their ``ingest_batch=<id>`` partition via
    dynamic partition overwrite — the idempotence primitive of the
    streaming dedup indexes (deterministic rows + own-partition-only
    writes ⇒ replays rewrite identical data). If the rows carry a
    probe-prune column (``band_pfx``/``bucket``) it becomes a second
    partition level, so probes can skip whole directories — UNLESS the
    target tree already exists with the flat legacy layout, in which
    case the sub column is dropped to keep the tree uniform (Spark
    partition discovery rejects mixed depths); compaction migrates
    legacy trees wholesale."""
    df = df.withColumn(INGEST_BATCH_COL, F.lit(batch_id))
    part_cols = _ingest_partition_cols(df)
    if (
        len(part_cols) > 1
        and os.path.exists(path)
        and not _tree_has_sub_level(path)
        and any(
            d.startswith(INGEST_BATCH_COL + "=") for d in os.listdir(path)
        )
    ):
        # legacy-layout tree: write flat. band_pfx is DERIVABLE so it
        # must not enter the data files (legacy rows lack it — nulls
        # would dodge the probe's isin filter); bucket was always a
        # data column and stays one.
        if "band_pfx" in df.columns:
            df = df.drop("band_pfx")
        part_cols = [INGEST_BATCH_COL]
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*part_cols)
        .parquet(path)
    )


def dedup_index_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    matches_path: str,
    id_col: str = "id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    within_batch: bool = True,
) -> None:
    """One micro-batch of continuous near-dup detection.

    Per batch: (1) compute the batch's LSH band keys — the ONLY
    hashing work, O(|batch|); (2) probe the accumulated index for
    cross-batch matches and (optionally) self-join the batch's own
    bands for within-batch pairs; (3) write the matches and append the
    band keys, both under ``ingest_batch=<id>`` partitions via dynamic
    partition overwrite.

    Exactly-once: band keys and matches are deterministic functions of
    the batch content, and each batch writes only its own partition —
    a crash-replayed batch overwrites that partition with identical
    rows (the probe filters the index to ``ingest_batch < batch_id``,
    so a replay that already appended its own bands cannot self-match).
    No marker file needed, unlike the additive agg view: overwrite of
    a deterministic partition is naturally idempotent.

    At scale the index grows ``bands`` short rows per document and is
    the only state. Index rows carry ``band_pfx`` (first 2 hex chars of
    the band key, forced non-numeric with a ``p`` prefix so partition
    inference can never coerce it) as a SECOND partition level: the
    probe collects the batch's distinct prefixes (≤ 256 values — a
    bounded driver transfer regardless of batch size) and filters the
    index read with them, so the scan prunes to matching directories
    instead of reading the whole accumulated index — O(|batch|) probe
    I/O per micro-batch, not O(corpus). The probe join itself is keyed
    on (band_idx, band_key) — AQE splits skewed boilerplate buckets,
    same as the batch operator.
    """
    from pg2any_spark.operators.dedup import join_band_tables, lsh_index

    # roll back a compaction swap interrupted mid-rename — otherwise a
    # missing index dir silently skips the probe AND the next
    # compaction's recovery would delete the parked .old-* state
    _recover_replica(index_path)
    _recover_replica(matches_path)
    if batch_df.limit(1).count() == 0:
        return
    bands_df = (
        lsh_index(batch_df, id_col, text_col, num_hashes, bands, shingle_n)
        .withColumn("band_pfx", band_pfx_expr())
        .persist()
    )
    try:
        cross = None
        if os.path.exists(index_path):
            batch_pfx = [
                r[0] for r in bands_df.select("band_pfx").distinct().collect()
            ]
            idx = pruned_index_read(
                spark, index_path, batch_id, "band_pfx", batch_pfx
            )
            cross = join_band_tables(bands_df, idx, id_col)
        if within_batch:
            self_pairs = join_band_tables(
                bands_df, bands_df, id_col, index_lt_probe=True
            )
            cross = self_pairs if cross is None else cross.unionByName(self_pairs)
        if cross is not None:
            matches = cross.distinct().persist()
            try:
                # an all-empty write would create a schema-less parquet
                # dir (unreadable until the first real partition lands)
                # — skip it; idempotence is unaffected, an empty batch
                # writes nothing on replay too
                if matches.limit(1).count() > 0:
                    _overwrite_ingest_partition(matches, matches_path, batch_id)
            finally:
                matches.unpersist()
        _overwrite_ingest_partition(bands_df, index_path, batch_id)
    finally:
        bands_df.unpersist()


def start_streaming_dedup_index(
    docs: DataFrame,
    index_path: str,
    matches_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    text_col: str = "text",
    available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """Continuously flag near-duplicate documents in an ingest stream
    against everything seen so far — the streaming twin of
    ``operators.dedup.incremental_lsh_matches``, with the appliers'
    checkpoint/restart contract (replayed batches rewrite their own
    deterministic partitions, see ``dedup_index_apply_batch``)."""
    spark = docs.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        dedup_index_apply_batch(
            spark,
            batch_df,
            batch_id,
            index_path,
            matches_path,
            id_col,
            text_col,
            **kwargs,
        )

    writer = docs.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_index_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    matches_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    threshold: float = 0.95,
    within_batch: bool = True,
) -> None:
    """One micro-batch of continuous SEMANTIC near-dup detection — the
    embedding twin of ``dedup_index_apply_batch``.

    The stored index holds (id, SRP bucket, unit vector) per document:
    a few hundred bytes/vector, partitioned by (ingest batch, bucket) —
    the bucket level lets each probe prune its index scan to the
    batch's ≤ 2^planes buckets instead of reading the whole corpus
    index. Per
    batch: one Arrow pass tags+normalizes the incoming vectors, the
    probe joins the index on ``bucket`` (candidates only — the
    random-hyperplane bucket join replaces the |batch|·|corpus| cross
    product) and keeps pairs with exact cosine ≥ ``threshold``;
    within-batch pairs come from the same bucket self-join. Matches
    and index rows land under the batch's own partition, giving the
    same replay idempotence as the lexical applier (deterministic
    rows + own-partition overwrite; probe excludes own/later batches;
    redelivered ids never self-match).

    Recall < 1.0 by design (same-bucket candidates only — SRP-LSH);
    raise ``num_planes`` fidelity or probe neighboring buckets for
    higher recall, the ``lsh_topk`` trade. Hot buckets (embedding-
    collapsed corpora) split under AQE skew handling.
    """
    from pg2any_spark.operators.similarity import _bucketed_normalized, dot

    _recover_replica(index_path)  # see dedup_index_apply_batch
    _recover_replica(matches_path)
    if batch_df.limit(1).count() == 0:
        return
    tagged = _bucketed_normalized(
        batch_df, id_col, "id", vec_col, "vec", dim, num_planes
    ).persist()
    try:
        as_index = lambda df, name: df.select(  # noqa: E731
            F.col("id").alias(name), "bucket", F.col("vec").alias("x_vec")
        )

        def scored(pairs: DataFrame) -> DataFrame:
            return (
                pairs.withColumn(
                    "cos_sim", F.round(dot(F.col("vec"), F.col("x_vec")), 6)
                )
                .filter(F.col("cos_sim") >= threshold)
                .select(
                    F.col("id").alias("incoming_id"), "corpus_id", "cos_sim"
                )
            )

        cross = None
        if os.path.exists(index_path):
            # prune the index scan to the batch's buckets: ≤ 2^planes
            # distinct values (bounded driver transfer), matching the
            # bucket partition level laid down by the index writes
            batch_buckets = [
                r[0] for r in tagged.select("bucket").distinct().collect()
            ]
            idx = as_index(
                pruned_index_read(
                    spark, index_path, batch_id, "bucket", batch_buckets
                ),
                "corpus_id",
            )
            cross = scored(
                tagged.join(idx, "bucket").filter(
                    F.col("id") != F.col("corpus_id")
                )
            )
        if within_batch:
            self_pairs = scored(
                tagged.join(as_index(tagged, "corpus_id"), "bucket").filter(
                    F.col("corpus_id") < F.col("id")
                )
            )
            cross = self_pairs if cross is None else cross.unionByName(self_pairs)
        if cross is not None:
            matches = cross.distinct().persist()
            try:
                if matches.limit(1).count() > 0:
                    _overwrite_ingest_partition(matches, matches_path, batch_id)
            finally:
                matches.unpersist()
        _overwrite_ingest_partition(tagged, index_path, batch_id)
    finally:
        tagged.unpersist()


def start_streaming_embedding_dedup(
    vectors: DataFrame,
    index_path: str,
    matches_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """Continuously flag semantically near-duplicate embeddings in an
    ingest stream against everything seen so far — the semantic twin
    of ``start_streaming_dedup_index``, same checkpoint/replay
    contract (``embedding_index_apply_batch``)."""
    spark = vectors.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        embedding_index_apply_batch(
            spark,
            batch_df,
            batch_id,
            index_path,
            matches_path,
            id_col,
            vec_col,
            **kwargs,
        )

    writer = vectors.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    cells_path: str,
    key_col: str = "key",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> None:
    """One micro-batch of continuous count-min sketch maintenance:
    build the batch's partial cells (``sketch.count_min_cells``) and
    land them under the batch's own ``ingest_batch`` partition — the
    same replay-idempotence contract as the dedup indexes
    (deterministic rows + own-partition overwrite), and because the
    sketch is mergeable by cell-wise addition, the merged view over
    all partitions IS the sketch of everything ingested so far.

    Storage is one flat partition level: rows are ``(cell, n)`` with
    ``cell = i*width + bucket`` — no bucket sub-dirs, because the
    sketch is always read whole (≤ depth×width rows after merge;
    there is nothing for pruning to prune, unlike the LSH/embedding
    indexes whose corpus-sized trees need it)."""
    from pg2any_spark.operators.sketch import count_min_cells

    _recover_replica(cells_path)
    if batch_df.limit(1).count() == 0:
        return
    cells = count_min_cells(batch_df, key_col, weight_col, depth, width)
    flat = cells.select(
        (F.col("i").cast("long") * width + F.col("bucket")).alias("cell"),
        "n",
    )
    _overwrite_ingest_partition(flat, cells_path, batch_id)


def read_cms_cells(
    spark: SparkSession, cells_path: str, width: int = 1024
) -> DataFrame:
    """The accumulated sketch: cell-wise sum of every ingest batch's
    partial cells (mergeability in action), reshaped back to the
    operator-facing ``(i, bucket, n)`` so ``sketch.cms_estimate``
    probes it directly."""
    flat = spark.read.parquet(cells_path)
    merged = flat.groupBy("cell").agg(F.sum("n").cast("long").alias("n"))
    return merged.select(
        F.expr(f"cell div {width}").cast("int").alias("i"),
        (F.col("cell") % width).cast("int").alias("bucket"),
        "n",
    )


def start_streaming_cms(
    rows: DataFrame,
    cells_path: str,
    checkpoint_dir: str,
    key_col: str = "key",
    weight_col: str | None = None,
    available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """Continuously maintain a count-min frequency sketch over an
    ingest stream — the streaming twin of a one-shot
    ``count_min_cells`` build, with the appliers' checkpoint/restart
    contract. At any point ``read_cms_cells`` + ``cms_estimate``
    answer "how often has this key occurred so far" without ever
    materializing the distinct-key table."""
    spark = rows.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        cms_apply_batch(
            spark, batch_df, batch_id, cells_path, key_col, weight_col,
            **kwargs,
        )

    writer = rows.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hist_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    cells_path: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> None:
    """Streaming histogram maintenance: the batch's partial fixed-edge
    cells land under their own ingest partition — additive merge, same
    contract as ``cms_apply_batch`` (the histogram is the second
    additively-mergeable sketch; KMV below needs union-re-rank
    instead)."""
    from pg2any_spark.operators.sketch import histogram_cells

    _recover_replica(cells_path)
    if batch_df.limit(1).count() == 0:
        return
    cells = histogram_cells(batch_df, value_col, lo, hi, bins)
    _overwrite_ingest_partition(
        cells.select(F.col("bucket").alias("cell"), "n"), cells_path, batch_id
    )


def read_hist_cells(spark: SparkSession, cells_path: str) -> DataFrame:
    """Accumulated histogram: cell-wise sum over ingest batches,
    reshaped for ``sketch.histogram_quantiles``."""
    flat = spark.read.parquet(cells_path)
    return (
        flat.groupBy("cell")
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.col("cell").cast("int").alias("bucket"), "n")
    )


def kmv_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    cells_path: str,
    key_col: str,
    group_cols: list[str],
    k: int = 128,
) -> None:
    """Streaming KMV maintenance: the batch's own k-minimum distinct
    hashes land under the batch partition. KMV merges by UNION then
    re-taking the k smallest (not by addition), so the read path —
    not the write path — owns the fold; per-batch state is still ≤ k
    rows per group and replays still rewrite identical partitions."""
    from pg2any_spark.operators.sketch import kmv_cells

    _recover_replica(cells_path)
    if batch_df.limit(1).count() == 0:
        return
    cells = kmv_cells(batch_df, key_col, group_cols, k)
    _overwrite_ingest_partition(cells, cells_path, batch_id)


def read_kmv_cells(
    spark: SparkSession, cells_path: str, group_cols: list[str], k: int = 128
) -> DataFrame:
    """Accumulated KMV sketch: distinct-union every batch's hash pool
    and re-take the k smallest per group — the KMV merge operation.
    Input is ≤ k × batches rows per group; output ≤ k, ready for
    ``sketch.kmv_distinct``."""
    from pyspark.sql import Window

    pool = (
        spark.read.parquet(cells_path)
        .select(*group_cols, "h")
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pool.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def bloom_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    cells_path: str,
    key_col: str,
    m_bits: int = 65_536,
    k: int = 4,
) -> None:
    """Streaming Bloom-filter maintenance: the batch's own set-bit
    table lands under the batch partition (same replay-idempotence
    contract as cms/hist/kmv — deterministic rows + own-partition
    overwrite). Bloom merges by UNION-DISTINCT of set bits, so like
    KMV the read path owns the fold; per-batch state is ≤ m rows."""
    from pg2any_spark.operators.sketch import bloom_cells

    _recover_replica(cells_path)
    if batch_df.limit(1).count() == 0:
        return
    cells = bloom_cells(batch_df, key_col, m_bits, k)
    _overwrite_ingest_partition(cells, cells_path, batch_id)


def read_bloom_cells(spark: SparkSession, cells_path: str) -> DataFrame:
    """Accumulated Bloom filter: distinct union of every batch's set
    bits — exactly the one-shot filter over everything ingested so
    far (set-union is the Bloom merge), ready for
    ``sketch.bloom_probe``."""
    return spark.read.parquet(cells_path).select("pos").distinct()


def start_streaming_bloom(
    rows: DataFrame,
    cells_path: str,
    checkpoint_dir: str,
    key_col: str = "key",
    available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """Continuously maintain a Bloom membership filter over an ingest
    stream — the streaming twin of a one-shot ``bloom_cells`` build
    (e.g. the train-set n-gram filter a decontamination screen probes,
    kept current as new training shards land). At any point
    ``read_bloom_cells`` + ``bloom_probe`` answer "was this key ever
    ingested" with no false negatives."""
    spark = rows.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        bloom_apply_batch(
            spark, batch_df, batch_id, cells_path, key_col, **kwargs
        )

    writer = rows.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: Base partition id for compacted dedup-index state: strictly below
#: every real micro-batch id, so the probe filter
#: ``ingest_batch < batch_id`` always includes it.
INGEST_BASE_PARTITION = -1


def compact_ingest_index(
    spark: SparkSession,
    index_path: str,
    committed_high_water: int | None = None,
) -> int:
    """Fold a streaming dedup index's accumulated per-batch partitions
    into one base partition (``ingest_batch=-1``).

    The per-batch layout exists for replay idempotence, but a
    long-running stream accretes one partition per micro-batch — the
    small-files problem, on directories this time. Folding into the
    base partition preserves probe semantics exactly: every live probe
    filters ``ingest_batch < batch_id`` and -1 is below every real
    batch id. Rows are ``distinct``-ed while folding (band/vector rows
    are deterministic, so any duplicates are replay artifacts, never
    information).

    ONLY COMMITTED batches are folded. The data partition for a batch
    lands BEFORE its checkpoint offset commits, so after a crash the
    newest partition may belong to a batch that will replay. If that
    partition were folded into the base, the replay's cross-probe
    (``ingest_batch < batch_id``) would see the batch's own band rows
    in the base and emit both orientations of its within-batch pairs —
    a superset of the original matches partition, breaking the
    "replays rewrite identical rows" contract. Pass
    ``committed_high_water`` (the last batch id known committed, from
    the checkpoint's offset log) to fold exactly the batches
    ``<= high_water``; without it the maintenance default folds
    everything EXCEPT the maximum batch id present — conservative and
    correct whether or not that batch committed.

    Run it with the stream STOPPED (maintenance window), like
    ``compact_replica``; the staged-rename swap keeps a crash
    mid-compaction from losing the original. Returns the folded row
    count. At 100 TB you fold ranges of batch ids on a schedule (and
    re-sort by band-key prefix for probe-scan pruning), never the
    world at once.
    """
    _recover_replica(index_path)
    df = spark.read.parquet(index_path)
    # legacy-tree migration: a pre-layout lexical index has no
    # band_pfx; deriving it here means the rewritten tree comes out in
    # the probe-pruned layout — compaction IS the upgrade path
    if "band_key" in df.columns and "band_pfx" not in df.columns:
        df = df.withColumn("band_pfx", band_pfx_expr())
    batch_ids = [
        r[0]
        for r in df.select(INGEST_BATCH_COL).distinct().collect()
        if r[0] != INGEST_BASE_PARTITION
    ]
    if committed_high_water is not None:
        foldable = lambda b: b <= committed_high_water  # noqa: E731
    else:
        newest = max(batch_ids, default=None)
        foldable = lambda b: b != newest  # noqa: E731
    keep_ids = [b for b in batch_ids if not foldable(b)]
    folded = (
        df.filter(~F.col(INGEST_BATCH_COL).isin(keep_ids))
        .withColumn(INGEST_BATCH_COL, F.lit(INGEST_BASE_PARTITION))
        .distinct()
        .unionByName(df.filter(F.col(INGEST_BATCH_COL).isin(keep_ids)))
        .persist()
    )
    try:
        n = folded.filter(
            F.col(INGEST_BATCH_COL) == INGEST_BASE_PARTITION
        ).count()
        staging = index_path + f".staging-{uuid.uuid4().hex[:8]}"
        (
            folded.write.mode("overwrite")
            # preserve the probe-prune layout (band_pfx / bucket): the
            # folded base keeps the same second partition level, so
            # pruned probes skip base directories exactly like batch
            # directories
            .partitionBy(*_ingest_partition_cols(folded))
            .parquet(staging)
        )
        _atomic_replace(staging, index_path)
    finally:
        folded.unpersist()
    return n


def mg_apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    cands_path: str,
    key_col: str,
    k: int,
) -> None:
    """Streaming heavy-hitter candidate maintenance: the batch's
    Misra-Gries summary keys (≤ (k−1)·partitions rows) land under the
    batch partition — same replay-idempotence contract as
    cms/hist/kmv/bloom (deterministic rows + own-partition overwrite).
    The pigeonhole superset argument holds across ANY partitioning of
    the stream into batches, so the union of per-batch candidates
    contains every key whose ALL-TIME count exceeds n/k."""
    from pg2any_spark.operators.sketch import misra_gries_candidates

    _recover_replica(cands_path)
    if batch_df.limit(1).count() == 0:
        return
    cands = misra_gries_candidates(batch_df, key_col, k)
    _overwrite_ingest_partition(cands, cands_path, batch_id)


def read_mg_candidates(spark: SparkSession, cands_path: str, key_col: str) -> DataFrame:
    """Accumulated heavy-hitter candidate set: distinct union of every
    batch's Misra-Gries keys (set-union is the candidate merge). Feed
    it to an exact recount to turn the superset into the exact
    answer."""
    return spark.read.parquet(cands_path).select(key_col).distinct()


def start_streaming_mg(
    rows: DataFrame,
    cands_path: str,
    checkpoint_dir: str,
    key_col: str = "key",
    k: int = 200,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain heavy-hitter CANDIDATES over an ingest
    stream — the streaming twin of ``sketch.misra_gries_candidates``
    (e.g. "which domains/tokens dominate the crawl so far", kept
    current as shards land). At any point ``read_mg_candidates`` +
    one exact recount over the corpus yield the exact heavy hitters;
    per-batch state is ≤ (k−1)·partitions keys, never the
    vocabulary."""
    spark = rows.sparkSession

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        mg_apply_batch(spark, batch_df, batch_id, cands_path, key_col, k)

    writer = rows.writeStream.foreachBatch(apply_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
