"""Streaming-transaction reassembly (reference protocol v2).

The reference consumes large in-progress transactions as interleaved
chunks: ``StreamStart{txid}`` … DML … ``StreamStop`` repeats per
chunk, across multiple concurrent txids; ``StreamCommit{txid}``
finalizes the transaction (its events become applicable, stamped with
the commit LSN/timestamp) and ``StreamAbort{txid}`` discards
everything buffered (reference ``producer.rs:199-300``, marker types
``types.rs:42-50``; buffering is the per-txid transaction file keyed
by txid in ``transaction_manager.rs``).

Two Spark-native forms:

- **Batch** (`reassemble_committed`): an inner join of DML events with
  the commit markers on txid. Aborted and still-open transactions drop
  out by absence of a commit marker; each surviving event is stamped
  with its transaction's ``commit_lsn``/``commit_ts``. The commit-
  marker side is one row per transaction — orders of magnitude smaller
  than the event stream — so AQE turns the join into a broadcast hash
  join; no shuffle of the DML side.
- **Streaming** (`reassemble_stream`): `applyInPandasWithState` keyed
  by txid. State buffers the chunks; a commit marker flushes them
  downstream, an abort clears state, and a processing-time timeout
  evicts abandoned transactions (the reference's crash-cleanup of
  ``sql_received_tx/``, ``client.rs:239-259``).

Ordering downstream: the replay order of a reassembled stream is
``(commit_lsn, lsn)`` — transactions in commit order (reference O1's
heap ordering, ``consumer.rs:42-78``), events inside a transaction in
write order. ``apply_changes(order_cols=["commit_lsn", "lsn"])``
consumes exactly that.
"""

from __future__ import annotations

import pickle
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from pg2any_spark.schemas import (
    CHANGE_EVENT_SCHEMA,
    DML_OPS,
    OP_STREAM_ABORT,
    OP_STREAM_COMMIT,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Reassembled-event schema: the envelope plus the transaction's commit
#: LSN (the primary replay-order key).
REASSEMBLED_SCHEMA = StructType(
    CHANGE_EVENT_SCHEMA.fields + [StructField("commit_lsn", LongType(), True)]
)

#: Keyed state: pickled list of buffered chunk DataFrames.
_STATE_SCHEMA = StructType([StructField("buf", BinaryType(), True)])


def reassemble_committed(events: DataFrame) -> DataFrame:
    """Batch reassembly: keep DML of committed transactions only.

    Equivalent SQL (the oracle shape)::

        SELECT e.*, c.lsn AS commit_lsn, c.commit_ts
        FROM events e
        JOIN (SELECT txid, MAX(lsn) AS lsn, MAX(commit_ts) AS commit_ts
              FROM events WHERE op = 'sc' GROUP BY txid) c USING (txid)
        WHERE e.op IN ('c','u','d','t')
    """
    commits = (
        events.filter(F.col("op") == OP_STREAM_COMMIT)
        .groupBy("txid")
        .agg(
            F.max("lsn").alias("commit_lsn"),
            F.max("commit_ts").alias("__commit_ts"),
        )
    )
    dml = events.filter(F.col("op").isin(*DML_OPS))
    cols = [c for c in events.columns if c != "commit_ts"]
    return (
        dml.join(commits, "txid")
        .select(*cols, F.col("__commit_ts").alias("commit_ts"), "commit_lsn")
        .select(*events.columns, "commit_lsn")
    )


def _reassemble_group(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any
) -> Iterator["pd.DataFrame"]:
    """Per-txid stateful reassembly body (see `reassemble_stream`)."""
    import pandas as pd

    if state.hasTimedOut:
        # Abandoned transaction (no commit/abort ever arrived): drop the
        # buffer — the reference's startup cleanup of uncommitted
        # transaction files does the same.
        state.remove()
        return

    chunks: list[pd.DataFrame] = (
        pickle.loads(state.get[0]) if state.exists else []
    )
    commit_row = None
    aborted = False
    for pdf in pdfs:
        dml = pdf[pdf["op"].isin(list(DML_OPS))]
        if len(dml):
            chunks.append(dml)
        commits = pdf[pdf["op"] == OP_STREAM_COMMIT]
        if len(commits):
            commit_row = commits.iloc[commits["lsn"].values.argmax()]
        if (pdf["op"] == OP_STREAM_ABORT).any():
            aborted = True

    if aborted:
        state.remove()
        return
    if commit_row is not None:
        state.remove()
        if chunks:
            out = pd.concat(chunks, ignore_index=True)
            out["commit_ts"] = commit_row["commit_ts"]
            out["commit_lsn"] = commit_row["lsn"]
            yield out
        return

    state.update((pickle.dumps(chunks),))
    # Evict transactions that never finalize (crash on the source side).
    state.setTimeoutDuration(24 * 3600 * 1000)


def reassemble_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming reassembly keyed by txid.

    Works on a streaming DataFrame in CHANGE_EVENT_SCHEMA; emits
    REASSEMBLED_SCHEMA rows when a transaction's commit marker arrives.
    State is one buffered chunk list per *open* transaction — bounded
    by the number of concurrently streaming transactions, not by
    history (committed/aborted state is removed immediately).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("txid").applyInPandasWithState(
        _reassemble_group,
        outputStructType=REASSEMBLED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
