"""Canonical schemas: the CDC change-event envelope and fixture tables.

The envelope mirrors the reference's ``EventType`` payloads
(reference ``pg2any-lib/src/producer.rs:139-343``) with the Kafka op
codes ``c/u/d/t`` the reference itself emits
(``destinations/kafka.rs:573,625,671,700``). Values inside
``before``/``after`` are **text-rendered** strings (booleans ``t``/``f``,
bytea as hex), matching the reference's three-variant ``ColumnValue``
wire model (SURVEY §1.2): PostgreSQL logical replication ships column
values as text, and type semantics apply lazily at the destination.
Keeping the payload as MAP<STRING,STRING> means schema drift never
breaks the pipeline — the same property the reference has.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Op codes, identical to the reference's Kafka envelope.
OP_INSERT = "c"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_TRUNCATE = "t"

#: Streaming-transaction protocol markers (reference protocol v2:
#: ``EventType::{StreamStart, StreamStop, StreamCommit, StreamAbort}``,
#: ``producer.rs:199-300``). Chunks of large in-progress transactions
#: arrive interleaved across txids between start/stop markers; commit
#: finalizes, abort discards. DML op codes above stay unchanged.
OP_STREAM_START = "ss"
OP_STREAM_STOP = "sp"
OP_STREAM_COMMIT = "sc"
OP_STREAM_ABORT = "sa"

#: All DML ops (what reassembly forwards on commit).
DML_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE, OP_TRUNCATE)

#: Sentinel carried in the text envelope for an UPDATE column whose
#: value was NOT sent because it is unchanged TOASTed data (pgoutput
#: tuple kind 'u'). PostgreSQL text values cannot contain NUL bytes, so
#: the sentinel is collision-free by construction. The apply resolves
#: it with merge-with-stored-row semantics (``operators.apply``,
#: ``toast_merge=True``) — mirroring the reference, whose UPDATE SET
#: only renders the columns it actually has (``sql_renderer.rs:205-234``).
UNCHANGED_TOAST = "\x00unchanged-toast\x00"

#: Replica identity modes (reference ``sql_renderer.rs:331-375``).
IDENTITY_DEFAULT = "default"
IDENTITY_INDEX = "index"
IDENTITY_FULL = "full"
IDENTITY_NOTHING = "nothing"

#: The CDC change-event envelope (SURVEY §1.2 / FIXTURES.md §2).
CHANGE_EVENT_SCHEMA = StructType(
    [
        StructField("op", StringType(), False),  # 'c','u','d','t'
        StructField("schema", StringType(), False),  # e.g. 'public'
        StructField("table", StringType(), False),
        StructField("txid", LongType(), False),
        StructField("lsn", LongType(), False),  # total order / replay key
        StructField("commit_ts", TimestampType(), False),
        StructField("before", MapType(StringType(), StringType()), True),
        StructField("after", MapType(StringType(), StringType()), True),
        StructField("key_columns", ArrayType(StringType()), True),
        StructField("replica_identity", StringType(), True),
    ]
)

#: The reference's universal test table ``t1``
#: (``examples/scripts/init_postgres.sql:1-28``).
T1_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("val", IntegerType(), False),
        StructField("col1", StringType(), False),  # uuid as 36-char string
        StructField("col2", StringType(), False),
    ]
)

#: Multimodal asset table: opaque binary payload + typed metadata
#: (beyond-reference surface; decode is a stub, plumbing is real).
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("codec", StringType(), True),
    ]
)

#: Driver fixture tables at /root/testdata/sf*/ (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)
