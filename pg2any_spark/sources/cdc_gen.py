"""Deterministic CDC change-event synthesis from fixture tables.

The driver fixtures have no CDC envelope table, so correctness checks
for the apply operator derive an event stream *deterministically* from
a base table. Because the derivation is pure SQL over the fixtures,
the post-apply table state is expressible as a DuckDB oracle query —
which is exactly what the driver's t2 gate needs.

Workload shape mirrors the reference's chaos scenarios
(``tests/chaos/scenarios/input/*.sql``): a wave of inserts, a wave of
updates over a predicate, a wave of deletes over a predicate — all
text-rendered values per the wire model (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg2any_spark.sources.fixtures import load_table

# LSN bands: inserts < updates < deletes, all strictly increasing.
_UPDATE_BASE = 10_000_000
_DELETE_BASE = 20_000_000

#: Update predicate: every third customer gets acctbal bumped by 1000.
UPDATE_MOD = 3
#: Delete predicate: every seventh customer is deleted (after updates).
DELETE_MOD = 7


def _text(col):
    """Text-render a column the way logical replication would."""
    return F.col(col).cast("string")


def synth_customer_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-all → update (custkey%3==0: acctbal+=1000) → delete (custkey%7==0).

    Returns a DataFrame in the CHANGE_EVENT_SCHEMA envelope. Final
    state oracle (ANSI SQL)::

        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END,
               c_mktsegment
        FROM customer WHERE c_custkey % 7 <> 0
    """
    cust = load_table(spark, "customer", sf_dir)
    cols = cust.columns
    after_full = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[_text(c) for c in cols]),
    )
    upd_after = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(
            *[
                (F.col("c_acctbal") + F.lit(1000.0)).cast("string")
                if c == "c_acctbal"
                else _text(c)
                for c in cols
            ]
        ),
    )
    # Default replica identity: before carries key columns only.
    key_map = F.create_map(F.lit("c_custkey"), _text("c_custkey"))
    null_map = F.lit(None).cast("map<string,string>")
    k = F.col("c_custkey")

    def mk(op, txid, lsn, before, after):
        return F.struct(
            F.lit(op).alias("op"),
            txid.cast("long").alias("txid"),
            lsn.cast("long").alias("lsn"),
            before.alias("before"),
            after.alias("after"),
        )

    # ONE customer scan: each row explodes into its 1-3 events (insert
    # always; update/delete per predicate). A/B vs the 3-branch union
    # (scripts/ab_cdc_synth.py, sf0.1, medians): explode 1.13s vs union
    # 1.20s — explode wins here because the update/delete branches
    # carry cheap key-only maps. Contrast synth_orders_events, where
    # FULL identity makes the union form the winner.
    events = F.array(
        mk("c", k % 1000, k, null_map, after_full),
        F.when(k % UPDATE_MOD == 0, mk("u", F.lit(2000), k + _UPDATE_BASE, key_map, upd_after)),
        F.when(k % DELETE_MOD == 0, mk("d", F.lit(3000), k + _DELETE_BASE, key_map, null_map)),
    )
    e = cust.select(F.explode(F.filter(events, lambda x: x.isNotNull())).alias("e"))
    return e.select(
        F.col("e.op").alias("op"),
        F.lit("public").alias("schema"),
        F.lit("customer").alias("table"),
        F.col("e.txid").alias("txid"),
        F.col("e.lsn").alias("lsn"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("commit_ts"),
        F.col("e.before").alias("before"),
        F.col("e.after").alias("after"),
        F.array(F.lit("c_custkey")).alias("key_columns"),
        F.lit("default").alias("replica_identity"),
    )


def synth_truncate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-all → TRUNCATE → re-insert custkey%5==0.

    Exercises the truncate barrier (reference ``sql_renderer.rs:300-320``;
    multi-table truncate semantics collapse to per-table events here).
    Final-state oracle: ``SELECT … FROM customer WHERE c_custkey % 5 = 0``.
    """
    cust = load_table(spark, "customer", sf_dir)
    after_full = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cust.columns]),
        F.array(*[_text(c) for c in cust.columns]),
    )
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00"))

    def base_cols(op, lsn_col, before, after, txid):
        return [
            F.lit(op).alias("op"),
            F.lit("public").alias("schema"),
            F.lit("customer").alias("table"),
            F.lit(txid).cast("long").alias("txid"),
            lsn_col.cast("long").alias("lsn"),
            ts.alias("commit_ts"),
            before.alias("before"),
            after.alias("after"),
            F.array(F.lit("c_custkey")).alias("key_columns"),
            F.lit("default").alias("replica_identity"),
        ]

    null_map = F.lit(None).cast("map<string,string>")
    inserts = cust.select(*base_cols("c", F.col("c_custkey"), null_map, after_full, 1))
    trunc = cust.limit(1).select(
        *base_cols("t", F.lit(_UPDATE_BASE), null_map, null_map, 2)
    )
    reinserts = cust.filter(F.col("c_custkey") % 5 == 0).select(
        *base_cols("c", F.col("c_custkey") + _DELETE_BASE, null_map, after_full, 3)
    )
    return inserts.unionByName(trunc).unionByName(reinserts)


def synth_streaming_tx_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved streaming-transaction chunks (protocol v2 shape,
    reference ``producer.rs:199-300``):

    - tx 100 (COMMITTED, commit_lsn 50M): insert every customer, split
      into chunks with StreamStart/StreamStop markers;
    - tx 200 (ABORTED): update acctbal += 9999 for every even custkey —
      must leave no trace;
    - tx 300 (COMMITTED, commit_lsn 60M): update acctbal += 500 for
      custkey%10==0.

    Post-reassembly + apply oracle::

        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 500
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
    """
    cust = load_table(spark, "customer", sf_dir)
    after_full = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cust.columns]),
        F.array(*[_text(c) for c in cust.columns]),
    )
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    null_map = F.lit(None).cast("map<string,string>")

    def envelope(src, op, txid, lsn_col, before, after):
        return src.select(
            F.lit(op).alias("op"),
            F.lit("public").alias("schema"),
            F.lit("customer").alias("table"),
            F.lit(txid).cast("long").alias("txid"),
            lsn_col.cast("long").alias("lsn"),
            ts.alias("commit_ts"),
            before.alias("before"),
            after.alias("after"),
            F.array(F.lit("c_custkey")).alias("key_columns"),
            F.lit("default").alias("replica_identity"),
        )

    one = cust.limit(1)
    # tx 100: chunked inserts of every customer.
    tx100_dml = envelope(cust, "c", 100, F.col("c_custkey"), null_map, after_full)
    tx100_marks = (
        envelope(one, "ss", 100, F.lit(0), null_map, null_map)
        .unionByName(envelope(one, "sp", 100, F.lit(1_000_000), null_map, null_map))
        .unionByName(envelope(one, "sc", 100, F.lit(50_000_000), null_map, null_map))
    )
    # tx 200: aborted blanket update of even custkeys.
    upd_abort = cust.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 9999.0
    )
    tx200_dml = envelope(
        upd_abort, "u", 200, F.col("c_custkey") + _UPDATE_BASE,
        F.create_map(F.lit("c_custkey"), _text("c_custkey")), after_full,
    )
    tx200_marks = envelope(one, "sa", 200, F.lit(55_000_000), null_map, null_map)
    # tx 300: committed +500 update of custkey%10==0.
    upd_commit = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 500.0
    )
    tx300_dml = envelope(
        upd_commit, "u", 300, F.col("c_custkey") + _UPDATE_BASE,
        F.create_map(F.lit("c_custkey"), _text("c_custkey")), after_full,
    )
    tx300_marks = envelope(one, "sc", 300, F.lit(60_000_000), null_map, null_map)

    return (
        tx100_dml.unionByName(tx100_marks)
        .unionByName(tx200_dml).unionByName(tx200_marks)
        .unionByName(tx300_dml).unionByName(tx300_marks)
    )


def synth_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-all orders → FULL-identity deletes of orderkey%4==1.

    FULL replica identity: the delete's ``before`` carries the complete
    old row (reference ``sql_renderer.rs:353-369`` builds the WHERE from
    every old column, with IS NULL handling).
    Oracle: ``SELECT … FROM orders WHERE o_orderkey % 4 <> 1``.
    """
    orders = load_table(spark, "orders", sf_dir)
    full_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c in orders.columns]),
        F.array(*[_text(c) for c in orders.columns]),
    )
    null_map = F.lit(None).cast("map<string,string>")
    k = F.col("o_orderkey")

    def envelope(src, op, txid, lsn_col, before, after):
        return src.select(
            F.lit(op).alias("op"),
            F.lit("public").alias("schema"),
            F.lit("orders").alias("table"),
            F.lit(txid).cast("long").alias("txid"),
            lsn_col.cast("long").alias("lsn"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("commit_ts"),
            before.alias("before"),
            after.alias("after"),
            F.array(F.lit("o_orderkey")).alias("key_columns"),
            F.lit("full").alias("replica_identity"),
        )

    # 2-branch union, NOT the single-scan explode form: FULL identity
    # means the wide row-map appears in BOTH the insert's after and the
    # delete's before, so the explode array materializes it twice per
    # row; the union computes it 1.25× per row (all inserts + 25%
    # deletes) and measured ~33% faster end-to-end through apply at
    # sf0.1 (scripts/ab_cdc_synth.py, numbers in SCALE.md). The
    # customer synthesis keeps the explode form — its extra branches
    # carry cheap key-only maps, and explode wins there.
    inserts = envelope(orders, "c", 10, k, null_map, full_map)
    deletes = envelope(
        orders.filter(k % 4 == 1), "d", 11, k + _DELETE_BASE, full_map, null_map
    )
    return inserts.unionByName(deletes)


def synth_paired_neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus with CONSISTENT text and embedding near-duplicates — the
    ground truth for comparing lexical (MinHash) and semantic
    (embedding-cosine) dedup. Each variant plants a known relationship:

    - ``both`` (slot 1, doc_id%2==0): first-two-words-dropped text
      (lexically near) + 0.5-scaled embedding (cosine exactly 1) —
      both detectors should agree;
    - ``semantic_only`` (slot 2, doc_id%4==1): token-REVERSED text
      (3-gram shingle sets disjoint) + 0.25-scaled embedding — the
      paraphrase case lexical dedup misses;
    - ``lexical_only`` (slot 3, doc_id%4==3): near-dup text + NEGATED
      embedding (cosine exactly -1) — surface-similar, semantically
      opposite.

    Corpus ids are ``doc_id * 4 + slot`` (slot 0 = original), so
    originals and variants are disjoint at ANY corpus size — no
    fixed-offset scheme that collides past 100k documents — and every
    row carries ``orig_id`` explicitly so downstream never decodes
    ids. All transforms are deterministic and closed-form, so a
    DuckDB oracle can re-derive both detectors' verdicts exactly.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    base = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", dbl.alias("embedding")
    )
    drop2 = F.regexp_replace("text", r"^\s*\S+\s+\S+\s+", "")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    reversed_text = F.concat_ws(" ", F.reverse(toks))

    # One pass: each base row emits its original plus the variants its
    # doc_id selects, as an explode of a ≤4-entry struct array. The
    # former 4-way unionByName re-ran the docs⋈embeddings join once
    # per branch — and every downstream traversal multiplied that
    # (the agreement query's three consumers scanned embeddings 8×).
    # Same multiset of rows, same per-branch expressions.
    def variant(pred, slot, name, text_col, emb_fn):
        return F.when(
            pred,
            F.struct(
                (F.col("doc_id") * 4 + slot).alias("id"),
                F.col("doc_id").alias("orig_id"),
                F.lit(name).alias("variant"),
                text_col.alias("text"),
                F.transform("embedding", emb_fn).alias("embedding"),
            ),
        )

    orig = F.struct(
        (F.col("doc_id") * 4).alias("id"),
        F.col("doc_id").alias("orig_id"),
        F.lit("orig").alias("variant"),
        F.col("text"),
        F.col("embedding"),
    )
    rows = F.array(
        orig,
        variant(F.col("doc_id") % 2 == 0, 1, "both", drop2,
                lambda x: x * 0.5),
        variant(F.col("doc_id") % 4 == 1, 2, "semantic_only",
                reversed_text, lambda x: x * 0.25),
        variant(F.col("doc_id") % 4 == 3, 3, "lexical_only", drop2,
                lambda x: -x),
    )
    return (
        base.select(
            F.explode(F.filter(rows, lambda r: r.isNotNull())).alias("e")
        ).select("e.id", "e.orig_id", "e.variant", "e.text", "e.embedding")
    )
