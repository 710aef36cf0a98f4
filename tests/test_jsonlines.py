"""Event-mode JSON-lines IR: write → read round trip, corrupt-line
hard error (reference ``transaction_manager.rs:599-613,1792-1801``)."""

from __future__ import annotations

import glob
import os

import pytest

from pg2any_spark.operators.apply import apply_changes
from pg2any_spark.sources.cdc_gen import synth_customer_events
from pg2any_spark.sources.fixtures import load_table
from pg2any_spark.sources.jsonlines import read_events_jsonl, write_events_jsonl


def test_roundtrip_preserves_apply_state(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_jsonl")
    events = synth_customer_events(spark, sf_dir)
    write_events_jsonl(events, path)
    back = read_events_jsonl(spark, path)

    cust = load_table(spark, "customer", sf_dir)
    direct = apply_changes(
        events, cust.schema, ["c_custkey"], table="customer", scan_for_truncate=False
    )
    via_jsonl = apply_changes(
        back, cust.schema, ["c_custkey"], table="customer", scan_for_truncate=False
    )
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, via_jsonl.collect()))
    assert a == b and len(a) > 0


def test_null_images_written_explicitly(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_nulls")
    events = synth_customer_events(spark, sf_dir).filter("op = 'c'").limit(5)
    write_events_jsonl(events, path)
    lines = []
    for f in glob.glob(os.path.join(path, "part-*.json")):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert lines and all('"before":null' in ln for ln in lines)


def test_corrupt_line_hard_errors(spark, tmp_path):
    path = str(tmp_path / "events_corrupt")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.json"), "w") as fh:
        fh.write(
            '{"op":"c","schema":"public","table":"t1","txid":1,"lsn":1,'
            '"commit_ts":"2026-01-01T00:00:00.000Z","before":null,'
            '"after":{"id":"1"},"key_columns":["id"],"replica_identity":"default"}\n'
        )
        fh.write("{this is not json\n")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_events_jsonl(spark, path).collect()


class TestCompression:
    """PG2ANY_ENABLE_COMPRESSION parity: gzip'd event IR round-trips
    bit-identically through batch, streaming, and quarantine readers
    (the reference's CI matrix runs every suite compression on/off —
    compressed_file semantics live in storage/compressed.rs)."""

    def test_gzip_roundtrip_equals_uncompressed(self, spark, sf_dir, tmp_path):
        import glob

        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.jsonlines import (
            read_events_jsonl,
            write_events_jsonl,
        )

        events = synth_customer_events(spark, sf_dir).limit(50)
        plain, gz = str(tmp_path / "plain"), str(tmp_path / "gz")
        write_events_jsonl(events, plain)
        write_events_jsonl(events, gz, compression=True)
        assert glob.glob(f"{gz}/*.json.gz"), "gzip parts expected"
        assert not glob.glob(f"{gz}/*[0-9].json"), "no plain parts"
        # map-typed columns (before/after) bar exceptAll — compare the
        # serialized row multisets instead
        def rows(df):
            from pyspark.sql import functions as F

            return sorted(
                r[0] for r in df.select(F.to_json(F.struct("*"))).collect()
            )

        a = rows(read_events_jsonl(spark, plain))
        b = rows(read_events_jsonl(spark, gz))
        assert a == b and len(a) == 50

    def test_config_flag_parses(self):
        from pg2any_spark.config import load_config_from_env as load_config

        env = {
            "CDC_SOURCE_CONNECTION_STRING": "postgres://x",
            "CDC_DEST_TYPE": "SQLite",
            "CDC_DEST_URI": "./t.db",
        }
        assert load_config(env).enable_compression is False
        assert load_config(
            {**env, "PG2ANY_ENABLE_COMPRESSION": "true"}
        ).enable_compression is True
        assert load_config(
            {**env, "PG2ANY_ENABLE_COMPRESSION": "1"}
        ).enable_compression is True
        assert load_config(
            {**env, "PG2ANY_ENABLE_COMPRESSION": "false"}
        ).enable_compression is False

    def test_env_var_changes_bytes_end_to_end(self, spark, sf_dir, tmp_path):
        """PG2ANY_ENABLE_COMPRESSION=true → the configured writer
        produces .json.gz parts; unset → plain .json. The env var must
        have an observable effect through the config-owning entry
        point (write_events_ir), not just parse into a dead field."""
        import glob

        from pg2any_spark.config import load_config_from_env as load_config
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.jsonlines import (
            read_events_jsonl,
            write_events_ir,
        )

        env = {
            "CDC_SOURCE_CONNECTION_STRING": "postgres://x",
            "CDC_DEST_TYPE": "SQLite",
            "CDC_DEST_URI": "./t.db",
        }
        events = synth_customer_events(spark, sf_dir).limit(20)
        on, off = str(tmp_path / "on"), str(tmp_path / "off")
        write_events_ir(
            events, on, load_config({**env, "PG2ANY_ENABLE_COMPRESSION": "true"})
        )
        write_events_ir(events, off, load_config(env))
        assert glob.glob(f"{on}/*.json.gz"), "env var on → gzip parts"
        assert not glob.glob(f"{off}/*.json.gz"), "env var off → plain parts"
        assert read_events_jsonl(spark, on).count() == 20

    def test_quarantine_reader_handles_gzip(self, spark, tmp_path):
        import gzip
        import os

        from pg2any_spark.sources.jsonlines import (
            read_events_jsonl_quarantine,
        )

        p = str(tmp_path / "gzfeed")
        os.makedirs(p)
        good = (
            '{"op": "c", "schema": "public", "table": "t1", "txid": 7,'
            ' "lsn": 42, "commit_ts": "2024-01-01T00:00:00.000Z"}'
        )
        with gzip.open(f"{p}/feed.json.gz", "wt") as f:
            f.write(good + "\n")
            f.write("not json at all\n")
        q = str(tmp_path / "gzdlq")
        clean = read_events_jsonl_quarantine(spark, p, q)
        assert [r["lsn"] for r in clean.collect()] == [42]
        dlq = spark.read.json(q).collect()
        assert len(dlq) == 1 and dlq[0]["reason"] == "malformed_json"


class TestQuarantine:
    def _write_feed(self, spark, tmp_path):
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.jsonlines import write_events_jsonl

        good = synth_customer_events(spark, "/root/testdata/sf0.001").limit(20)
        p = str(tmp_path / "feed")
        write_events_jsonl(good, p)
        # plant damage: one malformed JSON line, one well-formed object
        # that matches no schema field
        with open(f"{p}/damaged.json", "w") as f:
            f.write('{"op": "c", "table": "customer", truncated-garbage\n')
            f.write('{"utterly": "unrelated", "shape": 1}\n')
        return p, good.count()

    def test_clean_rows_survive_and_bad_rows_divert(self, spark, tmp_path):
        from pg2any_spark.sources.jsonlines import (
            read_events_jsonl_quarantine,
        )

        p, n_good = self._write_feed(spark, tmp_path)
        q = str(tmp_path / "dlq")
        clean = read_events_jsonl_quarantine(spark, p, q)
        assert clean.count() == n_good
        assert set(clean.columns) == {
            f.name for f in __import__(
                "pg2any_spark.schemas", fromlist=["CHANGE_EVENT_SCHEMA"]
            ).CHANGE_EVENT_SCHEMA.fields
        }
        dlq = spark.read.json(q)
        got = {(r["reason"], r["raw_line"]) for r in dlq.collect()}
        # poison lines land VERBATIM — the audit trail must carry the
        # original evidence, not a re-serialization
        assert got == {
            ("malformed_json",
             '{"op": "c", "table": "customer", truncated-garbage'),
            ("schema_mismatch", '{"utterly": "unrelated", "shape": 1}'),
        }
        # a retried read overwrites the per-feed DLQ, never doubles it
        read_events_jsonl_quarantine(spark, p, q).count()
        assert spark.read.json(q).count() == 2

    def test_envelope_gate_catches_field_name_collisions(
        self, spark, tmp_path
    ):
        """A junk object sharing ONE schema field name must land in
        the DLQ as schema_mismatch (the round-6 advice gap: it used to
        pass as clean with all-null remaining columns), while a
        legitimate event whose NULLABLE fields are all explicitly null
        must stay clean."""
        from pg2any_spark.sources.jsonlines import (
            read_events_jsonl_quarantine,
        )

        p = str(tmp_path / "feed2")
        import os

        os.makedirs(p)
        legit_all_nullable_null = (
            '{"op": "c", "schema": "public", "table": "t1", "txid": 7,'
            ' "lsn": 42, "commit_ts": "2024-01-01T00:00:00.000Z",'
            ' "before": null, "after": null, "key_columns": null,'
            ' "replica_identity": null}'
        )
        with open(f"{p}/feed.json", "w") as f:
            f.write('{"op": "zzz"}\n')                      # junk op
            f.write('{"op": "c", "table": "t1"}\n')         # missing lsn
            f.write(legit_all_nullable_null + "\n")
        q = str(tmp_path / "dlq2")
        clean = read_events_jsonl_quarantine(spark, p, q)
        rows = clean.collect()
        assert len(rows) == 1 and rows[0]["lsn"] == 42
        dlq = {r["raw_line"]: r["reason"] for r in spark.read.json(q).collect()}
        assert dlq == {
            '{"op": "zzz"}': "schema_mismatch",
            '{"op": "c", "table": "t1"}': "schema_mismatch",
        }

    def test_failfast_reader_still_fatal(self, spark, tmp_path):
        import pytest as _pt

        from pg2any_spark.sources.jsonlines import read_events_jsonl

        p, _ = self._write_feed(spark, tmp_path)
        with _pt.raises(Exception):
            read_events_jsonl(spark, p).count()
