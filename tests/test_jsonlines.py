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
