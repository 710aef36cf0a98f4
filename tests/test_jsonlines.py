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
