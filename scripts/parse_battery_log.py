#!/usr/bin/env python
"""Parse a ``check_oracle.py`` stdout log into a CORRECTNESS-style
JSON artifact (used for the 10x full-registry battery, whose runtime
makes the plain log the natural capture format).

Usage: python scripts/parse_battery_log.py <log> <out.json> [fixture]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log_path, out_path = sys.argv[1], sys.argv[2]
    fixture = sys.argv[3] if len(sys.argv) > 3 else None
    text = open(log_path, errors="replace").read()
    results: dict[str, dict] = {}
    # Detail may itself contain '[' (oracle error text); the timing
    # suffix is anchored at end-of-line instead of forbidding '[' in
    # the capture, so failure messages are not silently truncated.
    for m in re.finditer(
        r"(✓|✗|~) ([a-z0-9_]+): (.*?)\s*\[([0-9.]+)s\]\s*$",
        text,
        re.MULTILINE,
    ):
        mark, name, detail, secs = m.groups()
        detail = detail.strip()
        if mark in ("✓", "~"):
            rows_m = re.search(r"rows=(\d+)", detail)
            if rows_m is None:
                # A ✓/~ line without a rows= token is a log-format
                # drift; record it as a parse failure rather than
                # crashing the battery post-processing.
                results[name] = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "seconds": float(secs),
                    "err": f"battery-log parse: no rows= in {detail[:160]!r}",
                }
                continue
            rows = int(rows_m.group(1))
        if mark == "✓":
            results[name] = {
                "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": rows,
                "oracle_rows": rows, "seconds": float(secs), "err": None,
            }
        elif mark == "~":
            results[name] = {
                "rows_match": rows > 0, "schema_match": None,
                "hash_match": None, "spark_rows": rows,
                "oracle_rows": None, "seconds": float(secs),
                "err": "rows-only (no oracle)",
            }
        else:
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "seconds": float(secs),
                "err": detail[:200],
            }
    full = [n for n, r in results.items() if r.get("hash_match")]
    out = {
        "fixture": fixture,
        "n_checked": len(results),
        "n_full_pass": len(full),
        "failures": {
            n: r["err"] for n, r in results.items()
            if r["err"] and not r["err"].startswith("rows-only")
        },
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"{out_path}: {len(results)} checked, {len(full)} full-pass, "
        f"{len(out['failures'])} failures"
    )


if __name__ == "__main__":
    main()
