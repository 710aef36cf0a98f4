"""Regenerate the ``LAST_GREEN`` staleness map in ``__spark_entry__.py``.

Reads every ``CORRECTNESS_r0N.json`` artifact in the repo root and, for
each query, records the LATEST round in which the driver gave it a
full-pass row (rows+schema+hash all true).  Rewrites the
``LAST_GREEN = {...}`` block in place, grouped by round with per-round
counts, preserving everything around it.

Run once per round, right after the driver drops ``CORRECTNESS_r0N.json``:

    python scripts/regen_last_green.py

The window contract in ``__spark_entry__.py`` (never-checked first,
then stalest greens, PARKED last) depends on this map being current.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(ROOT, "__spark_entry__.py")


def collect_last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, res in rows.items():
            if (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def render_block(last: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)
    lines = ["LAST_GREEN = {"]
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        lines.append(
            f"    # last driver-green in round {rnd} ({len(names)} queries)"
        )
        row = "    "
        for name in names:
            piece = f'"{name}": {rnd}, '
            if len(row) + len(piece) > 76:
                lines.append(row.rstrip())
                row = "    "
            row += piece
        lines.append(row.rstrip())
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    last = collect_last_green()
    src = open(ENTRY).read()
    block = render_block(last)
    new_src, n = re.subn(r"LAST_GREEN = \{.*?\n\}", block, src, count=1, flags=re.S)
    if n != 1:
        sys.exit("LAST_GREEN block not found in __spark_entry__.py")
    with open(ENTRY, "w") as f:
        f.write(new_src)
    from collections import Counter

    counts = sorted(Counter(last.values()).items())
    print(f"LAST_GREEN regenerated: {len(last)} greens; per-round {counts}")


if __name__ == "__main__":
    main()
