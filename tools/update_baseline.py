#!/usr/bin/env python3
"""Append newly-benched queries to BASELINE_QUERIES.json.

The ledger records each bench query's FIRST driver-recorded seconds
(and the round). Existing entries are never overwritten -- the ledger
is the fixed reference the >2x drift rule compares against. Run after
a round's BENCH_r{N}.json lands:

    python3 tools/update_baseline.py BENCH_r12.json 12

Accepts either the driver artifact (wrapper with a "tail" string
containing Bench's JSON line) or Bench's raw JSON line itself.
"""
import json
import re
import sys

META = {"metric", "value", "n", "rc", "cpus", "sf", "failed", "total",
        "calibration_sec", "calibration_ref"}


def timings_from(path):
    with open(path) as f:
        raw = f.read()
    # tolerate log prefixes (e.g. sbt's "[info] ") before the JSON line
    doc = json.loads(raw[raw.index("{"):])
    text = doc.get("tail", "") if isinstance(doc, dict) and "tail" in doc else json.dumps(doc)
    # per-name min across the queries/retimed spans of the line
    out = {}
    for m in re.finditer(r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)(?=\s*[,}])', text):
        name, val = m.group(1), float(m.group(2))
        if name in META or val < 0:
            continue
        out[name] = min(out.get(name, float("inf")), val)
    return out


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    bench_path, rnd = sys.argv[1], int(sys.argv[2])
    with open("BASELINE_QUERIES.json") as f:
        ledger = json.load(f)
    added = 0
    for name, sec in sorted(timings_from(bench_path).items()):
        if name not in ledger:
            ledger[name] = {"sec": round(sec, 4), "round": rnd}
            added += 1
            print(f"+ {name}: {sec:.3f}s (r{rnd})")
    with open("BASELINE_QUERIES.json", "w") as f:
        json.dump({k: ledger[k] for k in sorted(ledger)}, f, indent=1)
    print(f"{added} appended, {len(ledger)} total")


if __name__ == "__main__":
    main()
