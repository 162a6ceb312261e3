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


def rebaseline(argv):
    """Re-baseline an EXISTING ledger entry. Precedented by the r14
    agg_approx_users adjudication; this path enforces the procedure so
    it can't become self-serving. Required:
      (a) >=5 idle re-measurements, recorded in the entry ("idle"),
          and the new sec must be their min (measure, don't negotiate);
      (b) a non-empty "note" naming EITHER the semantic change to the
          query since the first recording OR the idle-reproduction
          evidence that the original entry priced a different cost.

    Usage: update_baseline.py --rebaseline <name> <round> \\
               --idle s1,s2,s3,s4,s5[,...] --note "why"
    """
    if len(argv) < 6 or "--idle" not in argv or "--note" not in argv:
        sys.exit(rebaseline.__doc__)
    name, rnd = argv[0], int(argv[1])
    idle = [float(x) for x in argv[argv.index("--idle") + 1].split(",")]
    note = argv[argv.index("--note") + 1].strip()
    if len(idle) < 5:
        sys.exit(f"rebaseline requires >=5 idle measurements, got {len(idle)}")
    if not note:
        sys.exit("rebaseline requires a non-empty --note")
    with open("BASELINE_QUERIES.json") as f:
        ledger = json.load(f)
    if name not in ledger:
        sys.exit(f"{name} not in ledger — use the append path for new queries")
    old = ledger[name]
    # keep the PRE-adjudication baseline alongside the new one: the
    # gate's history survives the re-baseline, and Bench emits a
    # vs_prev audit column from it. Chained re-baselines preserve the
    # ORIGINAL first recording, not the previous hop. (Notes are
    # stored verbatim — Bench parses the ledger as real JSON since
    # r17, so braces in notes corrupt nothing.)
    # sec and idle round to the SAME precision so sec always equals
    # min(idle) as displayed (r16 advisor: round-4 sec could sit below
    # the round-3 idle min, confusing the audit trail).
    ledger[name] = {"sec": round(min(idle), 3), "round": rnd,
                    "note": note, "idle": [round(x, 3) for x in idle],
                    "prev_sec": old.get("prev_sec", old["sec"]),
                    "prev_round": old.get("prev_round", old["round"])}
    with open("BASELINE_QUERIES.json", "w") as f:
        json.dump({k: ledger[k] for k in sorted(ledger)}, f, indent=1)
    print(f"~ {name}: {old['sec']}s (r{old['round']}) -> "
          f"{ledger[name]['sec']}s (r{rnd}): {note}")


def record_idle(argv):
    """Record idle re-measurements for an EXISTING ledger entry WITHOUT
    changing its sec/round/note/prev (VERDICT r16 task #3): populates
    the "idle" field so the drift gate's ledger+3*sigma_idle term is
    computed from measured spread instead of degrading to the 2x/+1s
    floors. Requires >=5 samples (same evidentiary bar as rebaseline).
    REPLACES any prior idle array — the spread of the CURRENT code is
    the variance the gate should price, not a mix across versions.

    Usage: update_baseline.py --record-idle <name> --idle s1,...,s5[,...]
    """
    if len(argv) < 3 or "--idle" not in argv:
        sys.exit(record_idle.__doc__)
    name = argv[0]
    idle = [float(x) for x in argv[argv.index("--idle") + 1].split(",")]
    if len(idle) < 5:
        sys.exit(f"record-idle requires >=5 idle measurements, got {len(idle)}")
    with open("BASELINE_QUERIES.json") as f:
        ledger = json.load(f)
    if name not in ledger:
        sys.exit(f"{name} not in ledger — use the append path for new queries")
    entry = dict(ledger[name])
    had = "replacing prior idle" if "idle" in entry else "first idle record"
    entry["idle"] = [round(x, 3) for x in idle]
    ledger[name] = entry
    with open("BASELINE_QUERIES.json", "w") as f:
        json.dump({k: ledger[k] for k in sorted(ledger)}, f, indent=1)
    mean = sum(idle) / len(idle)
    sigma = (sum((x - mean) ** 2 for x in idle) / (len(idle) - 1)) ** 0.5
    print(f"~ {name}: idle[{len(idle)}] recorded ({had}), sec stays "
          f"{entry['sec']}, sigma={sigma:.3f}, gate term sec+3s="
          f"{entry['sec'] + 3 * sigma:.3f}")


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--rebaseline":
        return rebaseline(sys.argv[2:])
    if len(sys.argv) >= 2 and sys.argv[1] == "--record-idle":
        return record_idle(sys.argv[2:])
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
