#!/usr/bin/env python3
"""Fold a round's bench sidecars into BENCH_FLOOR.json (driver-side tooling).

Per the BASELINE.md floor-ledger protocol: code-UNCHANGED lanes keep
min(previous floor, this round's minima); code-CHANGED lanes take FRESH
minima only (their old floor no longer describes the shipped code); NEW
lanes enter with this round's minima.

Usage:
  fold_floor.py OLD_FLOOR.json OUT.json changed=lane1,lane2 DETAIL.json...
Extra readings (e.g. BenchOne minima) can be supplied as JSON files of
{"queries": {lane: sec}}.
"""
import json
import sys


def main():
    old_path, out_path = sys.argv[1], sys.argv[2]
    changed = set()
    details = []
    for a in sys.argv[3:]:
        if a.startswith("changed="):
            changed |= set(x for x in a[8:].split(",") if x)
        else:
            details.append(json.load(open(a)))
    old = json.load(open(old_path))
    old_q = old["queries"] if "queries" in old else old
    mins = {}
    for d in details:
        q = d["queries"] if "queries" in d else d
        for k, v in q.items():
            if isinstance(v, (int, float)):
                mins[k] = min(mins.get(k, float("inf")), float(v))
    out = {}
    for k, v in mins.items():
        if k in changed or k not in old_q:
            out[k] = round(v, 3)
        else:
            out[k] = round(min(v, old_q[k]), 3)
    # unchanged lanes absent from this round's runs keep their old floor
    for k, v in old_q.items():
        if k not in out and k not in changed:
            out[k] = v
    # a lane declared changed= but with no fresh reading would silently
    # vanish from the ledger (shrinking lane count + composite); fail
    # loud instead — rerun the lane or drop it from changed=
    missing = sorted(k for k in changed if k not in mins)
    if missing:
        sys.exit(f"fold_floor: changed lanes have no fresh reading in "
                 f"the supplied detail files: {', '.join(missing)}")
    json.dump({"queries": dict(sorted(out.items())),
               "total": round(sum(out.values()), 2),
               "lanes": len(out)},
              open(out_path, "w"), indent=1)
    print(f"floor: {len(out)} lanes, composite "
          f"{sum(out.values()):.2f}s ({len(changed)} changed fresh, "
          f"{sum(1 for k in out if k not in old_q)} new)")


if __name__ == "__main__":
    main()
