#!/usr/bin/env python3
"""Fold N graft.Bench JSON lines into FLOORS.json — the machine-readable
per-query floor table (min across runs) the judge can diff round over
round, so host-drift arguments are checkable without prose archaeology.

Usage: floors.py <round> <out.json> <bench1.json> [bench2.json ...]
Each input is a file whose LAST line is the Bench JSON
({"metric":"total","value":...,"queries":{...},...}).
"""
import json
import sys
import platform


def last_json_line(path):
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    # prefer the FULL record (has "queries"); the literal last stdout
    # line is the compact q_dsec_by_id tail-truncation record
    for line in reversed(lines):
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    for line in reversed(lines):
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"{path}: no JSON line found")


def main():
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    rnd, out, inputs = sys.argv[1], sys.argv[2], sys.argv[3:]
    runs = [last_json_line(p) for p in inputs]
    qids = set()
    for r in runs:
        qids.update(r["queries"].keys())
    floors = {}
    for q in sorted(qids):
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        floors[q] = min(vals)
    # per-artifact build costs (min across runs, like the query floors):
    # the once-per-JVM builds land in Bench's untimed warmup pass, so
    # this table is the ONLY place their cost is machine-readable
    art = {}
    for r in runs:
        for k, v in (r.get("artifact_build_sec") or {}).items():
            art[k] = min(v, art[k]) if k in art else v
    doc = {
        "round": int(rnd),
        "sf": runs[0].get("sf"),
        "n_runs": len(runs),
        "host": platform.node(),
        "total_floor_sec": round(sum(floors.values()), 2),
        "run_totals_sec": [r.get("value") for r in runs],
        "run_load_avg": [r.get("load_avg") for r in runs],
        "artifact_build_floor_sec": art,
        "floors_sec": floors,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {out}: {len(floors)} query floors, "
          f"total {doc['total_floor_sec']} s over {len(runs)} runs")


if __name__ == "__main__":
    main()
