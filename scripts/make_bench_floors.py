#!/usr/bin/env python3
"""Regenerate the per-query bench floor file from a committed idle-box
artifact (VERDICT r9 #2).

Usage: python3 scripts/make_bench_floors.py [artifact] [outfile]
Defaults: BENCH_full_latest.json -> scripts/bench_floors_sf0.1.json

The floor for a query is its recorded median (the artifact's "queries" /
"gate_queries" values). Bench flags any later median > 2x floor + 50 ms
as `suspect_rows`. Regenerate ONLY from an artifact recorded on an idle
box (sentinel two-sided-clean, attempts=1) — a contaminated artifact
would bake inflated floors in and blind the defense.
"""
import json
import sys

artifact = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full_latest.json"
out = sys.argv[2] if len(sys.argv) > 2 else "scripts/bench_floors_sf0.1.json"

d = json.load(open(artifact))
floors = {}
floors.update(d.get("queries", {}))
floors.update(d.get("gate_queries", {}))
floors.pop("streaming_windowed_count", None)  # band-adjudicated separately

with open(out, "w") as f:
    json.dump({k: round(v, 3) for k, v in sorted(floors.items())}, f,
              indent=0, sort_keys=True)
    f.write("\n")
print(f"wrote {len(floors)} floors from {artifact} -> {out}")
