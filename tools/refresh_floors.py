#!/usr/bin/env python3
"""Refresh bench_floors.json from a quiet n=5 bench_full.json (dev tool).

Policy (VERDICT r14 #8): floors are QUIET-SESSION MINIMA.
- Queries new this round (no floor yet): take the fresh min.
- The round-14 block (q140..q166) had floors taken amid the final
  feature push: REPLACE with the fresh quiet min.
- Everything else: min(old floor, fresh min) — a floor can only move
  down on new quiet evidence.
Refuses to run on a contaminated recording."""
import json, re, sys

full = json.load(open("bench_full.json"))
if full.get("contaminated", True):
    sys.exit("refusing: bench_full.json is a contaminated recording")
floors = json.load(open("bench_floors.json"))
mins = full["mins"]
replace = re.compile(r"^q(1[4-6][0-9]|170|167|168|169)_")

out = {}
for name, m in sorted(mins.items()):
    old = floors.get(name)
    if old is None or replace.match(name):
        out[name] = round(m, 3)
    else:
        out[name] = round(min(old, m), 3)
json.dump(out, open("bench_floors.json", "w"), indent=1, sort_keys=True)
changed = {n: (floors.get(n), out[n]) for n in out
           if floors.get(n) != out[n]}
print(f"{len(out)} floors written; {len(changed)} changed")
for n, (a, b) in sorted(changed.items()):
    print(f"  {n}: {a} -> {b}")
