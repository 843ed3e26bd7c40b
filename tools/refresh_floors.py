#!/usr/bin/env python3
"""Refresh bench_floors.json from a quiet n=5 bench_full.json (dev tool).

Policy (VERDICT r14 #8): floors are QUIET-SESSION MINIMA.
- Queries new this round (no floor yet): take the fresh min.
- Everything else: min(old floor, fresh min) — a floor can only move
  down on new quiet evidence.
- --replace=REGEX force-replaces matching names with the fresh min
  (the one-time r15 use: the q140..q166 block's floors were taken amid
  the final feature push). OFF by default so a re-run can never raise
  a pinned floor silently (ADVICE r15).
Refuses to run on a contaminated recording."""
import json, re, sys

replace = None
for a in sys.argv[1:]:
    if a.startswith("--replace="):
        replace = re.compile(a[len("--replace="):])
    else:
        sys.exit(f"unknown arg {a}; usage: refresh_floors.py [--replace=REGEX]")

full = json.load(open("bench_full.json"))
if full.get("contaminated", True):
    sys.exit("refusing: bench_full.json is a contaminated recording")
floors = json.load(open("bench_floors.json"))
mins = full["mins"]

out = {}
for name, m in sorted(mins.items()):
    old = floors.get(name)
    if old is None or (replace is not None and replace.match(name)):
        out[name] = round(m, 3)
    else:
        out[name] = round(min(old, m), 3)
json.dump(out, open("bench_floors.json", "w"), indent=1, sort_keys=True)
changed = {n: (floors.get(n), out[n]) for n in out
           if floors.get(n) != out[n]}
print(f"{len(out)} floors written; {len(changed)} changed")
for n, (a, b) in sorted(changed.items()):
    print(f"  {n}: {a} -> {b}")
