#!/usr/bin/env python3
"""Regenerate tools/bench_steady.json — the per-query steady-state
reference used by Bench's retouch rule (protocol v3).

Steady state = per-query MIN over every committed full-format
BENCH_LOCAL.json in git history (min-of-history is the same robust
estimator the in-run protocol uses: host noise is strictly additive,
so the smallest time ever observed on this host is the best available
steady-state proxy). Compact (centisecond, prefix-named) driver tails
are skipped — their names are lossy.

Run after committing a clean bench artifact:
    python3 tools/make_bench_steady.py && git add tools/bench_steady.json

A query whose legitimate cost GREW (more work by design) will keep its
old min here and be re-benched every run; that costs 3 isolated reps,
never a wrong artifact time (retouch only ever min-merges). Remove the
stale entry manually if that churn matters.
"""
import json
import subprocess

hashes = subprocess.run(
    ["git", "log", "--format=%H", "--", "BENCH_LOCAL.json"],
    capture_output=True, text=True).stdout.split()
best = {}
used = 0
for h in hashes:
    try:
        txt = subprocess.run(["git", "show", f"{h}:BENCH_LOCAL.json"],
                             capture_output=True, text=True).stdout
        qs = json.loads(txt).get("queries", {})
        if not qs or not all(k.startswith("q") and "_" in k for k in qs):
            continue  # compact/driver tail format — names lossy, skip
        used += 1
        for k, v in qs.items():
            v = float(v)
            if v > 0 and (k not in best or v < best[k]):
                best[k] = v
    except Exception:
        continue

with open("tools/bench_steady.json", "w") as f:
    json.dump({k: round(best[k], 4) for k in sorted(best)}, f,
              indent=0, sort_keys=True)
    f.write("\n")
print(f"bench_steady.json: {len(best)} queries from {used} artifacts")
