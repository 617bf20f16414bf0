#!/usr/bin/env python3
"""Regenerate tools/bench_steady.json — the per-query steady-state
reference used by Bench's retouch rule (protocol v3).

Steady state = per-query MIN over the MOST RECENT WINDOW of committed
full-format BENCH_LOCAL.json artifacts (min-of-recent-history is the
same robust estimator the in-run protocol uses: host noise is strictly
additive, so the smallest time recently observed on this host is the
best available steady-state proxy). Compact (centisecond, prefix-named)
driver tails are skipped — their names are lossy.

Why a WINDOW and not all of history (r12): a query whose legitimate
cost GREW by design keeps its superseded implementation's min forever
under all-history, so it reads as "inflated" and burns 3 retouch reps
EVERY run without ever passing — by r12 five floors were stale that
way (q138's pre-ScalableRank window form at 0.34 s vs the scale-correct
form's 1.6 s floor, and four streaming queries from before their
stateful rebuilds). A 15-artifact window (~3 rounds, spanning multiple
host phases) keeps the min robust to noise while tracking the CURRENT
implementation; after an intentional cost change the floor self-heals
as the window rolls.

Run after committing a clean bench artifact:
    python3 tools/make_bench_steady.py && git add tools/bench_steady.json
"""
import json
import subprocess

WINDOW = 15  # full-format artifacts (~3 rounds; spans host phases)

hashes = subprocess.run(
    ["git", "log", "--format=%H", "--", "BENCH_LOCAL.json"],
    capture_output=True, text=True).stdout.split()
best = {}
used = 0
for h in hashes:
    if used >= WINDOW:
        break
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

# a floor silently vanishing (query present only in artifacts older
# than the window) would shrink retouch coverage unnoticed — say so
try:
    with open("tools/bench_steady.json") as f:
        prior = set(json.load(f))
except Exception:
    prior = set()
dropped = sorted(prior - set(best))
if dropped:
    print(f"WARNING: {len(dropped)} floors dropped (absent from the "
          f"last {used} full artifacts): {', '.join(dropped)}")

with open("tools/bench_steady.json", "w") as f:
    json.dump({k: round(best[k], 4) for k in sorted(best)}, f,
              indent=0, sort_keys=True)
    f.write("\n")
print(f"bench_steady.json: {len(best)} queries from {used} artifacts")
