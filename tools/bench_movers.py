#!/usr/bin/env python3
"""Automate the per-round bench-mover adjudication the r11–r13 verdicts
did by hand: join two driver BENCH_rN.json artifacts (previous / current
round) with the steady-state floors (tools/bench_steady.json) and the
round's `git diff --name-only`, and emit the mover table annotated
code-touched vs phase.

Usage:
  python3 tools/bench_movers.py --prev BENCH_r12.json --cur BENCH_r13.json \
      --range 9bc6f96..0c1e331 [--threshold 0.25]

Column derivation:
  prev/cur     seconds from the compact line embedded in the driver
               artifact's `tail` (centisecond ints, numeric query keys
               mapped back to full names via tools/bench_steady.json).
               The compact line carries individually only entries
               ≥ 0.15 s (Bench folds the tail into "rest"), so a query
               absent on one side either crossed that threshold (key ≤
               the other side's max, shown as "<0.15") or is genuinely
               new (key above the previous round's max).
  steady       per-query steady-state floor (min over recent committed
               BENCH_LOCAL runs — see make_bench_steady.py).
  phase        each artifact's self-reported host-phase factor (median
               cur/steady ratio, computed by Bench at run time; absent
               before r13). A mover whose cur/prev ratio is within the
               phase ratio is host noise, not a code effect.
  attribution  three tiers:
                 code-touched  — the query's REGISTERING file (the
                                 src/main file containing the literal
                                 "qNNN_..." name) changed in the range;
                 indirect(X)   — the registering file references an
                                 object/class DEFINED in a changed file
                                 X (catches q148 riding a
                                 Components.scala change; file-level,
                                 so read it with the plan diff — other
                                 queries sharing the file inherit the
                                 flag);
                 phase         — neither: the strong claim (the code
                                 path cannot have changed).

Exit code 0 always — this is a reporting tool, not a gate.
"""
import argparse
import json
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def compact_from_tail(path: str) -> dict:
    """Extract the compact bench JSON line embedded in a driver
    artifact's `tail` field (the last {"metric":...} object).

    Falls back to recovering a FRONT-TRUNCATED line (the r15 failure
    mode: the driver window ate the `{"metric"...` prefix and the first
    few query entries): the surviving fragment still ends with
    `"sf":"..."}' (and, from r16 on, a `"totals":{...}` repeat), so the
    per-query centisecond pairs and the totals can be regexed out of
    the fragment before `"rest"`.
    """
    with open(path) as f:
        art = json.load(f)
    tail = art.get("tail", "")
    starts = [m.start() for m in re.finditer(r'\{"metric"', tail)]
    if starts:
        obj, _ = json.JSONDecoder().raw_decode(tail[starts[-1]:])
        if "totals" in obj:  # r16+: end-of-line repeat wins on truncation
            obj.setdefault("value", obj["totals"].get("value"))
            obj.setdefault("phase", obj["totals"].get("phase"))
        return obj
    # headless-line recovery
    m_sf = None
    for m_sf in re.finditer(r'"sf":"([^"]+)"', tail):
        pass
    if m_sf is None:
        sys.exit(f"{path}: no compact bench line in tail")
    rest_idx = tail.rfind(',"rest"', 0, m_sf.start())
    frag = tail[:rest_idx] if rest_idx != -1 else tail[:m_sf.start()]
    # r16 ADVICE #2: anchor the fragment START at the bench line itself
    # when any marker survived — otherwise a digit-keyed "N":M pair from
    # unrelated output earlier in the capture window would be ingested
    # as a query timing. Fall back to frag[0] only when no marker did.
    for marker in ('"queries":{', '"thr_cs":'):
        anchor = frag.rfind(marker)
        if anchor != -1:
            frag = frag[anchor:]
            break
    queries = {k: int(v) for k, v in re.findall(r'"(\d+)":(\d+)', frag)}
    obj = {"q_unit": "cs", "queries": queries, "sf": m_sf.group(1),
           "recovered_from_truncated_tail": True}
    m_tot = re.search(r'"totals":\{"value":([0-9.]+),"phase":([0-9.]+)\}',
                      tail[m_sf.end():])
    if m_tot:
        obj["value"] = float(m_tot.group(1))
        obj["phase"] = float(m_tot.group(2))
    return obj


def to_seconds(compact: dict, names_by_num: dict) -> dict:
    unit = compact.get("q_unit", "s")
    scale = 100.0 if unit == "cs" else 1.0
    return {names_by_num.get(k, k): float(v) / scale
            for k, v in compact.get("queries", {}).items()}


def qnum(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else -1


def defined_names(text: str) -> set:
    return set(re.findall(r"^(?:private\s+)?(?:object|class|trait)\s+(\w+)",
                          text, re.M))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True, help="previous round's BENCH_rN.json")
    ap.add_argument("--cur", required=True, help="current round's BENCH_rN.json")
    ap.add_argument("--range", required=True, dest="gitrange",
                    help="git range of the round's code, e.g. 9bc6f96..0c1e331")
    ap.add_argument("--threshold", type=float, default=0.25,
                    help="|delta| seconds above which a query is a mover")
    args = ap.parse_args()

    steady = json.loads((ROOT / "tools" / "bench_steady.json").read_text())
    names_by_num = {str(qnum(n)): n for n in steady}

    prev_art = compact_from_tail(args.prev)
    cur_art = compact_from_tail(args.cur)
    prev = to_seconds(prev_art, names_by_num)
    cur = to_seconds(cur_art, names_by_num)
    phase_prev = prev_art.get("phase")
    phase_cur = cur_art.get("phase")

    changed = set(subprocess.run(
        ["git", "diff", "--name-only", args.gitrange], cwd=ROOT,
        capture_output=True, text=True, check=True).stdout.split())
    changed_scala = {c for c in changed
                     if c.startswith("src/main/") and c.endswith(".scala")}

    src_files = {str(p.relative_to(ROOT)): p.read_text()
                 for p in (ROOT / "src" / "main").rglob("*.scala")}
    changed_names = {}
    for c in changed_scala:
        if c in src_files:
            for n in defined_names(src_files[c]):
                changed_names[n] = c

    def attribution(qname: str) -> str:
        reg = [f for f, t in src_files.items() if f'"{qname}"' in t]
        direct = [f for f in reg if f in changed_scala]
        if direct:
            return "code-touched: " + ", ".join(
                f.rsplit("/", 1)[-1] for f in sorted(direct))
        indirect = set()
        for f in reg:
            for n, c in changed_names.items():
                if re.search(rf"\b{re.escape(n)}\b", src_files[f]):
                    indirect.add(c)
        if indirect:
            return "indirect(" + ", ".join(
                c.rsplit("/", 1)[-1] for c in sorted(indirect)) + ")"
        return "phase (untouched)"

    def pf(x):
        return f"{x:.2f}" if isinstance(x, (int, float)) else "n/a"

    print(f"# bench movers: {args.cur} vs {args.prev} "
          f"(code range {args.gitrange})")
    ratio = (f"{phase_cur / phase_prev:.2f}"
             if isinstance(phase_cur, (int, float))
             and isinstance(phase_prev, (int, float)) and phase_prev else "n/a")
    print(f"phase: prev {pf(phase_prev)} -> cur {pf(phase_cur)} "
          f"(deltas within the phase ratio {ratio} are host noise)")
    print(f"totals: prev {prev_art.get('value')}s -> cur {cur_art.get('value')}s "
          f"(compact lines carry {len(prev)} / {len(cur)} entries >= 0.15 s; "
          f"the remainder is each artifact's 'rest' fold)")
    max_prev = max((qnum(n) for n in prev), default=-1)
    genuinely_new = sorted((n for n in set(cur) - set(prev)
                            if qnum(n) > max_prev), key=qnum)
    if genuinely_new:
        print("new queries: " + ", ".join(
            f"{n} {cur[n]:.2f}s" for n in genuinely_new))

    shared = set(cur) & set(prev)
    movers = [(cur[n] - prev[n], prev[n], n) for n in shared
              if abs(cur[n] - prev[n]) >= args.threshold]
    # threshold-crossers: visible on one side only, but not new —
    # the hidden side is < 0.15 s, so the delta bound is conservative
    movers += [(cur[n] - 0.15, None, n) for n in set(cur) - set(prev)
               if qnum(n) <= max_prev and cur[n] - 0.15 >= args.threshold]
    movers += [(0.15 - prev[n], prev[n], n) for n in set(prev) - set(cur)
               if 0.15 - prev[n] <= -args.threshold]

    print(f"\n{'query':38s} {'prev':>6s} {'cur':>6s} {'delta':>6s} "
          f"{'steady':>6s} {'c/s':>5s}  attribution")
    for d, p, n in sorted(movers, key=lambda x: -x[0]):
        st = steady.get(n)
        c = cur.get(n)
        cs_ratio = f"{c / st:.1f}" if st and c is not None else "-"
        print(f"{n:38s} {p if p is not None else float('nan'):6.2f} "
              f"{c if c is not None else float('nan'):6.2f} {d:+6.2f} "
              f"{st if st is not None else float('nan'):6.2f} {cs_ratio:>5s}  "
              f"{attribution(n)}")
    if not movers:
        print("(no movers above threshold)")


if __name__ == "__main__":
    main()
