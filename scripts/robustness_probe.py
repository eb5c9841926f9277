#!/usr/bin/env python3
"""Robustness sweep (round 14, VERDICT r13 ask #5): run the top-N bench
queries under two non-default runtime shapes and gate on COMPLETION:

  - shuffle200: spark.sql.shuffle.partitions=200 (cluster default) at the
    standard 8g heap;
  - mem2g: SPARK_DRIVER_MEM=2g (forked -Xmx, shared by driver+executors in
    local mode) at the standard 32 partitions.

A query FAILS the gate if it errors/OOMs under either shape, or if it slows
down >5x vs the same-session baseline leg (a hidden partition-count or
broadcast-size assumption, the embed_rq_encode class). Writes
scripts/robustness_probe.json; the PLANS.md table is authored from it.

Round-15 addition (r16 queue #4): the legs run in SEPARATE sbt sessions,
so their ratios carry multi-minute host drift (r15 saw 2-3x cross-session
entries that a paired instrument put at <=1.0x). Any shuffle200 ratio >2x
is now re-adjudicated with graft.tools.ProbeAB — which alternates
spark.sql.shuffle.partitions 32/200 per rep INSIDE one session, so each
pair shares its host window — and the PAIRED ratio decides the >5x flag
(recorded as `shuffle200_paired`). mem2g has no paired equivalent: the
heap is fixed at JVM start, so that leg keeps the cross-session ratio.

Usage: robustness_probe.py [--top 30] [--queries a,b,c]
"""
import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.1"


def run_leg(names, env_extra, timeout=5400):
    env = dict(os.environ, **env_extra)
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.tools.ProbeRobust {','.join(names)} {SF}"],
        cwd=ROOT, timeout=timeout, capture_output=True, text=True, env=env)
    ok, fail = {}, {}
    for m in re.finditer(r"^ROBUST (\S+) (ok|FAIL) (.*)$", r.stdout, re.M):
        q, st, rest = m.groups()
        if st == "ok":
            ok[q] = float(rest)
        else:
            fail[q] = rest
    missing = set(names) - set(ok) - set(fail)
    for q in missing:
        fail[q] = f"no ROBUST line (sbt rc={r.returncode}; JVM died? " \
                  f"tail: {r.stdout[-200:].strip()[-120:]})"
    return ok, fail


def run_ab(name, timeout=2400):
    """Paired 32p/200p ratio from ProbeAB (best-of-3 pairs, one session).
    Returns (ratio, t32, t200) or None if the probe itself failed."""
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.ProbeAB {name} {SF} 3 32 200"],
        cwd=ROOT, timeout=timeout, capture_output=True, text=True)
    m = re.search(r"^AB-BEST \S+ 32p=([0-9.]+) s 200p=([0-9.]+) s "
                  r"ratio=([0-9.]+)", r.stdout, re.M)
    return (float(m.group(3)), float(m.group(1)), float(m.group(2))) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--queries", type=str, default=None)
    args = ap.parse_args()

    if args.queries:
        names = args.queries.split(",")
    else:
        with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
            bench = json.load(f)["queries"]
        names = sorted(bench, key=bench.get, reverse=True)[:args.top]
    print(f"robustness sweep over {len(names)} queries at {SF}")

    legs = {
        "baseline": {},
        "shuffle200": {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "200"},
        "mem2g": {"SPARK_DRIVER_MEM": "2g"},
    }
    results, failures = {}, {}
    for leg, env in legs.items():
        print(f"-- leg {leg} {env or ''}")
        ok, fail = run_leg(names, env)
        results[leg] = ok
        failures[leg] = fail
        for q, msg in fail.items():
            print(f"   FAIL {q}: {msg}")

    flagged = []
    rows = []
    base = results["baseline"]
    for q in names:
        row = {"query": q, "baseline": base.get(q)}
        for leg in ("shuffle200", "mem2g"):
            t = results[leg].get(q)
            row[leg] = t
            if q in failures[leg]:
                row[leg + "_fail"] = failures[leg][q]
                flagged.append((q, leg, failures[leg][q]))
            elif t is not None and base.get(q) and t > 5 * base[q]:
                flagged.append((q, leg, f"{t / base[q]:.1f}x slowdown"))
        if q in failures["baseline"]:
            flagged.append((q, "baseline", failures["baseline"][q]))
        rows.append(row)

    # Paired re-adjudication of drift-suspect shuffle200 ratios (>2x in the
    # cross-session sweep): the ProbeAB best-of-pairs ratio replaces the
    # cross-session one for the >5x flag decision.
    for row in rows:
        q, b, t = row["query"], row.get("baseline"), row.get("shuffle200")
        if "shuffle200_fail" in row or not (b and t and t > 2 * b):
            continue
        print(f"-- paired ProbeAB re-adjudication: {q} "
              f"(cross-session {t / b:.1f}x)")
        ab = run_ab(q)
        if ab is None:
            print(f"   ProbeAB failed; keeping cross-session ratio")
            continue
        ratio, t32, t200 = ab
        row["shuffle200_paired"] = ratio
        print(f"   paired 32p={t32:.2f}s 200p={t200:.2f}s ratio={ratio:.2f}x")
        key = (q, "shuffle200", f"{t / b:.1f}x slowdown")
        if ratio <= 5 and key in flagged:
            flagged.remove(key)
        elif ratio > 5 and key not in flagged:
            flagged.append((q, "shuffle200", f"{ratio:.1f}x paired slowdown"))

    with open(os.path.join(ROOT, "scripts/robustness_probe.json"), "w") as f:
        json.dump({"sf": SF, "legs": {k: (v or "default") for k, v in
                                      [(k, e) for k, e in legs.items()]},
                   "flagged": [list(x) for x in flagged],
                   "rows": rows}, f, indent=2)

    print(f"\n{'query':34s} {'base':>7s} {'shuf200':>8s} {'mem2g':>7s}")
    for r in rows:
        def fmt(v):
            return f"{v:7.2f}" if isinstance(v, float) else "   FAIL"
        print(f"{r['query']:34s} {fmt(r.get('baseline'))} "
              f"{fmt(r.get('shuffle200')):>8s} {fmt(r.get('mem2g'))}")
    if flagged:
        print(f"\nFLAGGED ({len(flagged)}):")
        for q, leg, msg in flagged:
            print(f"  {q} [{leg}]: {msg}")
    else:
        print("\nall queries completed under every shape, none >5x")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
