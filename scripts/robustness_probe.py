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
