#!/usr/bin/env python3
"""Standing sf1 probe (VERDICT r11 ask #4): measure a TRUE 10x scale step
(target/sf1 = 10x sf0.1, built by graft.tools.GenScale) for the queries where
superlinearity would actually hide — the top-N by bench time PLUS the
iterative graph family carrying the largest pinned shuffle budgets
(graph_modularity 34, graph_bfs_hops 26, graph_katz_centrality 20).

Per query: graft.tools.Time at sf0.1 and at target/sf1 (min of --reps), then
fail if any big/base ratio exceeds --max-ratio (default 10 = superlinear on a
10x row step — same standard as check_scaling's sf0.01->sf0.1 gate).

Writes scripts/sf1_probe.json (check_scaling.py folds it into SCALING.md's
tail on its next run). Wire-up: round_gate.sh runs this when GATE_SF1=1
(optional — GenScale + 2x23 timed queries is ~15-25 min); run at least once
per round before the final gate so SCALING.md's probe table is fresh.

Usage: sf1_probe.py [--top 20] [--reps 2] [--max-ratio 10] [--regen]
"""
import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRAPH_OPS = ["graph_modularity", "graph_bfs_hops", "graph_katz_centrality"]
BASE_SF = "/root/testdata/sf0.1"
BIG_SF = "target/sf1"


def sbt(task, timeout=3600):
    return subprocess.run(["sbt", "-batch", task], cwd=ROOT, timeout=timeout,
                          capture_output=True, text=True)


def time_queries(names, sf, reps):
    r = sbt(f"runMain graft.tools.Time {','.join(names)} {sf} {reps}")
    out = {}
    for m in re.finditer(r"TIME (\S+) rep\d+ ([\d.]+) s", r.stdout):
        q, s = m.group(1), float(m.group(2))
        out[q] = min(out.get(q, float("inf")), s)
    missing = set(names) - set(out)
    if missing:
        print(f"FAIL: no timing for {sorted(missing)} at {sf} "
              f"(sbt rc={r.returncode}; tail: {r.stdout[-500:]})")
        sys.exit(1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--max-ratio", type=float, default=10.0)
    ap.add_argument("--regen", action="store_true",
                    help="rebuild target/sf1 even if present")
    args = ap.parse_args()

    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
        bench = json.load(f)["queries"]
    top = sorted(bench, key=bench.get, reverse=True)[:args.top]
    names = top + [g for g in GRAPH_OPS if g not in top]
    print(f"probing {len(names)} queries: top-{args.top} by bench time "
          f"+ iterative graph family")

    # mutate mode (round 14): clone-mutation perturbs cloned documents'
    # shingles, translates basket/content FKs, and rotates embeddings, so
    # near-dup and basket structure scale like a real corpus instead of
    # manufacturing occupancy artifacts (see GenScale scaladoc). A stamp file
    # marks which mode built the current target/sf1 so a pre-mutation tree is
    # rebuilt automatically.
    stamp = os.path.join(ROOT, BIG_SF, ".genscale_mode")
    def stamped_mode():
        try:
            with open(stamp) as f:
                return f.read().strip()
        except OSError:
            return None
    if (args.regen or not os.path.isdir(os.path.join(ROOT, BIG_SF))
            or stamped_mode() != "mutate"):
        print("building target/sf1 via GenScale (10x sf0.1, mutate mode)...")
        r = sbt(f"runMain graft.tools.GenScale {BASE_SF} {BIG_SF} 10 mutate",
                timeout=7200)
        if r.returncode != 0:
            print(f"FAIL: GenScale rc={r.returncode}: {r.stdout[-800:]}")
            return 1
        with open(stamp, "w") as f:
            f.write("mutate")

    base = time_queries(names, BASE_SF, args.reps)
    big = time_queries(names, BIG_SF, args.reps)

    flagged = []
    queries = {}
    for q in names:
        ratio = big[q] / base[q] if base[q] > 0 else float("inf")
        queries[q] = {"base": round(base[q], 2), "big": round(big[q], 2)}
        mark = ""
        if ratio > args.max_ratio:
            flagged.append(q)
            mark = "  <-- SUPERLINEAR on a 10x row step"
        print(f"  {q}: {base[q]:.2f}s -> {big[q]:.2f}s ({ratio:.1f}x){mark}")

    with open(os.path.join(ROOT, "scripts/sf1_probe.json"), "w") as f:
        json.dump({
            "sf": "target/sf1 (10x sf0.1 via graft.tools.GenScale mutate "
                  "mode: FK-stride-correct, clone-mutated text/baskets/"
                  "embeddings)",
            "base_sf": BASE_SF,
            "row_ratio": 10.0,
            "max_ratio_gate": args.max_ratio,
            "flagged": flagged,
            "queries": queries,
        }, f, indent=2)
    print(f"scripts/sf1_probe.json written ({len(queries)} queries, "
          f"{len(flagged)} flagged)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
