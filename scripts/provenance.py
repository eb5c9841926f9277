#!/usr/bin/env python3
"""Gate provenance (VERDICT r11 ask #1): record AT WHICH SOURCE STATE each
round-gate step ran, and refuse the end-of-round snapshot when any step is
stale.

Round 11's `sbt test` log silently predated the final HEAD by 4 commits
(including a real source fix, 67c41ca) — artifact COUNTS matched, so the
count cross-check couldn't see it. This closes that class:

  stamp <step>   after a gate step succeeds: append {step: {sha, srchash, utc}}
                 to PROVENANCE.json (committed with the snapshot).
  check          verify every required step is stamped, all stamps share ONE
                 srchash, and it equals the CURRENT working-tree srchash.
                 Nonzero exit otherwise, listing exactly which steps to re-run.

`srchash` is a sha256 over the git blob hashes of every tracked+working-tree
file under src/, scripts/, build.sbt, project/*.sbt|*.scala — the inputs that
determine gate outcomes — and deliberately EXCLUDES generated artifacts
(PLANS.md, SCALES.md, SCALING.md, BENCH_*, PROVENANCE.json itself), so the
snapshot commit that adds those artifacts does not invalidate the stamps,
while reverting (or adding) ANY late source commit changes the hash and makes
`check` refuse. A judge can re-verify post-hoc: `provenance.py check` at the
snapshot commit must pass.
"""
import hashlib
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROV = os.path.join(ROOT, "PROVENANCE.json")

# Every step round_gate.sh runs; `check` requires all of them stamped.
# bench steps are optional under GATE_SKIP_BENCH (mid-round fast mode) —
# the end-of-round check must see them (pass --require-bench, the default).
CORE_STEPS = [
    "sbt_test", "planlint", "declared", "streambench", "cross_scale",
]
BENCH_STEPS = ["bench_sf0.01", "bench_sf0.1", "scaling", "mutation"]


def git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=ROOT, check=True,
                          capture_output=True, text=True).stdout.strip()


def srchash() -> str:
    """Hash the WORKING TREE content of all gate-relevant source inputs."""
    tracked = git("ls-files", "--cached", "--others", "--exclude-standard",
                  "src", "scripts", "build.sbt", "project").splitlines()
    paths = sorted(p for p in tracked
                   if not p.endswith(".md")
                   # scripts/*.json are gate OUTPUTS (sf1_probe.json), not inputs
                   and not (p.startswith("scripts/") and p.endswith(".json"))
                   and os.path.exists(os.path.join(ROOT, p)))
    h = hashlib.sha256()
    for p in paths:
        blob = subprocess.run(["git", "hash-object", p], cwd=ROOT, check=True,
                              capture_output=True, text=True).stdout.strip()
        h.update(f"{p}\0{blob}\n".encode())
    return h.hexdigest()


def load() -> dict:
    if os.path.exists(PROV):
        with open(PROV) as f:
            return json.load(f)
    return {}


def stamp(step: str) -> None:
    d = load()
    d[step] = {
        "sha": git("rev-parse", "HEAD"),
        "srchash": srchash(),
        "utc": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    with open(PROV, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"[provenance] stamped {step} @ {d[step]['sha'][:9]} "
          f"src={d[step]['srchash'][:12]}")


def check(require_bench: bool) -> int:
    d = load()
    cur = srchash()
    required = CORE_STEPS + (BENCH_STEPS if require_bench else [])
    stale, missing = [], []
    for s in required:
        if s not in d:
            missing.append(s)
        elif d[s]["srchash"] != cur:
            stale.append(s)
    if missing or stale:
        if missing:
            print(f"PROVENANCE REFUSED: steps never stamped: {missing}")
        if stale:
            print(f"PROVENANCE REFUSED: steps ran at a DIFFERENT source state "
                  f"(re-run them): {stale}")
            for s in stale:
                print(f"  {s}: ran src={d[s]['srchash'][:12]} @ "
                      f"{d[s]['sha'][:9]} {d[s]['utc']}; current "
                      f"src={cur[:12]}")
        return 1
    shas = {d[s]["sha"] for s in required}
    print(f"PROVENANCE OK: {len(required)} steps at src={cur[:12]} "
          f"(commits seen: {sorted(x[:9] for x in shas)}; source tree "
          f"identical across all)")
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "stamp" and len(sys.argv) == 3:
        stamp(sys.argv[2])
        return 0
    if len(sys.argv) >= 2 and sys.argv[1] == "check":
        return check(require_bench="--no-bench" not in sys.argv[2:])
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
