#!/usr/bin/env python3
"""Mutation-test the oracle harness (VERDICT r11 ask #2).

Falsifiability check: perturb randomly-chosen queries' SPARK-side code one at
a time (flip a comparison, off-by-one a literal, swap a boolean operator) and
assert the Verify + DuckDB-oracle pipeline FLAGS each one. A mutation that
stays green would mean the oracle comparison for that query is vacuous.

Per mutation: mutate the Q block's Scala region (never the oracle SQL), run
`sbt runMain graft.Verify <sf> <tmp> ^name$`, prune oracle_sql.json to the
one query, run check_oracle.py, and expect a FAIL (hash/row/schema mismatch,
or the mutated query crashing in Verify → MISSING OUTPUT, which also counts
as caught). The file is restored from git after each mutation.

Equivalent mutants (e.g. a `>` → `>=` flip with no boundary row at this SF)
are a false-alarm hazard of any mutation test — on survival the probe retries
that query with a DIFFERENT mutation up to --retries times before declaring
the query's oracle vacuous.

Usage: mutation_probe.py [--n N] [--seed S] [--sf DIR] [--retries K]
Writes MUTATION.md (committed artifact) and exits nonzero if any sampled
query survives all its mutations.
"""
import argparse
import json
import os
import random
import re
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/graft_mutation"

# (label, pattern, replacement) — applied to the SCALA region of a Q block.
# Ordered by how unlikely they are to produce an equivalent mutant.
MUTATIONS = [
    ("and->or", re.compile(r" && "), " || "),
    ("eq->neq", re.compile(r" === "), " =!= "),
    ("between-hi+7", re.compile(r"\.between\((\d+), ?(\d+)\)"),
     lambda m: f".between({m.group(1)}, {int(m.group(2)) + 7})"),
    # skip count(lit(N)) — count over ANY non-null literal is the same
    # aggregate, a guaranteed equivalent mutant (r12 survivors agg_corr_exact
    # and embed_ivf_balance were exactly this false-alarm class)
    ("lit-int+7", re.compile(r"(?<!count\()lit\((\d+)\)"),
     lambda m: f"lit({int(m.group(1)) + 7})"),
    # matches Scala d/f-suffixed literals too (suffix preserved by lookahead)
    ("float-lit*3", re.compile(r"(?<![\w.])(\d+\.\d+)(?=[df]?(?:[^\w.]|$))"),
     lambda m: f"{float(m.group(1)) * 3 + 0.011:.4f}"),
    ("gt->lt", re.compile(r" > "), " < "),
    ("geq->lt", re.compile(r" >= "), " < "),
    ("leq->gt", re.compile(r" <= "), " > "),
    ("cmp-lit+7", re.compile(r" < (\d+)\b"),
     lambda m: f" < {int(m.group(1)) + 7}"),
    # `> N` threshold flips: a small +7 shift is equivalent by saturation in
    # blocks like setop_intersect (both sides of acctbal 7000 cover all 25
    # nations — r15 MUTATION.md adjudication), so move the literal by *3+7,
    # far enough to empty or drastically reshape the selection while keeping
    # date-like literals (19940101*3 < Int.MaxValue) compilable.
    ("cmp-gt-lit*3", re.compile(r" > (\d+)\b"),
     lambda m: f" > {int(m.group(1)) * 3 + 7}"),
    ("lt->gt", re.compile(r" < "), " > "),
    # aggregate swap — covers agg-only query bodies with no comparisons or
    # numeric literals at all (agg_theil_inequality had NO applicable pattern
    # in r13 and went unsampled). \bsum won't match inside dsum/davg.
    ("sum->max", re.compile(r"\bsum\("), "max("),
]


def sh(cmd, **kw):
    return subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True, **kw)


def find_q_blocks():
    """name -> (path, scala_start, scala_end) byte offsets of the Q block's
    Spark-side code (from after Q("name" up to the oracle Some(\"\"\"/None)."""
    blocks = {}
    src = subprocess.run(
        ["grep", "-rln", 'Q("', "src/main/scala/graft/queries"],
        cwd=ROOT, capture_output=True, text=True).stdout.split()
    for path in src:
        text = open(os.path.join(ROOT, path)).read()
        starts = [(m.start(), m.group(1))
                  for m in re.finditer(r'Q\("([a-z0-9_]+)"', text)]
        for i, (off, name) in enumerate(starts):
            end = starts[i + 1][0] if i + 1 < len(starts) else len(text)
            # Scala region ends where the oracle literal starts. BOTH plain
            # and interpolated oracle forms must be detected — ~80 queries use
            # Some(s"""...""") and missing that token would extend the "Scala
            # region" through the oracle SQL, letting a mutation land in the
            # oracle and be reported "caught" (r12 ADVICE item 1).
            cands = [text.find(tok, off) for tok in ('Some("""', 'Some(s"""')]
            cands = [c for c in cands if c != -1 and off < c < end]
            scala_end = min(cands) if cands else end
            blocks[name] = (path, off, scala_end)
    return blocks


def registered_oracle_names():
    with open(os.path.join(OUT, "oracle_sql.json")) as f:
        return set(json.load(f))


def run_verify(name, sf):
    """Compile + run the single query; True if check_oracle FLAGS it."""
    sh(["rm", "-rf", OUT])
    r = sh(["sbt", "-batch",
            f"runMain graft.Verify {sf} {OUT} ^{name}$"], timeout=1200)
    if r.returncode != 0:
        # compile error from the mutation = the harness caught it trivially,
        # but that weakens the probe — report as its own outcome
        return "compile_error"
    osql = os.path.join(OUT, "oracle_sql.json")
    with open(osql) as f:
        full = json.load(f)
    if name not in full:
        return "no_oracle"
    with open(osql, "w") as f:
        json.dump({name: full[name]}, f)
    chk = sh(["python3", "scripts/check_oracle.py", sf, OUT])
    caught = chk.returncode != 0
    return "caught" if caught else "survived"


def mask_comments(region):
    """Same-length copy of `region` with // and /* */ comment BODIES blanked
    to spaces, so pattern matching can't land a mutation inside a comment (a
    guaranteed-equivalent mutant; three in a row would falsely declare the
    query's oracle vacuous — r12 ADVICE item 2). String literals stay visible:
    expr("...") SQL fragments are real Spark-side code worth mutating. A //
    inside a string literal is NOT treated as a comment."""
    out = list(region)
    i, n = 0, len(region)
    in_str = None  # '"' or '"""'
    while i < n:
        c = region[i]
        if in_str:
            if region.startswith(in_str, i) and (
                    in_str == '"""' or region[i - 1] != '\\'):
                i += len(in_str)
                in_str = None
            else:
                i += 1
        elif region.startswith('"""', i):
            in_str = '"""'; i += 3
        elif c == '"':
            in_str = '"'; i += 1
        elif region.startswith('//', i):
            j = region.find('\n', i)
            j = n if j == -1 else j
            for k in range(i, j):
                out[k] = ' '
            i = j
        elif region.startswith('/*', i):
            j = region.find('*/', i + 2)
            j = n if j == -1 else j + 2
            for k in range(i, j):
                out[k] = ' '
            i = j
        else:
            i += 1
    return ''.join(out)


def mutate_once(path, s0, s1, rng, used):
    """Apply ONE mutation inside [s0,s1) of path; return (label, occ) or None.

    `used` is a set of (label, occurrence) pairs already attempted. A pattern
    that survived at its first match position retries at the NEXT position —
    a query whose first float literal is a structurally-equivalent spot (e.g.
    a bandedRowNumber band width, which cannot change ranks by construction)
    must not exhaust the probe's one shot at that label and false-RED
    (stats_kruskal_wallis, r13)."""
    text = open(os.path.join(ROOT, path)).read()
    region = text[s0:s1]
    masked = mask_comments(region)
    order = MUTATIONS[:]
    rng.shuffle(order)
    # Retries must try a DIFFERENT mutation first (the probe's documented
    # contract): a label that already survived here is suspect of an
    # equivalent-mutant CONTEXT — e.g. graph_triangle_count's edge-build
    # joins sit above a distinct over the complete 25-nation graph, so every
    # eq->neq occurrence there is invisible by saturation (r14 false RED).
    # Stable sort after the shuffle: unattempted labels first, then deeper
    # occurrences of already-attempted ones.
    order.sort(key=lambda t: sum(1 for (l, _) in used if l == t[0]))
    for label, pat, rep in order:
        occ = sum(1 for (l, _) in used if l == label)
        # Search the comment-masked copy (same offsets), splice the original.
        ms = list(pat.finditer(masked))
        if occ >= len(ms):
            continue
        m = ms[occ]
        mutated = region[:m.start()] + (
            rep(m) if callable(rep) else pat.sub(rep, m.group(0), count=1)
        ) + region[m.end():]
        open(os.path.join(ROOT, path), "w").write(text[:s0] + mutated + text[s1:])
        snippet = region[max(0, m.start() - 30):m.end() + 20].replace("\n", " ")
        return (label, occ), snippet
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names to probe (overrides sampling)")
    args = ap.parse_args()

    head = sh(["git", "rev-parse", "HEAD"]).stdout.strip()
    seed = args.seed if args.seed is not None else int(head[:8], 16)
    rng = random.Random(seed)

    dirty = sh(["git", "status", "--porcelain",
                "src/main/scala/graft/queries"]).stdout.strip()
    if dirty:
        print("REFUSING: src/main/scala/graft/queries has uncommitted changes "
              "(the probe restores files via git checkout)")
        return 2

    blocks = find_q_blocks()
    # Build the oracle-backed name list from a cheap Verify dump of ONE query
    # (any; we only need oracle_sql.json)
    r = sh(["sbt", "-batch",
            f"runMain graft.Verify {args.sf} {OUT} ^__none__$"], timeout=1200)
    if r.returncode != 0:
        print("baseline Verify dump failed"); return 2
    oracle_names = registered_oracle_names()
    candidates = sorted(n for n in blocks if n in oracle_names)
    rng.shuffle(candidates)
    if args.queries:
        candidates = [q for q in args.queries.split(",") if q in blocks]
        args.n = len(candidates)

    results, failures = [], []
    picked = 0
    for name in candidates:
        if picked >= args.n:
            break
        path, s0, s1 = blocks[name]
        outcome, tried = None, []
        used = set()
        for _ in range(args.retries):
            mut = mutate_once(path, s0, s1, rng, used)
            if mut is None:
                break
            key, snippet = mut
            used.add(key)
            label = key[0] if key[1] == 0 else f"{key[0]}@{key[1]}"
            res = run_verify(name, args.sf)
            sh(["git", "checkout", "--", path])
            tried.append((label, res, snippet))
            if res == "caught":
                outcome = "caught"
                break
            if res == "no_oracle":
                # The mutation broke the query's ORACLE REGISTRATION (Verify
                # ran but the name vanished from oracle_sql.json) — the
                # harness flagged it, just at the registration layer. Letting
                # this fall through to SURVIVED would mislabel a caught
                # mutation as a vacuous oracle (r12 ADVICE item 5).
                outcome = "caught"
                break
            if res == "compile_error":
                continue  # pick a different mutation
            if res == "survived":
                continue  # possible equivalent mutant — try another
        if not tried:
            continue  # no applicable mutation in this block — not sampled
        picked += 1
        if outcome != "caught":
            failures.append(name)
        results.append((name, path, tried, outcome or "SURVIVED"))
        print(f"[{picked}/{args.n}] {name}: {outcome or 'SURVIVED'} "
              f"({', '.join(l + '->' + r for l, r, _ in tried)})")

    ts = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    with open(os.path.join(ROOT, "MUTATION.md"), "w") as f:
        f.write(f"""# MUTATION — oracle-harness mutation probe

Status: **{"GREEN" if not failures else "RED"}** ({ts}, HEAD {head[:9]},
seed {seed}, sf {args.sf})

`scripts/mutation_probe.py` perturbs sampled queries' Spark-side code one
mutation at a time and asserts the Verify + DuckDB oracle pipeline flags each
(hash/row/schema mismatch or a crash → MISSING OUTPUT both count as caught).
A survival after {args.retries} distinct mutations = vacuous oracle = RED.
Equivalent-mutant retries are listed per query.

| query | file | mutations tried (label → outcome) | verdict |
|---|---|---|---|
""")
        for name, path, tried, verdict in results:
            t = "; ".join(f"`{l}` → {r}" for l, r, _ in tried)
            f.write(f"| {name} | {path.split('/')[-1]} | {t} | {verdict} |\n")
        f.write(f"\nSampled {picked} queries, caught "
                f"{picked - len(failures)}, survived {len(failures)}"
                f"{': ' + ', '.join(failures) if failures else ''}.\n")
    print(f"MUTATION.md written: {picked} sampled, {len(failures)} survived")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
