#!/usr/bin/env python3
"""Ritual gate (r12 verdict #6): every census artifact README names must
EXIST in the tree and be at least as new as the harness source that
produces it — so "documentation shipped ahead of the evidence" (the r12
spill-census finding) fails loudly instead of lingering silently.

Timestamp rule: a path's effective time is its last git commit time,
or its filesystem mtime when the working tree differs from HEAD (an
artifact regenerated this round but not yet committed counts as fresh).
An artifact that exists but was never committed AND is byte-identical
to nothing in git still gets its mtime — the final gate is the round's
end-of-round commit, which the driver performs.

Exit nonzero on: a README-named census artifact that is missing, an
artifact older than any of its producers, or a census-looking name in
README with no producer mapping here (forces this map to stay honest).

Usage: python3 tools/check_artifacts.py [--repo /root/repo]
"""
import argparse
import json
import os
import re
import subprocess
import sys

# artifact -> the sources whose change invalidates it
PRODUCERS = {
    "SKEW_CENSUS.json": ["src/main/scala/graft/SkewBench.scala",
                         "tools/make_skewed.py"],
    "SKEW_CORRECTNESS.json": ["tools/make_skewed.py"],
    "RECALL_CENSUS.json": ["src/main/scala/graft/RecallBench.scala"],
    "RECALL_CENSUS_sf001.json": ["src/main/scala/graft/RecallBench.scala"],
    "BPE_CENSUS.json": ["src/main/scala/graft/BpeBench.scala"],
    "SPILL_CENSUS.json": ["src/main/scala/graft/SpillBench.scala",
                          "tools/spill_census.sh"],
    "COMPACTION_CENSUS.json": ["src/main/scala/graft/CompactionBench.scala"],
    "BENCH_COLD.json": ["src/main/scala/graft/Bench.scala"],
    "LAYOUT_CENSUS.json": ["src/main/scala/graft/LayoutBench.scala",
                           "src/main/scala/graft/sources/Layout.scala"],
    "GRAPH_CENSUS.json": ["src/main/scala/graft/GraphBench.scala"],
}
# names that look like local census artifacts; driver-produced
# per-round files (BENCH_r*, CORRECTNESS_r*, COPYCHECK, LEAKCHECK,
# BASELINE) are the driver's concern, not this gate's
CENSUS_RE = re.compile(r"\b([A-Z][A-Z0-9_]*(?:CENSUS|CORRECTNESS|COLD)"
                       r"[A-Z0-9_]*\.json)\b")
DRIVER_RE = re.compile(r"_r\d+\.json$|^CORRECTNESS_sf|^DIRTY_")


def _dirty(repo, rel):
    """True when the path differs from HEAD (modified/untracked)."""
    out = subprocess.run(["git", "status", "--porcelain", "--", rel],
                         cwd=repo, capture_output=True, text=True).stdout
    return bool(out.strip())


def eff_time(repo, rel):
    """A path's effective time is its last git commit time; filesystem
    mtime is consulted ONLY when the path differs from HEAD (an artifact
    regenerated this round but not yet committed counts as fresh, and a
    byte-identical deterministic rerun needs no freshness credit — the
    committed copy IS current). Advice r13: the old max(commit, mtime)
    made the staleness check vacuous in a fresh clone, whose uniform
    checkout mtimes guarantee artifact >= producer; comparing commit
    times alone for clean paths restores the gate's guarantee."""
    p = os.path.join(repo, rel)
    if not os.path.exists(p):
        return None
    out = subprocess.run(["git", "log", "-1", "--format=%ct", "--", rel],
                         cwd=repo, capture_output=True, text=True).stdout
    committed = int(out.strip()) if out.strip() else 0
    if _dirty(repo, rel):
        return max(committed, int(os.path.getmtime(p)))
    return committed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()
    repo = args.repo
    readme = open(os.path.join(repo, "README.md")).read()
    named = {m for m in CENSUS_RE.findall(readme) if not DRIVER_RE.search(m)}
    failures, report = [], {}
    for art in sorted(named):
        if art not in PRODUCERS:
            failures.append(f"{art}: named in README but has no producer "
                            "mapping in tools/check_artifacts.py — add one")
            continue
        t_art = eff_time(repo, art)
        if t_art is None:
            failures.append(f"{art}: named in README but MISSING from the tree")
            continue
        stale_vs = [src for src in PRODUCERS[art]
                    if (eff_time(repo, src) or 0) > t_art]
        report[art] = {"ok": not stale_vs, "stale_vs": stale_vs}
        if stale_vs:
            failures.append(f"{art}: older than producer(s) {stale_vs} — "
                            "re-run the harness and commit the refreshed artifact")
    print(json.dumps({"named_in_readme": sorted(named),
                      "checked": report, "failures": failures}, indent=1))
    if failures:
        print(f"\nARTIFACT GATE FAILED ({len(failures)}):", file=sys.stderr)
        for f in failures:
            print("  - " + f, file=sys.stderr)
        sys.exit(1)
    print("\nall README-named census artifacts present and fresh")


if __name__ == "__main__":
    main()
