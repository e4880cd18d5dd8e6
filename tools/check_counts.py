#!/usr/bin/env python3
"""Gate against README/SURVEY count drift (round-8 verdict item 1).

The query/oracle/test counts quoted in README.md and SURVEY.md rotted by
hand-maintenance in rounds 6 AND 8. This script derives the real numbers
(registry entries parsed from SparkEntry.scala; test tally from the JUnit
XML that `sbt test` writes to target/test-reports) and asserts every
prose claim against them. Run as part of the round ritual AFTER `sbt
test`; exits non-zero on any drift.
"""
import glob
import re
import sys
import xml.etree.ElementTree as ET

REPO = "/root/repo"


def registry_counts():
    src = open(f"{REPO}/src/main/scala/graft/SparkEntry.scala").read()
    # Count '"name" -> ' entries inside each def block. The two Maps are
    # literal, one entry per line; block ends at the first line that is
    # exactly '  )'.
    def block(name):
        m = re.search(rf"def {name}[^\n]*= Map\(\n(.*?)\n  \)", src, re.S)
        if not m:
            sys.exit(f"check_counts: could not locate `def {name}` Map block")
        return len(re.findall(r'^\s+"[a-z0-9_]+" ->', m.group(1), re.M))

    return block("queries"), block("oracleSql")


def test_counts():
    xmls = glob.glob(f"{REPO}/target/test-reports/TEST-*.xml")
    if not xmls:
        return None, None
    tests = 0
    suites = 0
    for x in xmls:
        root = ET.parse(x).getroot()
        suites += 1
        tests += int(root.get("tests", 0))
    return tests, suites


def main():
    n_q, n_o = registry_counts()
    n_t, n_s = test_counts()
    print(f"registry: {n_q} queries, {n_o} oracleSql")
    if n_t is None:
        print("WARN: no target/test-reports XML — run `sbt test` first; "
              "test-count claims unchecked")
    else:
        print(f"tests:    {n_t} tests across {n_s} suites")

    errors = []

    def claim(path, pattern, expect, desc):
        """Every regex match in `path` must capture groups == expect."""
        text = open(f"{REPO}/{path}").read()
        hits = list(re.finditer(pattern, text))
        if not hits:
            errors.append(f"{path}: no match for {desc} pattern — "
                          "claim removed or reworded; update check_counts.py")
            return
        for h in hits:
            got = tuple(int(g) for g in h.groups())
            if got != expect:
                line = text[: h.start()].count("\n") + 1
                errors.append(f"{path}:{line}: {desc} says {got}, "
                              f"real is {expect}")

    # README header + coverage-map paragraph + SURVEY §8 status line.
    claim("README.md", r"(\d+) registered queries \((\d+) oracle-checked\)",
          (n_q, n_o), "header query/oracle count")
    claim("README.md", r"(\d+) `queries\(\)` entries; (\d+) have DuckDB",
          (n_q, n_o), "coverage-map query/oracle count")
    claim("SURVEY.md", r"(\d+) registered queries, (\d+) with DuckDB oracles",
          (n_q, n_o), "status query/oracle count")
    if n_t is not None:
        claim("README.md", r"(\d+) tests across (\d+) suites",
              (n_t, n_s), "test tally")

    if errors:
        print("\nCOUNT DRIFT:")
        for e in errors:
            print(f"  {e}")
        sys.exit(1)
    print("check_counts: OK")


if __name__ == "__main__":
    main()
