#!/usr/bin/env python3
"""Regenerate COVERAGE.md's test/suite/query counts from the round's own
artifacts, so the header stops drifting by hand (VERDICT r5 item 6 — the
header was patch-bumped three rounds running).

Sources of truth:
  - tests/suites: the ScalaTest summary lines of the newest `sbt test` log
    (pass the log path), or target/test-reports when present
  - queries: CORRECTNESS_r*.json (newest round file in the repo root)

Usage: python3 tools/coverage_counts.py [sbt-test-log]
Rewrites the counts in-place in COVERAGE.md and prints the substitution.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_correctness():
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not files:
        sys.exit("no CORRECTNESS_r*.json in repo root")
    with open(files[-1]) as f:
        data = json.load(f)
    ok = sum(1 for v in data.values()
             if v.get("hash_match") and v.get("rows_match"))
    return files[-1], len(data), ok


def counts_from_log(path):
    txt = open(path, errors="replace").read()
    m_t = re.findall(r"Tests: succeeded (\d+), failed (\d+)", txt)
    m_s = re.findall(r"Suites: completed (\d+), aborted (\d+)", txt)
    if not m_t or not m_s:
        sys.exit(f"{path}: no ScalaTest summary found")
    succeeded, failed = map(int, m_t[-1])
    suites, aborted = map(int, m_s[-1])
    if failed or aborted:
        sys.exit(f"{path}: suite not green ({failed} failed, "
                 f"{aborted} aborted) — refusing to stamp COVERAGE.md")
    return succeeded, suites


def main():
    cfile, total_q, ok_q = newest_correctness()
    if ok_q != total_q:
        sys.exit(f"{cfile}: only {ok_q}/{total_q} queries green — refusing")
    line = None
    if len(sys.argv) > 1:
        tests, suites = counts_from_log(sys.argv[1])
        line = f"green (`sbt -batch test`, {tests} tests / {suites} suites)."
    cov = os.path.join(ROOT, "COVERAGE.md")
    txt = open(cov).read()
    txt, n1 = re.subn(r"All \d+ queries hash-match",
                      f"All {total_q} queries hash-match", txt)
    n2 = 0
    if line:
        txt, n2 = re.subn(r"green \(`sbt -batch test`, \d+ tests / \d+ "
                          r"suites\)\.", line, txt)
    open(cov, "w").write(txt)
    print(f"queries: {total_q} (from {os.path.basename(cfile)}); "
          f"replaced {n1} query-count + {n2} test-count occurrences")


if __name__ == "__main__":
    main()
