#!/usr/bin/env python3
"""Summarize a bench child's SPARK_GRAFT_JOBLOG=1 stderr log.

For each measured run (between RUN markers is invisible here, so jobs are
grouped over the whole child), prints per-job wall vs task/cores and the
implied serial seconds (wall - task/cores, floored at 0) — the jobs where
wall >> task/cores are the driver-serial / under-parallelized culprits.

Usage: tools/joblog_summary.py <child-log> <cores>
"""
import re
import sys


def main() -> None:
    path, cores = sys.argv[1], int(sys.argv[2])
    jobs = []
    pat = re.compile(
        r"JOB\s+(\d+)\s+wall\s+([\d.]+)\s+task\s+([\d.]+)\s+gc\s+([\d.]+)\s+(.*)")
    for line in open(path, errors="replace"):
        m = pat.search(line)
        if m:
            jid, wall, task, gc, name = m.groups()
            jobs.append((int(jid), float(wall), float(task), float(gc), name.strip()))
    total_wall = sum(j[1] for j in jobs)
    total_task = sum(j[2] for j in jobs)
    print(f"{len(jobs)} jobs  sum_wall={total_wall:.2f}s  "
          f"sum_task={total_task:.2f}s  task/cores={total_task / cores:.2f}s")
    print(f"{'job':>4} {'wall':>8} {'task':>9} {'task/c':>8} {'serial':>7}  name")
    for jid, wall, task, gc, name in jobs:
        serial = max(0.0, wall - task / cores)
        print(f"{jid:>4} {wall:>8.3f} {task:>9.2f} {task / cores:>8.2f} "
              f"{serial:>7.2f}  {name[:70]}")
    agg = {}
    for jid, wall, task, gc, name in jobs:
        a = agg.setdefault(name[:50], [0, 0.0, 0.0])
        a[0] += 1
        a[1] += wall
        a[2] += max(0.0, wall - task / cores)
    print("\nby call site (count, wall, serial):")
    for name, (cnt, wall, serial) in sorted(agg.items(), key=lambda x: -x[1][2]):
        print(f"{cnt:>3}x wall={wall:>8.2f} serial={serial:>7.2f}  {name}")


if __name__ == "__main__":
    main()
