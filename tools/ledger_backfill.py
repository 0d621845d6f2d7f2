#!/usr/bin/env python3
"""Backfill the cross-run pair ledger from archived bench artifacts.

Every full `graft.Bench` artifact already carries each attempted pair's
complete qualification inputs (side minima, clock/membw probe ratios,
control brackets). This tool replays them into
`bench-runs/pair_ledger.jsonl` so runs that predate the in-run ledger
writer (Bench.scala, round 5) still contribute history pairs.

Protocol fields the artifact does not carry must be supplied explicitly
and verified by the operator against the run's provenance (BASELINE.md
run index / launch env):

  --proto         measured-path version the run executed (Bench.scala's
                  MeasuredPathVersion at that commit)
  --pair-samples  SPARK_GRAFT_PAIR_SAMPLES at launch (artifacts emitted
                  from round 5 on carry `pair_samples`; older ones don't)

`clock_eq`, `cpus` and `triples` are read from the artifact itself.
Duplicate (run, lo_min, hi_min) entries are skipped, so re-running is
idempotent. Tool-side only (driver python); the engine never imports it.
"""
import argparse
import json
import os
import re
import sys


def pairs_from_artifact(art):
    q = art["queries"]
    out = []
    i = 1
    while f"pair{i}_min_sec@1" in q:
        p = {
            "lo_min": q[f"pair{i}_min_sec@1"],
            "hi_min": q[f"pair{i}_min_sec@4"],
            "clock": q[f"clock_pair{i}"],
            "membw": q[f"membw_pair{i}"],
        }
        for src, dst in ((f"eff_wall_control_pre_pair{i}", "ctrl_pre"),
                         (f"eff_wall_control_post_pair{i}", "ctrl_post")):
            if src in q:
                p[dst] = q[src]
        out.append(p)
        i += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="+", help="bench artifact JSON files")
    ap.add_argument("--ledger", default="bench-runs/pair_ledger.jsonl")
    ap.add_argument("--proto", required=True,
                    help="measured-path version the runs executed (verify!)")
    ap.add_argument("--pair-samples", type=int, default=None,
                    help="per-side sample count at launch; omit to use the "
                         "artifact's own pair_samples field (round 5+)")
    ap.add_argument("--cpus", type=int, default=None,
                    help="SPARK_GRAFT_CPUS at launch; omit to derive from "
                         "the artifact's highest total_sec_min@N level key")
    args = ap.parse_args()

    seen = set()
    if os.path.exists(args.ledger):
        with open(args.ledger) as f:
            for line in f:
                try:
                    d = json.loads(line)
                    seen.add((d["run"], round(d["lo_min"], 4),
                              round(d["hi_min"], 4)))
                except (json.JSONDecodeError, KeyError):
                    pass

    added = 0
    with open(args.ledger, "a") as out:
        for path in args.artifacts:
            with open(path) as f:
                art = json.load(f)
            q = art["queries"]
            run = re.sub(r"\.json$", "", os.path.basename(path))
            samples = args.pair_samples
            if samples is None:
                if "pair_samples" not in q:
                    sys.exit(f"{path}: artifact predates the pair_samples "
                             f"field; pass --pair-samples from the run's "
                             f"verified launch env")
                samples = int(q["pair_samples"])
            # ADVICE r5: cpus was hardcoded to 32 — a backfilled run
            # launched with a different SPARK_GRAFT_CPUS would get a wrong
            # protocol stamp and wrongly pass/fail future cpu-identity
            # merges. Derive it from the artifact's own level keys (the
            # highest total_sec_min@N / min_sec@N level IS the cpu count),
            # or take the explicit flag; refuse when neither is available.
            cpus = args.cpus
            if cpus is None:
                levels = [int(m.group(1)) for k in q
                          for m in [re.match(r"(?:total_sec|min_sec|"
                                             r"total_sec_min)@(\d+)$", k)]
                          if m]
                if not levels:
                    sys.exit(f"{path}: no @N level keys to derive cpus "
                             f"from; pass --cpus from the run's verified "
                             f"launch env")
                cpus = max(levels)
            ts = int(os.path.getmtime(path) * 1000)
            for p in pairs_from_artifact(art):
                key = (run, round(p["lo_min"], 4), round(p["hi_min"], 4))
                if key in seen:
                    continue
                seen.add(key)
                rec = {
                    "run": run, "ts": ts, "source": f"backfill:{run}",
                    "proto": args.proto,
                    "clock_eq": int(q.get("clock_equalized", 0)),
                    "pair_samples": samples,
                    "cpus": cpus,
                    "triples": int(q["canonical_triples"]),
                    **{k: round(v, 4) for k, v in p.items()},
                }
                out.write(json.dumps(rec, separators=(",", ":")) + "\n")
                added += 1
            print(f"{path}: {len(pairs_from_artifact(art))} pairs, "
                  f"run id {run}")
    print(f"appended {added} new ledger entries to {args.ledger}")


if __name__ == "__main__":
    main()
