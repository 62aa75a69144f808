#!/usr/bin/env python3
"""Re-lock BASELINE.md from a quiet-box BENCH_DETAIL.json.

Round-8 re-lock (VERDICT r7 next-round task 1): the round-3 baseline
covered 64 queries and its mm_* numbers were locked against the stub
decoder, leaving 86 entries ungated and a standing false >2x flag on
the real multimodal kernel. This script regenerates BASELINE.md from a
quiet-box n>=3 run's detail file so the 2x regression gate covers the
whole surface.

Usage: python3 scripts/relock_baseline.py BENCH_DETAIL.json COMMIT [NOTE]

Refuses a contended record (contended:true or loadavg_start > 2.5):
re-locking against a noisy box would bake contention into the bar.
"""
import json
import sys


def main() -> None:
    detail_path, commit = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    with open(detail_path) as f:
        d = json.load(f)
    if d.get("contended") or d.get("loadavg_start", 0.0) > 2.5:
        sys.exit(f"refusing contended record: loadavg_start="
                 f"{d.get('loadavg_start')} contended={d.get('contended')}")
    if d.get("failed"):
        sys.exit(f"refusing record with failures: {d['failed']}")
    queries = {k: v for k, v in d["queries"].items() if v >= 0.0}
    total = sum(queries.values())
    reps = d.get("runs", "?")
    rows = "\n".join(f"| {k} | {v:.3f} |" for k, v in sorted(queries.items()))
    ml = json.dumps({"baseline_queries":
                     {k: round(v, 4) for k, v in sorted(queries.items())},
                     "baseline_total": round(total, 4)},
                    separators=(",", ":"))
    body = f"""# BASELINE — locked per-query bench numbers

The reference (fpetkovski/tsdb-parquet) publishes no figures at these
scale factors, so the baseline is graft's own measurement — locked here
so every later round's `BENCH_r{{N}}.json` can be graded against a fixed
bar (the 2x gate in BASELINE.json's goal statement).

**Round-8 re-lock** (supersedes the round-3 64-query baseline): the
round-3 lock predated 86 of the current {len(queries)} entries and held
stub-era numbers for the multimodal kernel (mm_decode 0.14s for a
byte-arithmetic stub; the real javax.imageio decode honestly costs
~0.5-0.7s), which produced standing false >2x flags the judge had to
adjudicate every round. This lock covers the full surface at the
real-kernel numbers. Deltas vs round 3 on unchanged queries were
verified < 1.3x before re-locking (the re-lock resets the bar, so the
old record's like-for-like comparison lives in VERDICT r7: 0.73x).
{note}

**Setup:** sf0.1 (`/root/testdata/sf0.1`), `local[32]`, {reps} reps per
query after one untimed warmup (write-once artifacts pre-built),
per-query MEDIAN seconds, noop sink (no result pruning). Recorded
2026-08-13 (round 8) at commit {commit}, quiet box (loadavg_start
{d.get('loadavg_start')}, contended-guard active — Bench refuses or
stamps records above loadavg 2.5 since round 8).

Bench emits `vs_baseline` (min-of-n / baseline median) per query when
this file is present; a ratio > 2.0 on an unchanged query is a
regression to investigate, > 1.3 on a changed query is a flag. A
`failed` entry in the bench JSON is an automatic gate failure
regardless of timing.

Total (sum of medians): {total:.2f} s

| query | seconds |
|---|---|
{rows}

Machine-readable line (parsed by graft.Bench):

{ml}
"""
    with open("/root/repo/BASELINE.md", "w") as f:
        f.write(body)
    print(f"locked {len(queries)} queries, total {total:.2f}s")


if __name__ == "__main__":
    main()
