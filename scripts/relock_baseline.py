#!/usr/bin/env python3
"""Re-lock BASELINE.md from one or more quiet-box BENCH_DETAIL records.

Round-8 re-lock (VERDICT r7 next-round task 1): the round-3 baseline
covered 64 queries and its mm_* numbers were locked against the stub
decoder, leaving half the surface ungated and a standing false >2x
flag on the real multimodal kernel. This script regenerates BASELINE.md
from quiet-box n>=3 runs so the 2x regression gate covers the whole
surface.

Usage:
  python3 scripts/relock_baseline.py COMMIT DETAIL.json [DETAIL2.json ...]

Multiple detail files: the locked number per query is the MEDIAN of the
runs' per-query medians (a central estimate of the quiet-box level —
the round-8 runs showed the virtualized host has ±25% speed windows
that loadavg cannot see, so a single run's absolute level is partly
luck of the window).

Refuses contended records (contended:true or loadavg_start > 2.5):
re-locking against a noisy box would bake contention into the bar.
"""
import json
import statistics
import sys


def main() -> None:
    commit = sys.argv[1]
    paths = sys.argv[2:]
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        if d.get("contended") or d.get("loadavg_start", 0.0) > 2.5:
            sys.exit(f"refusing contended record {p}: loadavg_start="
                     f"{d.get('loadavg_start')} contended={d.get('contended')}")
        if d.get("failed"):
            sys.exit(f"refusing record with failures {p}: {d['failed']}")
        runs.append(d)
    names = sorted({k for d in runs for k in d["queries"]})
    queries = {}
    for k in names:
        vals = [d["queries"][k] for d in runs
                if k in d["queries"] and d["queries"][k] >= 0.0]
        if vals:
            queries[k] = statistics.median(vals)
    total = sum(queries.values())
    prov = "; ".join(
        f"run{i+1}: n={d.get('runs')} reps, loadavg_start "
        f"{d.get('loadavg_start')}" for i, d in enumerate(runs))
    rows = "\n".join(f"| {k} | {v:.3f} |" for k, v in sorted(queries.items()))
    ml = json.dumps({"baseline_queries":
                     {k: round(v, 4) for k, v in sorted(queries.items())},
                     "baseline_total": round(total, 4)},
                    separators=(",", ":"))
    body = f"""# BASELINE — locked per-query bench numbers

The reference (fpetkovski/tsdb-parquet) publishes no figures at these
scale factors, so the baseline is graft's own measurement — locked here
so every later round's `BENCH_r{{N}}.json` can be graded against a fixed
bar (the 2x gate in the goal statement).

**Full re-lock at {commit}** (rep-major method — each rep runs the
whole sorted query surface once, so a host slow window hits different
queries in different reps and the per-query median/min filters it).
Covers the full {len(queries)}-entry surface from quiet full-surface
records on current code ({prov}); the per-query lock is the median
across records, a central estimate straddling the host's speed
windows. EDIT THIS PARAGRAPH after relocking to record WHY the
re-lock happened (which entries grew or changed) — the script writes
a neutral skeleton on purpose so stale prior-round prose cannot
survive a regeneration.

**Host-noise disclosure (measured rounds 8-11):** this virtualized
host has ±20% speed windows that loadavg cannot see (BENCH_r10 vs
BENCH_r11 on identical code: 224.5s vs 186.4s median totals). The
locked number per query is the MEDIAN across quiet records
({prov}), a central estimate of the quiet-box level, NOT a best-case.
Consequences for reading ratios: a fast host window shows ~0.8x, a
slow quiet window ~1.2-1.4x; only >2x on an unchanged query is a
regression signal, and the `contended`/`loadavg_start` stamps in the
bench JSON identify records where even that is noise.

**Setup:** sf0.1 (`/root/testdata/sf0.1`), `local[32]`, per-query
MEDIAN seconds over n rep-major reps after one untimed warmup
(write-once artifacts pre-built), noop sink. Recorded 2026-08-15
(round 15) at commit {commit}; Bench refuses or stamps records above
loadavg 2.5 since round 8.

Bench emits `vs_baseline` (min-of-n / baseline median) per query when
this file is present; a ratio > 2.0 on an unchanged query is a
regression to investigate, > 1.3 on a changed query is a flag. A
`failed` entry in the bench JSON is an automatic gate failure
regardless of timing.

Total (sum of locked medians): {total:.2f} s

| query | seconds |
|---|---|
{rows}

Machine-readable line (parsed by graft.Bench):

{ml}

## sf1 scaling lock (round 15)

One full-surface record at sf1 (10x sf0.1: target/soak/sf1, key-shifted
fact tables via scripts/soak_stage.scala; dims fixed) — the measured
scaling curve, refreshed at 317 entries (supersedes the round-13
296-entry record; BENCH_SF1.json):

- 317 queries, 3 rep-major reps, ZERO failures, quiet start
  (loadavg_start 1.28): median total **368.8 s**, min-of-3 349.4 s —
  **1.80x the same-day sf0.1 closing record's medians at 10x data**
  (r13 measured 1.95x on 296 entries; every r13 worst-scaler —
  mm_audio_*, q_labelprop, q_sorted_write — is unchanged or faster).
- The round-15 entries' sf1 profile: the hamming admission gate
  (emb_admission 5.0x) is pair-count-bound by construction — the bench
  re-verdicts 20% of the corpus as ONE arrival batch, so its work is
  |delta| x |index| popcounts; production arrivals are small batches
  against a broadcast-size index. admission_recall_clustered (6.9x)
  re-runs brute-force truth BY construction (measurement entry). The
  chain/hybrid/stepped entries all scale sublinearly (rollup-row
  bounded).
- Streaming legs measured separately the same round
  (scripts/soak_streams_r15.scala, PLANS.md): rollup maintenance max
  state 3,636 rows / 2.0 MB over 30 daily waves at 1M events.

"""
    with open("/root/repo/BASELINE.md", "w") as f:
        f.write(body)
    print(f"locked {len(queries)} queries from {len(runs)} run(s), "
          f"total {total:.2f}s")


if __name__ == "__main__":
    main()
