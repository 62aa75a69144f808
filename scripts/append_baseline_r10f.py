#!/usr/bin/env python3
"""Round-10 sixth PARTIAL baseline append: lock the closing-session
entries — the WordPiece tokenizer pair, mutual-kNN k-core, label
propagation, positional phrase search, and the TPC-H Q13/Q17 shapes.

Locked value per entry = median across the given quiet records (the
append_baseline_r10.py rule; contended / loaded / failing records are
refused).

Usage: append_baseline_r10f.py BENCH_DETAIL_B.json BENCH_DETAIL_C.json
"""
import json
import re
import statistics
import sys

NEW = [
    "wordpiece_train", "wordpiece_tokens", "q_kcore", "q_labelprop",
    "doc_phrase_search", "q13_custdist", "q17_small_qty",
]
RELOCK = []


def main() -> None:
    runs = []
    for p in sys.argv[1:]:
        with open(p) as f:
            d = json.load(f)
        if d.get("contended") or d.get("loadavg_start", 0.0) > 2.5:
            sys.exit(f"refusing contended record {p}")
        if d.get("failed"):
            sys.exit(f"refusing record with failures {p}: {d['failed']}")
        runs.append(d)
    locked = {}
    for k in NEW + RELOCK:
        vals = [d["queries"][k] for d in runs
                if k in d.get("queries", {}) and d["queries"][k] >= 0.0]
        if len(vals) < 2:
            sys.exit(f"{k}: need >=2 quiet records, have {len(vals)}")
        locked[k] = statistics.median(vals)

    with open("BASELINE.md") as f:
        text = f.read()
    mline = re.search(r'^\{"baseline_queries":.*$', text, re.M)
    data = json.loads(mline.group(0))
    for k, v in locked.items():
        if k in data["baseline_queries"] and k not in RELOCK:
            sys.exit(f"{k} already locked — this script only appends")
        data["baseline_queries"][k] = round(v, 4)
    data["baseline_queries"] = dict(sorted(data["baseline_queries"].items()))
    data["baseline_total"] = round(sum(data["baseline_queries"].values()), 4)
    for k, v in locked.items():
        row = f"| {k} | {v:.3f} |"
        rows = re.findall(r"^\| ([a-z0-9_]+) \| [0-9.]+ \|$", text, re.M)
        after = max((r for r in rows if r < k), default=None)
        if after is None:
            sys.exit("no anchor row found")
        pat = re.compile(rf"^(\| {after} \| [0-9.]+ \|)$", re.M)
        text = pat.sub(rf"\1\n{row}", text, count=1)
    text = re.sub(r'^\{"baseline_queries":.*$',
                  json.dumps(data, separators=(",", ":")), text, count=1,
                  flags=re.M)
    with open("BASELINE.md", "w") as f:
        f.write(text)
    for k, v in locked.items():
        print(f"locked {k} = {v:.3f}")
    print(f"baseline_total = {data['baseline_total']}")


if __name__ == "__main__":
    main()
