#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare (schema, rows, values) to the Verify
output parquet. Usage: check.py <sfdir> <verify_outdir>"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA cols got={list(g.columns)} want={list(w.columns)}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWCOUNT got={len(g)} want={len(w)}"
            continue
        bad = []
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype(float); bf = b.astype(float)
                if not np.array_equal(af, bf, equal_nan=True):
                    mx = np.nanmax(np.abs(af - bf))
                    bad.append(f"{c} maxdiff={mx:.3e}")
            else:
                if a.dtype != b.dtype:
                    bad.append(f"{c} dtype {a.dtype} vs {b.dtype}")
                elif not (pd.Series(a).fillna('<N>') == pd.Series(b).fillna('<N>')).all():
                    bad.append(f"{c} values differ")
        results[name] = "OK rows=%d" % len(g) if not bad else "VALUES " + "; ".join(bad)
    def passed(v):
        return v.startswith(("OK", "ROWS_ONLY")) and "EMPTY" not in v
    npass = sum(1 for v in results.values() if passed(v))
    for k, v in sorted(results.items()):
        print(f"{'✓' if passed(v) else '✗'} {k}: {v}")
    missing = set(oracle) - set(results)
    if missing:
        print("MISSING RESULTS:", missing)
    print(f"{npass}/{len(results)} pass")
    return 0 if npass == len(results) and not missing else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
