#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and compare STRICTLY (sorted
columns, sorted rows, exact values incl. float bits). If this passes, any
weaker driver comparison passes too.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Bound DuckDB's footprint so a heavy oracle spills to its temp dir
    # instead of racing the host OOM killer (the first sf3 sweep lost
    # d07 to a silent kill at >100 GB RSS; with a limit the same query
    # either finishes or fails with a diagnosable OOM error). 48 GB
    # leaves headroom for a concurrently-running Spark JVM on the
    # 128 GB host. Override via GRAFT_DUCKDB_MEM.
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory-parquet (ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{outdir}/{name}"
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errmark = os.path.join(pdir, "_error.txt")
        if os.path.exists(errmark):
            with open(errmark) as fh:
                print(f"FAIL {name}: query failed in Verify: {fh.read()[:300]}")
            n_fail += 1
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ: oracle={list(w.columns)} spark={list(g.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: row count differs: oracle={len(w)} spark={len(g)}")
            n_fail += 1
            continue
        mism = []
        for c in w.columns:
            a, b = w[c].values, g[c].values
            if np.issubdtype(w[c].dtype, np.floating):
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            else:
                eq = (w[c].astype(str).values == g[c].astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq))
                mism.append(f"col {c} row {i}: oracle={a[i]!r} spark={b[i]!r}")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3]))
            n_fail += 1
            continue
        # dtypes are a first-class schema check (mirrors the driver gate's
        # schema_match) — a mismatch FAILS, same as a value mismatch.
        dt_w = [str(t) for t in w.dtypes]; dt_g = [str(t) for t in g.dtypes]
        if dt_w != dt_g:
            diff = [(c, a, b) for c, a, b in zip(w.columns, dt_w, dt_g) if a != b]
            print(f"FAIL {name}: dtype mismatch: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
    missing = [q for q in glob.glob(f"{outdir}/*/") if os.path.basename(q.rstrip('/')) not in oracle]
    for q in missing:
        print(f"INFO rows-only (no oracle): {os.path.basename(q.rstrip('/'))}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
