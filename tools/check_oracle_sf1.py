#!/usr/bin/env python3
"""sf1 (10x bench scale) oracle sweep driver: runs tools/check_oracle.py
ONE QUERY AT A TIME with a per-query DuckDB timeout, streaming results, so
a single heavy oracle can neither stall the sweep invisibly nor sink it.
A timeout is an ORACLE-COST property, not an engine failure — the Spark
side of every query already ran in Verify. The former brute-force
exclusion set is EMPTY since round 10: every pair-family oracle was
rewritten as a candidate replay (inverted-index shingle posting lists for
the Jaccard family, 8-bit band joins for the hamming family, a
native-inner-product prefilter with a proven 1e-6 slack for v04's exact
all-pairs, list-fold fixed-point dots for the within-cell family) — the
n2 CTE forms exceeded 30 min at 5000 docs; the replays run the 50k-doc
sweep in seconds each.

Usage: python3 tools/check_oracle_sf1.py <sfDir> <verifyOutDir> [timeout_s]
"""
import sys, os, json, subprocess, shutil, time

BRUTE = set()  # empty since r10; kept for ad-hoc exclusions

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    per_query = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    allp = os.path.join(outdir, "oracle_sql.all.json")
    cur = os.path.join(outdir, "oracle_sql.json")
    if not os.path.exists(allp):
        shutil.copy(cur, allp)
    full = json.load(open(allp))
    names = sorted(set(full) - BRUTE)
    n_pass = n_fail = n_to = 0
    try:
        for name in names:
            with open(cur, "w") as fh:
                json.dump({name: full[name]}, fh)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "tools/check_oracle.py", sfdir, outdir],
                    capture_output=True, text=True, timeout=per_query)
                line = next((l for l in r.stdout.splitlines()
                             if l.startswith(("PASS", "FAIL"))), "NO-OUTPUT " + name)
            except subprocess.TimeoutExpired:
                line = f"TIMEOUT {name} (oracle > {per_query}s DuckDB budget)"
            dt = time.time() - t0
            print(f"{line}  [{dt:.0f}s]", flush=True)
            n_pass += line.startswith("PASS")
            n_fail += line.startswith("FAIL")
            n_to += line.startswith("TIMEOUT")
    finally:
        # restore the full catalog map so a later direct check_oracle.py
        # run checks every query, not just the sweep's last singleton
        shutil.copy(allp, cur)
    label = os.path.basename(os.path.normpath(sfdir))
    print(f"\n== {label} sweep: {n_pass} pass, {n_fail} fail, {n_to} oracle-timeout, "
          f"{len(BRUTE & set(full))} excluded-brute ==")
    print(f"excluded: {sorted(BRUTE & set(full))}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
