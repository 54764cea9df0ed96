#!/usr/bin/env python3
"""Checksum-mode oracle check for results too large for the pandas
compare in check_oracle.py (the sorted-frame compare needs ~3x the
result in driver RAM; m10 at sf6.4 produces 208M pair rows).

Equivalence is checked entirely inside DuckDB, constant memory at the
output: COUNT(*) plus an order-independent 128-bit-ish checksum
(SUM of hash(row-as-text) split into two 63-bit lanes to keep BIGINT
sums collision-resistant) computed over BOTH the engine's parquet dump
and the oracle SQL's result, with the oracle's trailing ORDER BY made
irrelevant by the commutative aggregate. A hash-equal multiset of rows
is exactly what the driver's sorted-hash gate certifies, minus row
order — which the count+multiset checksum also certifies.

Usage: check_oracle_checksum.py <sfDir> <verifyOutDir> <query> [memGB]
           [partCol] [parts]

With partCol/parts the oracle runs `parts` times, slice k filtered to
`partCol % parts = k` — a deterministic function of output columns, so
DuckDB pushes it through the trailing ORDER BY, the DISTINCT (a
group-by-all) and into the pair join's probe side, dividing the
candidate explosion's spill by `parts`. Counts and checksums are
commutative over the disjoint slices, so their sums equal the
unpartitioned aggregates (m10 at sf6.4: 208M pairs from ~10^9
candidates spilled >76 GB unpartitioned; 8 slices fit).
"""
import sys, os, json, glob, re

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir, query = sys.argv[1], sys.argv[2], sys.argv[3]
    mem = sys.argv[4] if len(sys.argv) > 4 else "100"
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}GB'")
    con.execute("SET temp_directory='/root/repo/target/duckdb_tmp'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    allp = os.path.join(outdir, "oracle_sql.all.json")
    sqlsrc = allp if os.path.exists(allp) else os.path.join(outdir, "oracle_sql.json")
    sql = json.load(open(sqlsrc))[query]
    # the checksum is order-independent; a trailing ORDER BY inside the
    # wrapping subquery forces DuckDB to externally sort the full result
    # before the aggregate sees a row (m10 at sf6.4: a 208M-row external
    # sort spilling >76 GB for ordering the aggregate ignores). Strip a
    # FINAL top-level ORDER BY clause (plain column list only — never
    # matches window-internal ORDER BYs, which are followed by ')')
    stripped = re.sub(r"ORDER BY[\sa-zA-Z0-9_,.]+$", "", sql.rstrip())
    if stripped != sql.rstrip():
        print("note: trailing ORDER BY stripped for the aggregate", flush=True)
    sql = stripped
    files = sorted(glob.glob(f"{outdir}/{query}/*.parquet"))
    assert files, f"no engine parquet for {query} under {outdir}"
    flist = ", ".join(f"'{f}'" for f in files)

    # column names/order from a LIMIT 0 probe of each side; the compare
    # concatenates values in SORTED column-name order (the driver's rule)
    eng_cols = [d[0] for d in con.execute(
        f"SELECT * FROM read_parquet([{flist}]) LIMIT 0").description]
    ora_cols = [d[0] for d in con.execute(
        f"SELECT * FROM ({sql}) LIMIT 0").description]
    if sorted(eng_cols) != sorted(ora_cols):
        print(f"FAIL {query}: schema mismatch {sorted(eng_cols)} vs {sorted(ora_cols)}")
        sys.exit(1)

    part_col = sys.argv[5] if len(sys.argv) > 5 else None
    parts = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    def agg(src, where=""):
        row = "concat_ws('|', " + ", ".join(
            f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in sorted(eng_cols)) + ")"
        r = con.execute(
            f"SELECT COUNT(*), COALESCE(SUM(hash({row}) >> 1), 0), "
            f"COALESCE(SUM(hash({row} || '#2') >> 1), 0) FROM ({src}) {where}").fetchone()
        return (int(r[0]), int(r[1]), int(r[2]))

    # m10's candidate join emits ~sum(bucket^2) rows into the DISTINCT
    # (2.5B at sf6.4) — a WHERE on the wrapped subquery is NOT pushed
    # through the DISTINCT by DuckDB, so slice the join's probe side
    # textually when the oracle contains the known m10 predicate: doc_a
    # IS a.doc_id, so per-slice DISTINCT == global DISTINCT restricted
    # to the slice, and the slice union is exactly the original query.
    M10_PRED = "a.doc_id < b.doc_id"

    def sliced(src, tag, is_oracle=False):
        if not part_col:
            return agg(src)
        tot = (0, 0, 0)
        for k in range(parts):
            if is_oracle and M10_PRED in src and part_col == "doc_a":
                s = agg(src.replace(
                    M10_PRED, f"{M10_PRED} AND a.doc_id % {parts} = {k}"))
            else:
                s = agg(src, f'WHERE "{part_col}" % {parts} = {k}')
            print(f"  {tag} slice {k}/{parts}: rows={s[0]}", flush=True)
            tot = tuple(a + b for a, b in zip(tot, s))
        return tot

    got = sliced(f"SELECT * FROM read_parquet([{flist}])", "engine")
    print(f"engine: rows={got[0]} sum1={got[1]} sum2={got[2]}", flush=True)
    want = sliced(sql, "oracle", is_oracle=True)
    print(f"oracle: rows={want[0]} sum1={want[1]} sum2={want[2]}", flush=True)
    if got == want:
        print(f"PASS {query} (checksum mode, {got[0]} rows)")
    else:
        print(f"FAIL {query}: checksum mismatch")
        sys.exit(1)


if __name__ == "__main__":
    main()
