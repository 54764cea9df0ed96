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
    # matches window-internal ORDER BYs, which are followed by ')').
    # An ORDER BY followed by LIMIT is SEMANTIC (top-N) — stripping it
    # would change the result set, so keep the SQL unmodified there
    # (the sort is then only LIMIT-sized anyway, no spill concern)
    m = re.search(r"ORDER BY[\sa-zA-Z0-9_,.]+$", sql.rstrip())
    if m and re.search(r"\bLIMIT\b", m.group(0), re.I):
        print("note: trailing ORDER BY kept (LIMIT makes it semantic)", flush=True)
    elif m:
        sql = sql.rstrip()[: m.start()]
        print("note: trailing ORDER BY stripped for the aggregate", flush=True)
    files = sorted(glob.glob(f"{outdir}/{query}/*.parquet"))
    assert files, f"no engine parquet for {query} under {outdir}"
    flist = ", ".join(f"'{f}'" for f in files)

    # column names + TYPES from a LIMIT 0 probe of each side (relation
    # API exposes DuckDB types); the compare concatenates values in
    # SORTED column-name order (the driver's rule)
    eng_rel = con.sql(f"SELECT * FROM read_parquet([{flist}]) LIMIT 0")
    ora_rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    eng_cols = list(eng_rel.columns)
    ora_cols = list(ora_rel.columns)
    eng_types = {c: str(t) for c, t in zip(eng_rel.columns, eng_rel.types)}
    ora_types = {c: str(t) for c, t in zip(ora_rel.columns, ora_rel.types)}
    if sorted(eng_cols) != sorted(ora_cols):
        print(f"FAIL {query}: schema mismatch {sorted(eng_cols)} vs {sorted(ora_cols)}")
        sys.exit(1)

    # numeric type drift (DECIMAL vs DOUBLE, INT vs BIGINT) renders
    # differently as VARCHAR ('1.00' vs '1.0'); when the two sides
    # disagree on a numeric column's type, normalize BOTH so rendering
    # is canonical. Integer-vs-integer drift widens LOSSLESSLY through
    # HUGEINT (a DOUBLE round-trip collapses 64-bit ids above 2^53 —
    # two genuinely different BIGINTs could checksum equal, a false
    # PASS); any drift involving a decimal/float side goes through
    # DOUBLE as before. Identical types keep the exact cast.
    NUMERIC = re.compile(r"^(DECIMAL|U?TINYINT|U?SMALLINT|U?INTEGER|"
                         r"U?BIGINT|HUGEINT|FLOAT|DOUBLE)")
    INTEGRAL = re.compile(r"^(U?TINYINT|U?SMALLINT|U?INTEGER|U?BIGINT|"
                          r"HUGEINT)$")
    norm = {}
    for c in eng_cols:
        if eng_types[c] != ora_types[c]:
            if INTEGRAL.match(eng_types[c]) and INTEGRAL.match(ora_types[c]):
                norm[c] = "HUGEINT"
                print(f"note: {c} type drift {eng_types[c]} vs {ora_types[c]}"
                      " — normalizing via HUGEINT (lossless)", flush=True)
            elif NUMERIC.match(eng_types[c]) and NUMERIC.match(ora_types[c]):
                norm[c] = "DOUBLE"
                print(f"note: {c} type drift {eng_types[c]} vs {ora_types[c]}"
                      " — normalizing via DOUBLE", flush=True)
            else:
                print(f"warn: {c} type drift {eng_types[c]} vs {ora_types[c]}"
                      " (non-numeric, compared as-is)", flush=True)

    part_col = sys.argv[5] if len(sys.argv) > 5 else None
    parts = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    def agg(src, where=""):
        # injective row text: every field is length-prefixed, so a '|'
        # inside a value cannot shift field boundaries, and NULL's
        # marker (chr(1), no length prefix) cannot collide with any
        # prefixed value (those always start with a digit)
        def field(c):
            v = (f'CAST(CAST("{c}" AS {norm[c]}) AS VARCHAR)' if c in norm
                 else f'CAST("{c}" AS VARCHAR)')
            return (f"COALESCE(CAST(length({v}) AS VARCHAR) || ':' || {v},"
                    f" chr(1))")
        row = "concat_ws('|', " + ", ".join(
            field(c) for c in sorted(eng_cols)) + ")"
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
    # v23's analogue: `dropped` is a DISTINCT over c.cid (the output's
    # vec_id), so slicing the pair join's c side restricts `dropped` to
    # exactly the slice's ids — combined with the outer WHERE on vec_id
    # the per-slice result equals the full result restricted to the
    # slice (survivorship of a vid depends only on dropped ∩ its own
    # slice). This bounds the within-cell candidate explosion's memory
    # per slice; counts/checksums stay commutative over the partition.
    V23_PRED = "q.cell = c.cell AND q.cid < c.cid"

    def sliced(src, tag, is_oracle=False):
        if not part_col:
            return agg(src)
        # slice on abs(col) so negative values land in a real slice
        # (DuckDB % keeps sign: -3 % 8 = -3, matching no k), plus an
        # explicit IS NULL slice (NULL % p is NULL) — together the
        # slices partition ALL rows, so no row escapes the compare.
        # The textual m10/v23 paths need no NULL slice: m10 rows already
        # pass `a.doc_id < b.doc_id` (NULL can't), and v23's vec_id is
        # corp.cid — non-null by the joins that build it (a NULL outer
        # row would also re-run the FULL un-sliced pair join, defeating
        # the slicing).
        tot = (0, 0, 0)
        v23 = is_oracle and V23_PRED in src and part_col == "vec_id"
        m10 = is_oracle and M10_PRED in src and part_col == "doc_a"
        for k in range(parts):
            if m10:
                s = agg(src.replace(
                    M10_PRED, f"{M10_PRED} AND abs(a.doc_id) % {parts} = {k}"))
            elif v23:
                s = agg(src.replace(
                    V23_PRED, f"{V23_PRED} AND abs(c.cid) % {parts} = {k}"),
                    f'WHERE abs("vec_id") % {parts} = {k}')
            else:
                s = agg(src, f'WHERE abs("{part_col}") % {parts} = {k}')
            print(f"  {tag} slice {k}/{parts}: rows={s[0]}", flush=True)
            tot = tuple(a + b for a, b in zip(tot, s))
        if not (m10 or v23):
            s = agg(src, f'WHERE "{part_col}" IS NULL')
            if s[0]:
                print(f"  {tag} NULL slice: rows={s[0]}", flush=True)
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
        for c in sorted(eng_cols):
            mark = "" if eng_types[c] == ora_types[c] else "   <-- type drift"
            print(f"  {c}: engine {eng_types[c]} vs oracle {ora_types[c]}{mark}")
        sys.exit(1)


if __name__ == "__main__":
    main()
