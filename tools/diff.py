#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB differential oracle (t2).

Usage: python3 tools/diff.py [sfDir] [outDir] [only_query ...]

Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/
oracle_sql.json, runs each oracle SQL in DuckDB over the sfDir tables,
sorts columns by name (as the driver does), and compares row count,
schema (loosely), and exact values. Prints PASS/FAIL per query.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            srel = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            scols = [d[0] for d in srel.description]
            srows = srel.fetchall()
            orel = con.execute(sql)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            nfail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            nfail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            nfail += 1
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        bad = None
        for i, (sr, orr) in enumerate(zip(srows, orows)):
            sv = [canon(sr[j]) for j in sidx]
            ov = [canon(orr[j]) for j in oidx]
            if sv != ov:
                bad = (i, list(zip(sorted(scols), sv, ov)))
                break
        if bad:
            i, detail = bad
            mism = [(c, a, b) for c, a, b in detail if a != b]
            print(f"FAIL {name}: row {i} mismatch: {mism[:4]}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
