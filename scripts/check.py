#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Reads each parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name on both sides (the driver's documented compare),
and value-compares row by row. Exact match = PASS; float-within-1e-9
mismatch reported as NEAR (would likely FAIL the driver's hash).
"""
import json, math, os, sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
    oracle = json.load(f)

def norm(v):
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def eq(a, b, tol=0.0):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        return tol > 0 and abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y, tol) for x, y in zip(a, b))
    return a == b

names = sorted(os.listdir(OUT_DIR))
n_pass = n_fail = n_rowsonly = 0
for name in names:
    path = os.path.join(OUT_DIR, name)
    if not os.path.isdir(path):
        continue
    if ONLY and name not in ONLY:
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: cannot read result: {e}")
        n_fail += 1
        continue
    if name not in oracle:
        status = "ROWS-ONLY" if got.num_rows > 0 else "ROWS-ONLY-EMPTY!"
        print(f"{status} {name}: {got.num_rows} rows (no oracle)")
        n_rowsonly += 1
        continue
    try:
        want = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    gcols, wcols = sorted(got.column_names), sorted(want.column_names)
    if gcols != wcols:
        print(f"FAIL {name}: columns differ spark={gcols} oracle={wcols}")
        n_fail += 1
        continue
    g = got.select(gcols).to_pylist()
    w = want.select(wcols).to_pylist()
    if len(g) != len(w):
        print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(w)}")
        n_fail += 1
        continue
    bad = None
    near = True
    for i, (gr, wr) in enumerate(zip(g, w)):
        for c in gcols:
            if not eq(gr[c], wr[c]):
                if bad is None:
                    bad = (i, c, gr[c], wr[c])
                if not eq(gr[c], wr[c], tol=1e-9):
                    near = False
    if bad is None:
        print(f"PASS {name}: {len(g)} rows")
        n_pass += 1
    else:
        i, c, gv, wv = bad
        tag = "NEAR" if near else "FAIL"
        print(f"{tag} {name}: row {i} col {c}: spark={gv!r} oracle={wv!r}")
        n_fail += 1
print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
sys.exit(1 if n_fail else 0)
