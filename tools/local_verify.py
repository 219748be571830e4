#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness check.

Usage: python3 tools/local_verify.py <outDir> <sfDir> [name ...]

Reads each <outDir>/<name> parquet dump produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name + rows by all columns, and compares
values. Dev-only tooling — the engine itself never depends on this.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    # stringify unhashable cells (arrays) defensively
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_nooracle = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(d + "/*.parquet")],
                             ignore_index=True)
        if name not in oracle:
            print(f"[no-oracle] {name}: rows={len(spark_df)}")
            n_nooracle += 1
            continue
        try:
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL-oracle-sql] {name}: {e}")
            n_fail += 1
            continue
        try:
            a, b = norm(spark_df), norm(ora_df)
        except Exception as e:
            print(f"[FAIL-norm] {name}: {e}")
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"[FAIL-schema] {name}: spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"[FAIL-rows] {name}: spark={len(a)} oracle={len(b)}")
            n_fail += 1
        else:
            diff_cols = []
            for c in a.columns:
                av, bv = a[c], b[c]
                try:
                    import numpy as np
                    # Driver hashes stringified values, so an int64 Spark
                    # column vs a float64 oracle column (DuckDB HUGEINT →
                    # pandas float) hash-mismatches even when values are
                    # numerically equal (5 vs 5.0). Mirror that: a kind
                    # mismatch between integer and float is a FAIL here too.
                    kinds = {av.dtype.kind, bv.dtype.kind}
                    if kinds == {'i', 'f'} or kinds == {'u', 'f'}:
                        print(f"  [dtype-kind-mismatch] {name}.{c}: "
                              f"spark={av.dtype} oracle={bv.dtype} "
                              f"(driver hash WILL differ even if values match)")
                        eq = False
                    elif av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                        eq = ((av.isna() & bv.isna()) | (av == bv)).all()
                    else:
                        eq = av.astype(str).equals(bv.astype(str))
                except Exception:
                    eq = False
                if not eq:
                    diff_cols.append(c)
            if diff_cols:
                print(f"[FAIL-values] {name}: cols={diff_cols}")
                for c in diff_cols[:2]:
                    m = (a[c].astype(str) != b[c].astype(str))
                    print(f"  {c}: first diffs spark={a[c][m].head(3).tolist()} oracle={b[c][m].head(3).tolist()}")
                n_fail += 1
            else:
                print(f"[pass] {name}: rows={len(a)}")
                n_pass += 1
    print(f"== pass={n_pass} fail={n_fail} no_oracle={n_nooracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
