#!/usr/bin/env python3
"""Replicates the driver's correctness gate locally (dev tool only; the
shipped library has no Python dependency).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query parquet written by graft.Verify, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB over the same sfDir tables and
compares: row count, column names, and a hash of all values after sorting
columns by name and rows by all columns.
"""
import json, sys, math
import duckdb

def canon(rows, cols):
    # sort columns by name; round floats to kill representation noise
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            if isinstance(v, (bytes, bytearray)):
                v = v.hex()
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "orders", "customer",
              "supplier", "part", "nation", "region", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        if name not in oracle:
            status = f"ROWS-ONLY rows={len(srows)}"
            print(f"  {name:24s} {status}")
            continue
        try:
            orel = con.execute(oracle[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"  {name:24s} ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_hash = ok_cols and ok_rows and canon(srows, scols) == canon(orows, ocols)
        if ok_hash:
            n_pass += 1
            print(f"  {name:24s} PASS rows={len(srows)}")
        else:
            n_fail += 1
            print(f"  {name:24s} FAIL cols={ok_cols} ({sorted(scols)} vs "
                  f"{sorted(ocols)}) rows={len(srows)}/{len(orows)}")
            if ok_cols and ok_rows:
                a = canon(srows, scols); b = canon(orows, ocols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"    spark:  {x}\n    oracle: {y}")
    print(f"PASS={n_pass} FAIL={n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
