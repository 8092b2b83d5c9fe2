#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/parity.py <verify_out_dir> <sf_dir>

For each query parquet in <verify_out_dir> that has an entry in
oracle_sql.json: run the oracle SQL in DuckDB over the sf tables, then
compare against the Spark result — columns sorted by name, rows sorted,
values compared exactly. Prints PASS/FAIL per query with a diff preview.
"""
import json, os, sys
import duckdb

def norm_cell(v):
    if isinstance(v, float):
        return v  # exact compare on purpose: parity must be bit-identical
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v

def table_of(cur):
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, data

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            duck_cols, duck_rows = table_of(con.execute(oracle[name]))
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        spark_cols, spark_rows = table_of(con.execute(
            f"SELECT * FROM '{pq}/*.parquet'"))
        if duck_cols != spark_cols:
            print(f"FAIL     {name}: columns differ spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        if duck_rows == spark_rows:
            print(f"PASS     {name} ({len(duck_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL     {name}: rows differ spark={len(spark_rows)} duck={len(duck_rows)}")
            sset, dset = set(spark_rows), set(duck_rows)
            for r in list(sset - dset)[:3]:
                print(f"         spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"         duck-only:  {r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))]) - len(oracle)} rows-only (no oracle)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
