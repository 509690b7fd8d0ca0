#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against the DuckDB oracle and diff. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only: continue
        try:
            spark_rows = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_fail += 1; continue
        try:
            duck_rows = con.execute(sql).fetchall()
            duck_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        # driver sorts columns by name before hashing values
        si = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        di = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
            n_fail += 1; continue
        a = [tuple(norm(r[i]) for i in si) for r in spark_rows]
        b = [tuple(norm(r[i]) for i in di) for r in duck_rows]
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i, x, y = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(a)} rows differ; first @{i}:")
            print(f"   spark: {x}\n   duck:  {y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
