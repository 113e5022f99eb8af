#!/usr/bin/env python3
"""Dev-loop correctness harness (mimics the driver's DuckDB oracle compare).

Usage: python3 dev/check.py <verifyOutDir> <sfDir>

Reads oracle_sql.json from the verify output dir, registers each testdata
parquet as a DuckDB view, runs each oracle, and compares it cell-by-cell with
the Spark-written parquet result. NOT part of the library — local dev only.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if isinstance(a, (int, float)) or isinstance(b, (int, float)):
            return a == b and type(a) == type(b) or a == b
    except Exception:
        pass
    return a == b

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        worder = sorted(range(len(wcols)), key=lambda i: wcols[i])
        gorder = sorted(range(len(gcols)), key=lambda i: gcols[i])
        wc = [wcols[i] for i in worder]
        gc = [gcols[i] for i in gorder]
        if wc != gc:
            print(f"FAIL {name}: columns differ: oracle={wc} spark={gc}")
            n_fail += 1
            continue
        # type drift warning via Arrow schemas (driver reports schema
        # match separately; DBAPI description is too coarse)
        try:
            ws = con.execute(sql).fetch_arrow_table().schema
            gs = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table().schema
            wt = {f.name: str(f.type) for f in ws}
            gt = {f.name: str(f.type) for f in gs}
            for cn in wc:
                if wt.get(cn) != gt.get(cn):
                    print(f"  WARN {name}.{cn}: oracle type {wt.get(cn)} vs spark {gt.get(cn)}")
        except Exception as e:
            print(f"  WARN {name}: type check failed: {e}")
        if len(wrows) != len(grows):
            print(f"FAIL {name}: row count differ: oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        bad = None
        for ri, (wr, gr) in enumerate(zip(wrows, grows)):
            for ci in range(len(wc)):
                a, b = wr[worder[ci]], gr[gorder[ci]]
                if not eq(a, b):
                    bad = (ri, wc[ci], a, b)
                    break
            if bad:
                break
        if bad:
            ri, cn, a, b = bad
            print(f"FAIL {name}: first diff row {ri} col {cn}: oracle={a!r} ({type(a).__name__}) spark={b!r} ({type(b).__name__})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(wrows)} rows, {len(wc)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
