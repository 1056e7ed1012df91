#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
and compares: columns sorted by name, then row-wise value equality
(both in result order and sorted-row order, since the driver's exact
row policy is unknown — we require BOTH to be safe).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    t = pq.read_table(files[0])
    return t

def canon_cell(v):
    # pandas.Timestamp vs datetime.datetime repr differently but compare
    # equal; normalize for the sorted-row comparison
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(canon_cell(r[i]) for i in order) for r in rows]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    def fresh_con():
        con = duckdb.connect()
        for tbl in ["region","nation","customer","supplier","part","orders",
                    "lineitem","events","documents","embeddings"]:
            p = os.path.join(sf_dir, f"{tbl}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
        return con
    con = fresh_con()
    n_pass = n_fail = 0
    # union of produced dirs and declared oracles: a query that dies
    # before writing its dir must FAIL, not silently vanish
    names = sorted(set(d for d in os.listdir(out_dir)
                       if os.path.isdir(os.path.join(out_dir, d))) | set(oracles))
    for name in names:
        path = os.path.join(out_dir, name)
        if only and name not in only:
            continue
        if not os.path.isdir(path):
            print(f"FAIL {name}: oracle declared but no query output dir"); n_fail += 1
            continue
        t = load_result(path)
        if t is None:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_cols = t.column_names
        spark_rows = [tuple(row[c] for c in spark_cols) for row in t.to_pylist()]
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)"); continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1
            con = fresh_con()  # internal errors poison the connection
            continue
        sc, sr = canon(spark_cols, spark_rows)
        dc, dr = canon(duck_cols, duck_rows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} != {dc}"); n_fail += 1; continue
        ok_order = sr == dr
        ok_sorted = sorted(map(repr, sr)) == sorted(map(repr, dr))
        if ok_order and ok_sorted:
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows differ (in-order={ok_order}, sorted={ok_sorted}; "
                  f"spark={len(sr)} duck={len(dr)} rows)")
            shown = 0
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b and shown < 3:
                    print(f"  row {i}: spark={a}\n         duck ={b}"); shown += 1
            if len(sr) != len(dr):
                print(f"  spark head: {sr[:2]}\n  duck head : {dr[:2]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
