#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
and compares: columns sorted by name, then row-wise value equality
(both in result order and sorted-row order, since the driver's exact
row policy is unknown — we require BOTH to be safe).

Round-11 self-diagnosing additions, mirroring graft.Verify:
 1. Canonical content hashes. Verify writes <name>.hash.json (md5 over
    canonically stringified rows, in-order and sorted, computed by the
    JVM from the written parquet). We recompute the same two hashes
    from (a) our pyarrow reading of that parquet and (b) the DuckDB
    oracle result, and require all three readings to agree — a future
    driver/repo disagreement then names WHICH reading diverges:
    jvm!=py-spark => reader policy on the same file; spark!=duck =>
    genuine value difference.
 2. HUGEINT/DECIMAL lint. The round-10 driver reds were oracles whose
    bare integer sum() returned DuckDB HUGEINT: fetchall() yields
    Python int (value-equal, so this checker passed) but pandas/arrow
    render decimal128/float64 (so the driver's stringified hash
    diverged). Any oracle output column with a decimal arrow type is
    now a hard FAIL: cast the oracle's output to BIGINT/DOUBLE.
"""
import sys, json, glob, os, hashlib, datetime, math
from decimal import Decimal, ROUND_HALF_EVEN
import duckdb
import pyarrow.parquet as pq


def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    t = pq.read_table(files[0])
    return t


# ---- canonical stringification: MUST mirror graft.Verify.canonCell ----

def canon_big(d):
    if d == 0:
        return "0"
    return format(d.normalize(), "f")


def canon_double(v):
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0:
        return "0"
    if abs(v) >= 1e15:
        # 15 SIGNIFICANT digits half-even, mirroring Verify.canonDouble
        # (printf %e would round HALF_UP on the JVM, half-even here)
        from decimal import Context
        ctx = Context(prec=15, rounding=ROUND_HALF_EVEN)
        # Decimal(float) expands the EXACT binary value — mirrors
        # Verify.canonDouble's `new BigDecimal(d)` seed, so both sides
        # quantize the identical number on any JDK (JDK-4511638-proof).
        return canon_big(ctx.plus(Decimal(v)))
    q = Decimal(v).quantize(Decimal("1e-9"), ROUND_HALF_EVEN)
    return canon_big(q)


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return canon_double(v)
    if isinstance(v, Decimal):
        return canon_big(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S") + f".{v.microsecond:06d}"
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):  # arrow structs come back as dicts
        # NOTE: JVM canonCell renders a STRUCT (Row) as "(a,b)" and a MAP
        # as sorted "{k=v}". pyarrow gives dicts for structs; no gated
        # query outputs map columns, so dict => struct here.
        return "(" + ",".join(canon_cell(x) for x in v.values()) + ")"
    if isinstance(v, tuple):
        return "(" + ",".join(canon_cell(x) for x in v) + ")"
    return str(v)


def canon_rows(rows):
    return ["\x01".join(canon_cell(c) for c in r) for r in rows]


def hashes(row_strs):
    def h(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()
    return h("\n".join(row_strs)), h("\n".join(sorted(row_strs)))


def canon_cmp(cols, rows):
    """sorted-column canonical view for the original equality gate"""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            [tuple(canon_cell(r[i]) for i in order) for r in rows])


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    def fresh_con():
        con = duckdb.connect()
        for tbl in ["region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings"]:
            p = os.path.join(sf_dir, f"{tbl}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
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
            print(f"FAIL {name}: oracle declared but no query output dir")
            n_fail += 1
            continue
        t = load_result(path)
        if t is None:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_cols = t.column_names
        spark_rows = [tuple(row[c] for c in spark_cols) for row in t.to_pylist()]
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)"); continue
        try:
            duck_t = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1
            con = fresh_con()  # internal errors poison the connection
            continue
        duck_cols = duck_t.column_names
        duck_rows = [tuple(row[c] for c in duck_cols)
                     for row in duck_t.to_pylist()]
        # --- HUGEINT/DECIMAL lint: the exact round-10 driver-red class
        dec_cols = [(f.name, str(f.type)) for f in duck_t.schema
                    if str(f.type).startswith("decimal")]
        if dec_cols:
            print(f"FAIL {name}: oracle output has DECIMAL-typed columns "
                  f"{dec_cols} — DuckDB HUGEINT/DECIMAL renders as "
                  f"decimal128/float64 under the driver's pandas/arrow "
                  f"reader (int under fetchall); CAST the oracle output "
                  f"to BIGINT/DOUBLE")
            n_fail += 1
            continue
        sc, sr = canon_cmp(spark_cols, spark_rows)
        dc, dr = canon_cmp(duck_cols, duck_rows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} != {dc}"); n_fail += 1; continue
        ok_order = sr == dr
        ok_sorted = sorted(sr) == sorted(dr)
        # --- canonical hash triangle: jvm (hash.json) / py-spark / duck,
        # all over rows in SPARK column order so they are comparable
        py_spark = hashes(canon_rows(spark_rows))
        col_ix = [duck_cols.index(c) for c in spark_cols]
        py_duck = hashes(canon_rows([[r[i] for i in col_ix]
                                     for r in duck_rows]))
        hash_notes = []
        jvm_path = os.path.join(out_dir, f"{name}.hash.json")
        if os.path.exists(jvm_path):
            with open(jvm_path) as f:
                jvm = json.load(f)
            if (jvm["in_order"], jvm["sorted"]) != py_spark:
                hash_notes.append(
                    f"JVM vs pyarrow READING of the same parquet differs "
                    f"(jvm={jvm['in_order']}/{jvm['sorted']} "
                    f"py={py_spark[0]}/{py_spark[1]}) — reader policy")
        if py_spark != py_duck:
            hash_notes.append(
                f"spark vs duckdb VALUES differ "
                f"(spark={py_spark[0]}/{py_spark[1]} "
                f"duck={py_duck[0]}/{py_duck[1]})")
        if ok_order and ok_sorted and not hash_notes:
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows differ (in-order={ok_order}, "
                  f"sorted={ok_sorted}; spark={len(sr)} duck={len(dr)} rows)")
            for note in hash_notes:
                print(f"  HASH {note}")
            shown = 0
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b and shown < 3:
                    print(f"  row {i}: spark={a}\n         duck ={b}")
                    shown += 1
            if len(sr) != len(dr):
                print(f"  spark head: {sr[:2]}\n  duck head : {dr[:2]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
