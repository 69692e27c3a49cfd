#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare values column-name-sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def table_key(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for row in rows:
        out.append(tuple(norm(row[i]) for i in order))
    return [names[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_RESULT"
            continue
        st = pq.read_table(files[0])
        s_names = st.column_names
        s_rows = [tuple(r[c] for c in s_names) for r in st.to_pylist()]
        try:
            d = con.execute(sql)
            d_names = [c[0] for c in d.description]
            d_rows = d.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        sn, sr = table_key(s_names, s_rows)
        dn, dr = table_key(d_names, d_rows)
        if sn != dn:
            results[name] = f"SCHEMA_MISMATCH spark={sn} duck={dn}"
        elif len(sr) != len(dr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diff = next(i for i in range(len(sr)) if sr[i] != dr[i])
            results[name] = f"VALUE_MISMATCH first at row {diff}: spark={sr[diff]} duck={dr[diff]}"
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, r in sorted(results.items()):
        mark = "PASS" if r == "OK" else "FAIL"
        print(f"{mark} {name}" + ("" if r == "OK" else f"  -> {r[:400]}"))
    print(f"\n{n_ok}/{len(results)} queries match")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
