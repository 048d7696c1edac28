#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet under OUTDIR, run the matching oracle SQL in DuckDB over the sf
tables and compare (column names sorted, row multiset, fuzzy float eq)."""
import sys, os, json, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # tolerate ScaleData-generated dirs: partitioned layout, subset of tables
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracles.items()):
    try:
        res = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_rows, got_cols = norm(res.fetchall(), res.columns)
        exp = con.sql(sql)
        # the driver compares through pandas, where HUGEINT/DECIMAL become
        # float64 and render "3.0" vs Spark's "3" -> silent hash mismatch.
        # Catch that class here: oracle SQL must emit driver-stable types.
        hostile = [(c, str(t)) for c, t in zip(exp.columns, exp.types)
                   if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
        if hostile:
            print(f"FAIL {name}: pandas-hostile oracle column types {hostile} — CAST to BIGINT/DOUBLE")
            fails += 1
            continue
        exp_rows, exp_cols = norm(exp.fetchall(), exp.columns)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}"); fails += 1
        elif got_rows != exp_rows:
            diff = [(a, b) for a, b in zip(got_rows, exp_rows) if a != b][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows; first diffs: {diff}")
            fails += 1
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {str(e)[:200]}"); fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
