#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
Runs each oracle_sql.json query in DuckDB over the sf parquet tables,
loads the Spark result parquet, sorts columns by name and rows by value,
and reports row/schema/value match per query.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
names = sorted(set(list(oracle) + [os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)]))
for name in names:
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"  {name}: MISSING spark result"); fails += 1; continue
    files = glob.glob(f"{spark_dir}/*.parquet")
    st = pq.read_table(files[0]) if files else None
    if name not in oracle:
        n = st.num_rows if st is not None else 0
        print(f"  {name}: rows-only check, rows={n} {'OK' if n>0 else 'FAIL'}")
        if n == 0: fails += 1
        continue
    try:
        dt = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"  {name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    scols = sorted(st.column_names); dcols = sorted(dt.column_names)
    if scols != dcols:
        print(f"  {name}: SCHEMA MISMATCH spark={scols} duck={dcols}"); fails += 1; continue
    # Oracle-typing lint: DuckDB silently widens integer aggregates (sum(BIGINT)
    # -> HUGEINT -> arrow decimal128). check.py's Python-value compare passes
    # (Decimal == int) but the driver's hash is type-sensitive and goes red.
    # This cost rows in rounds 3, 4 and 5 — make it impossible to reintroduce:
    # hard-fail whenever the oracle column is decimal while Spark's is integral.
    import pyarrow.types as pat
    lint_bad = []
    for c in scols:
        sty = st.schema.field(c).type; dty = dt.schema.field(c).type
        if pat.is_decimal(dty) and pat.is_integer(sty):
            lint_bad.append(f"{c}: duck={dty} vs spark={sty} — add CAST(... AS BIGINT) in oracle SQL")
        elif str(sty) != str(dty) and not (pat.is_floating(sty) and pat.is_floating(dty)):
            print(f"  {name}: type-warn {c}: spark={sty} duck={dty}")
    if lint_bad:
        print(f"  {name}: ORACLE TYPE LINT: " + "; ".join(lint_bad)); fails += 1; continue
    if st.num_rows != dt.num_rows:
        print(f"  {name}: ROWCOUNT spark={st.num_rows} duck={dt.num_rows}"); fails += 1; continue
    def norm(t):
        rows = [tuple(t.column(c)[i].as_py() for c in scols) for i in range(t.num_rows)]
        def k(r):
            return tuple((x is None, str(x)) for x in r)
        return sorted(rows, key=k)
    sr, dr = norm(st), norm(dt)
    bad = [(a, b) for a, b in zip(sr, dr) if a != b]
    if bad:
        print(f"  {name}: VALUE MISMATCH ({len(bad)}/{len(sr)} rows) e.g. spark={bad[0][0]} duck={bad[0][1]}")
        fails += 1
    else:
        print(f"  {name}: OK ({st.num_rows} rows)")
print("FAIL" if fails else "ALL OK")
sys.exit(1 if fails else 0)
