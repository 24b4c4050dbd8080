#!/usr/bin/env python3
"""Self-test for check.py's oracle-typing lint (the bug class that cost
rows in rounds 3-5): builds a probe query whose Spark result is int64 but
whose oracle SQL is a bare DuckDB sum(BIGINT) (HUGEINT -> decimal128), and
asserts the gate goes RED with the lint message, not green via the
value-lenient compare. Run: python3 tools/lint_selftest.py"""
import json, os, subprocess, sys, tempfile
import pyarrow as pa, pyarrow.parquet as pq

d = tempfile.mkdtemp(prefix="lint_probe_")
os.makedirs(f"{d}/q_probe")
pq.write_table(pa.table({"s": pa.array([4950], type=pa.int64())}),
               f"{d}/q_probe/part-0.parquet")
# deliberately UNCAST: DuckDB types this HUGEINT
json.dump({"q_probe": "SELECT sum(CAST(x AS BIGINT)) AS s FROM range(100) t(x)"},
          open(f"{d}/oracle_sql.json", "w"))
r = subprocess.run([sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
                    "/root/testdata/sf0.001", d], capture_output=True, text=True)
out = r.stdout
ok = (r.returncode != 0) and ("ORACLE TYPE LINT" in out) and ("q_probe" in out)
print(out.strip())
print("LINT SELFTEST:", "PASS (probe correctly rejected)" if ok else "FAIL")
sys.exit(0 if ok else 1)
