#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify's parquet
dumps + oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
and compares schema + values (columns sorted by name, rows sorted)."""
import json, math, sys
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
# a filtered Verify run ("--present") compares only the dumped subset
if "--present" in sys.argv:
    import os
    oracles = {k: v for k, v in oracles.items() if os.path.isdir(f"{OUT}/{k}")}

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append("%.9g" % v if not math.isnan(v) else "nan")
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out)

fails, okс = [], 0
ok = 0
for name, sql in sorted(oracles.items()):
    try:
        spark_rel = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        duck_rel = con.execute(sql)
        dcols = [d[0] for d in duck_rel.description]
        drows = duck_rel.fetchall()
    except Exception as e:
        fails.append((name, f"EXEC: {e}"))
        continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"SCHEMA: spark={sorted(scols)} duck={sorted(dcols)}"))
        continue
    # reorder both by sorted column name
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    s = norm([[r[i] for i in sidx] for r in srows])
    d = norm([[r[i] for i in didx] for r in drows])
    if len(s) != len(d):
        fails.append((name, f"ROWS: spark={len(s)} duck={len(d)}"))
    elif s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
        fails.append((name, f"VALUES: first diffs {diff}"))
    else:
        ok += 1
print(f"PASS {ok}/{len(oracles)}")
for name, msg in fails:
    print(f"FAIL {name}: {msg[:400]}")
# rows-only queries: just check they produced output
import glob, os
for d in sorted(glob.glob(f"{OUT}/q*")):
    name = os.path.basename(d)
    if name not in oracles:
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f"ROWS-ONLY {name}: {n} rows")
sys.exit(1 if fails else 0)
