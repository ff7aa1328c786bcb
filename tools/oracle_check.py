#!/usr/bin/env python3
"""Dev-only single-query oracle check mirroring the driver's compare:
runs the named queries' DuckDB oracle SQL over the sf parquet tables and
diffs rows/schema/value-hash against the Spark parquet that
`runMain graft.Verify <sfDir> <outDir> <names...>` already wrote.

Usage: tools/oracle_check.py <sfDir> <outDir> <name> [<name> ...]
NOT part of the Spark library (driver-side python only).
"""
import duckdb, json, sys, glob, os, hashlib

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/**/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()

fail = 0
for name in names:
    sql = oracles.get(name)
    if sql is None:
        print(f"{name}: NO ORACLE (rows-only)")
        continue
    o = con.execute(sql)
    ocols = [d[0] for d in o.description]
    orows = o.fetchall()
    files = glob.glob(os.path.join(out_dir, f"{name}.parquet", "*.parquet"))
    s = con.execute(f"SELECT * FROM read_parquet({files!r})")
    scols = [d[0] for d in s.description]
    srows = s.fetchall()
    rows_ok = len(orows) == len(srows)
    schema_ok = sorted(ocols) == sorted(scols)
    hash_ok = schema_ok and canon(orows, ocols) == canon(srows, scols)
    status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fail += 1
    print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
          f"schema={schema_ok} hash={hash_ok}")
    if not schema_ok:
        print(f"  spark cols:  {sorted(scols)}")
        print(f"  oracle cols: {sorted(ocols)}")
sys.exit(1 if fail else 0)
