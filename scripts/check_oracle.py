#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: run graft.Verify output against DuckDB.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
Mirrors the driver's compare: per query, load the Spark parquet result and the
DuckDB oracle result, sort columns by name and rows by value, compare.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
failures = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result")
        failures += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    exp = con.execute(sql).fetchdf()
    gcols = sorted(got.columns)
    ecols = sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: schema {gcols} != {ecols}")
        failures += 1
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        failures += 1
        continue
    # value compare (string-normalized, so int32/int64 mismatch surfaces as ok)
    mismatch = None
    for c in gcols:
        gv = g[c].astype(str).tolist()
        ev = e[c].astype(str).tolist()
        if gv != ev:
            bad = next(i for i, (a, b) in enumerate(zip(gv, ev)) if a != b)
            mismatch = (c, bad, gv[bad], ev[bad])
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={a} oracle={b}")
        failures += 1
    else:
        print(f"OK   {name}: {len(g)} rows")
# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(d)
    if name not in oracle and os.path.isdir(d):
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        if n == 0:
            failures += 1
print(f"\n{failures} failures")
sys.exit(1 if failures else 0)
