#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare against the Verify parquet output
(columns sorted by name, rows sorted, exact values)."""
import sys, json, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, okc = [], 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no result parquet"))
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        fails.append((name, f"columns differ: {list(g.columns)} vs "
                            f"{list(w.columns)}"))
        continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    if len(gs) != len(ws):
        fails.append((name, f"row count {len(gs)} vs {len(ws)}"))
        continue
    # exact compare cell-by-cell via string repr (matches hash semantics)
    mism = None
    for c in gs.columns:
        a = gs[c].astype(str).tolist()
        b = ws[c].astype(str).tolist()
        if a != b:
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    mism = f"col {c} row {i}: {x!r} vs {y!r}"
                    break
            break
    if mism:
        fails.append((name, mism))
    else:
        okc += 1
        print(f"OK   {name} ({len(gs)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{okc}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fails else 0)
