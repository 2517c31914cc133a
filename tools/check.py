#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet output, and compare
row-by-row (column order normalized by sorting names, exact value equality
including row order). Usage: check.py <sfDir> <verifyOutDir> [query ...]"""
import sys, json, math, glob
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        ocur = con.execute(sql)
        ocols = [c[0] for c in ocur.description]
        orows = ocur.fetchall()
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        scur = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols = [c[0] for c in scur.description]
        srows = scur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1; continue
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}"); fails += 1; continue
    operm = [ocols.index(c) for c in sorted(ocols)]
    sperm = [scols.index(c) for c in sorted(scols)]
    orows = [tuple(norm(r[i]) for i in operm) for r in orows]
    srows = [tuple(norm(r[i]) for i in sperm) for r in srows]
    if len(orows) != len(srows):
        print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}"); fails += 1; continue
    bad = None
    for i, (a, b) in enumerate(zip(orows, srows)):
        if a != b:
            bad = (i, a, b); break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]}:\n  oracle={bad[1]}\n  spark ={bad[2]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(orows)} rows)")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
      f"({len([n for n in oracle if not only or n in only])} oracle-checked)")
sys.exit(1 if fails else 0)
