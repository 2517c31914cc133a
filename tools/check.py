#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet output, and compare
row-by-row (column order normalized by sorting names, exact value equality
including row order). Usage: check.py <sfDir> <verifyOutDir> [query ...]"""
import sys, json, math, glob, time, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
# Per-oracle time budget in seconds (r12 postmortem: two oracle SQLs at
# ~904 s / ~507 s blew the driver's whole correctness gate — the engine was
# green but the artifact came back empty). Any oracle exceeding the budget
# FAILS even when its rows match, so a slow oracle is a red row here long
# before it times out the driver. Override with ORACLE_BUDGET_S=<sec>.
budget_s = float(os.environ.get("ORACLE_BUDGET_S", "60"))
otimes = {}
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

FATAL_TYPES = ("HUGEINT", "UHUGEINT", "TIMESTAMP_NS")

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        # Type lint first: the driver's hash is type-sensitive, so a DuckDB
        # HUGEINT (window SUM) or TIMESTAMP_NS output column fails the gate
        # even when every value matches (round-5 red-row family).
        otypes = {r[0]: r[1] for r in
                  con.execute(f"DESCRIBE ({sql.rstrip().rstrip(';')})").fetchall()}
        bad_types = {c: t for c, t in otypes.items()
                     if any(t.startswith(ft) for ft in FATAL_TYPES)}
        if bad_types:
            print(f"FAIL {name}: oracle output types will hash-mismatch: {bad_types}")
            fails += 1
            continue
        t0 = time.time()
        ocur = con.execute(sql)
        ocols = [c[0] for c in ocur.description]
        orows = ocur.fetchall()
        otimes[name] = time.time() - t0
        if otimes[name] > budget_s:
            print(f"FAIL {name}: oracle SQL took {otimes[name]:.1f}s "
                  f"(budget {budget_s:.0f}s) — gate-blowout risk")
            fails += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        scur = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols = [c[0] for c in scur.description]
        srows = scur.fetchall()
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchall()}
        for c in sorted(set(otypes) & set(stypes)):
            if otypes[c] != stypes[c]:
                print(f"WARN {name}: column {c} type oracle={otypes[c]} spark={stypes[c]}")
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
if otimes:
    slow = sorted(otimes.items(), key=lambda kv: -kv[1])[:5]
    print("\nslowest oracles: " +
          ", ".join(f"{n}={t:.1f}s" for n, t in slow) +
          f"  (total {sum(otimes.values()):.1f}s over {len(otimes)})")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
      f"({len([n for n in oracle if not only or n in only])} oracle-checked)")
sys.exit(1 if fails else 0)
