#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle
SQL in DuckDB against the sfDir tables, load the Spark parquet dump,
sort columns by name, and compare row-by-row (exact for ints/strings,
bitwise for floats).
Usage: compare_oracle.py <sfDir> <verifyOutDir> [--skip q1,q2,...]
(--skip for oracles that are O(n^2) in DuckDB at large SF: q17/q33)"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
skip = set()
extra = sys.argv[3:]
if extra:
    if extra[0] != "--skip" or len(extra) != 2:
        sys.exit(f"usage: compare_oracle.py <sfDir> <outDir> "
                 f"[--skip q1,q2,...]; got extra args {extra}")
    skip = set(extra[1].split(","))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
unknown = skip - oracle.keys()
if unknown:
    sys.exit(f"--skip names not in the oracle set: {sorted(unknown)}")
for name in skip:
    del oracle[name]
fail = 0
for name, sql in sorted(oracle.items()):
    # cheap check first: a scoped Verify run leaves most queries
    # without output — don't pay their (sometimes O(n^2)) oracles
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = duckdb.connect().execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1; continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    # row order: both sides ORDER BY'd; compare positionally
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (e, g) in enumerate(zip(ev, gv)):
            if isinstance(e, float) or isinstance(g, float):
                if not (e == g or (math.isnan(e) and math.isnan(g))):
                    bad = (c, i, e, g, "float", abs(e-g)); break
            elif e != g:
                bad = (c, i, e, g, "val", None); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[3]!r} oracle={bad[2]!r} delta={bad[5]}")
        fail += 1
    else:
        print(f"OK   {name}: {len(exp)} rows")
print(f"{'PASS' if fail==0 else 'FAIL'}: {len(oracle)-fail}/{len(oracle)} oracle queries match")
sys.exit(1 if fail else 0)
