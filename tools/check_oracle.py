#!/usr/bin/env python3
"""Local replica of the driver's t2 check: run each oracle SQL in DuckDB
over the sf parquet tables, compare against the Verify parquet dumps.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = os.path.join(out, name)
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM parquet_scan('{res_dir}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: cols {gc} vs {wc}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1; continue
    eq = g.equals(w)
    if not eq:
        # locate first mismatch; dtype mismatches (e.g. DuckDB HUGEINT ->
        # float64 vs Spark int64) make g != w throw or idxmax misbehave —
        # a locator failure must still report FAIL, not crash the checker
        try:
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            i = bad.idxmax() if bad.any() else None
            detail = (f"at row {i}:\n got {g.loc[i].to_dict()}\nwant {w.loc[i].to_dict()}"
                      if i is not None else
                      f"(values equal elementwise but dtypes differ: got {dict(g.dtypes.astype(str))} vs want {dict(w.dtypes.astype(str))})")
        except Exception as e:
            detail = f"(locator failed: {e}; dtypes got {dict(g.dtypes.astype(str))} vs want {dict(w.dtypes.astype(str))})"
        print(f"FAIL {name}: value mismatch {detail}")
        fails += 1; continue
    # row-order check (driver hash may be order-sensitive)
    ordered = got[gc].reset_index(drop=True).equals(want[wc].reset_index(drop=True))
    print(f"PASS {name} ({len(g)} rows{'', ' ORDER-DIFFERS'}[not ordered])" if False else
          f"PASS {name} ({len(g)} rows{'' if ordered else ' ORDER-DIFFERS'})")
print(f"{'OK' if fails == 0 else 'FAILURES'}: {len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
