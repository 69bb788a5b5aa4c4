#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same sf dir and compare
(column-name-sorted, row-sorted) values. Usage:
    python3 scripts/check.py /tmp/verify_r1 /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").df()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    if got.dtypes.to_dict() != exp.dtypes.to_dict():
        print(f"WARN {name}: dtypes {got.dtypes.to_dict()} vs {exp.dtypes.to_dict()}")
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(gs) != len(es):
        print(f"FAIL {name}: rows {len(gs)} vs {len(es)}"); fails += 1; continue
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        print(f"OK   {name} ({len(gs)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
