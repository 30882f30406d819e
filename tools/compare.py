#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare:
run each oracle_sql.json entry in DuckDB over the sf tables, load the
engine's parquet result, sort columns by name, compare cell-by-cell."""
import sys, json, glob, math
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
import os
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver scales are single files; MakeScale output is a Spark
    # directory-of-part-files — glob accordingly
    p = f"{sf_dir}/{t}.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# golden-parquet oracles hardcode the driver's sf0.01 path; when
# checking another scale locally, point them at that scale's pins
sf_name = sf_dir.rstrip("/").split("/")[-1]
fail = 0
for name in sorted(oracle):
    try:
        sql = oracle[name].replace("/golden/sf0.01/", f"/golden/{sf_name}/")
        o = con.execute(sql).df()
        e = pd.concat([pd.read_parquet(p) for p in
                       sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
    except Exception as ex:
        print(f"FAIL {name}: exec error {ex}"); fail += 1; continue
    o = o[sorted(o.columns)]; e = e[sorted(e.columns)]
    if list(o.columns) != list(e.columns):
        print(f"FAIL {name}: cols oracle={list(o.columns)} engine={list(e.columns)}"); fail += 1; continue
    if len(o) != len(e):
        print(f"FAIL {name}: rows oracle={len(o)} engine={len(e)}"); fail += 1; continue
    o = o.reset_index(drop=True); e = e.reset_index(drop=True)
    bad = None
    for c in o.columns:
        oc, ec = o[c], e[c]
        for i, (x, y) in enumerate(zip(oc, ec)):
            ok = (x == y) or (x is None and y is None) \
                 or (isinstance(x, float) and isinstance(y, float)
                     and (math.isnan(x) and math.isnan(y) or x == y)) \
                 or (pd.isna(x) is True and pd.isna(y) is True)
            if not ok:
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} oracle={bad[2]!r} engine={bad[3]!r}"); fail += 1
    else:
        print(f"ok   {name} ({len(o)} rows)")
print(f"\n{len(oracle)-fail}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fail else 0)
