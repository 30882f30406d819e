#!/usr/bin/env python3
"""Full-inventory sf1 confidence gate (round-13 verdict task 9).

Same cell-exact DuckDB compare as tools/compare.py, over the synthetic
/tmp/sf1 corpus (graft.MakeScale 10), with the two documented exclusion
classes:

  * golden-pinned queries — their oracles read per-sf golden parquet
    that exists only at the three driver scales (the q47 limitation,
    documented since round 8);
  * the six 20-iteration graph CTEs (pagerank/bfs/kcore family) —
    impractical to replay in DuckDB at 6M rows; certified at driver
    scales + linear 10x/20x probes instead.

Everything else runs, with a per-query DuckDB timeout so one
pathological replay cannot stall the sweep; timeouts are reported,
not hidden.
"""
import sys, json, glob, math, os, threading
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TIMEOUT_S = int(os.environ.get("SF1_ORACLE_TIMEOUT", "600"))

GRAPH_CTES = {  # iterated graph fixed points; DuckDB-impractical at 6M rows
    # (every excluded family has a 1/16-subsampled sf1 TWIN that DOES
    # run here: q375 pagerank, q376 bfs, q380 triangles, q381 kcore,
    # q382 sssp, q383 lpa — certified cross-engine at this scale)
    "q125_pagerank", "q132_pagerank_weighted", "q140_bfs",
    "q141_pagerank_push", "q142_pagerank_dangling", "q143_kcore",
    "q179_sssp",
    # unrolled LPA over the 6M-row bipartite pair graph: the oracle
    # replay ran past the 600 s DuckDB budget in the round-13 sweep
    # (certified at driver scales like the rest of the graph family)
    "q263_modularity",
}

MERGE_REPLAYS = {  # oracle-impractical full-corpus merge replays at sf1
    # q334: the 3.2M-row signature-pin self-join spilled >59 GB and
    # blew the 600 s budget (round-14); q341: same class via the
    # winnow-pin pair join + recursive closure. Both families are
    # certified at sf1 by their 1/16-subsampled twins (q385, q384),
    # whose oracles replay the SAME rules on the filtered pins.
    "q334_neardup_merge", "q341_winnow_groups",
}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

ok, fail, skipped, timeout = 0, [], [], []
# round-14 task 3: golden pins CAN exist at the synthetic sf1 corpus
# (the hash-defined queries are deterministic given the corpus) —
# point SF1_GOLDEN_DIR at a `graft.MakeGolden <sf1_dir> <pins>` output
# and the golden-pinned queries join the gate instead of being skipped
GOLDEN_DIR = os.environ.get("SF1_GOLDEN_DIR")
import re as _re
for name in sorted(oracle):
    sql = oracle[name]
    if "/golden/" in sql:
        # a query is runnable when EVERY golden table its oracle reads
        # has an sf1 pin (q327 reads q326's pin without being pinned
        # itself)
        refs = _re.findall(r"/root/repo/golden/sf[0-9.]+/(\w+)/", sql)
        if GOLDEN_DIR and refs and all(
                os.path.isdir(os.path.join(GOLDEN_DIR, r)) for r in refs):
            sql = _re.sub(r"/root/repo/golden/sf[0-9.]+/",
                          GOLDEN_DIR.rstrip("/") + "/", sql)
        else:
            skipped.append((name, "golden-pinned"))
            continue
    if name in GRAPH_CTES or any(g.split("_")[0] == name.split("_")[0]
                                 for g in GRAPH_CTES):
        skipped.append((name, "graph-CTE"))
        continue
    if name in MERGE_REPLAYS:
        skipped.append((name, "merge-replay (twin-covered)"))
        continue
    timer = threading.Timer(TIMEOUT_S, con.interrupt)
    timer.start()
    try:
        o = con.execute(sql).df()
        timer.cancel()
    except Exception as ex:
        timer.cancel()
        if "INTERRUPT" in str(ex).upper():
            timeout.append(name)
            print(f"TIMEOUT {name} (> {TIMEOUT_S}s in DuckDB)")
        else:
            fail.append(name)
            print(f"FAIL {name}: oracle exec error {ex}")
        continue
    try:
        e = pd.concat([pd.read_parquet(p) for p in
                       sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
    except Exception as ex:
        fail.append(name)
        print(f"FAIL {name}: engine read error {ex}")
        continue
    o = o[sorted(o.columns)]
    e = e[sorted(e.columns)]
    if list(o.columns) != list(e.columns):
        fail.append(name)
        print(f"FAIL {name}: cols oracle={list(o.columns)} "
              f"engine={list(e.columns)}")
        continue
    if len(o) != len(e):
        fail.append(name)
        print(f"FAIL {name}: rows oracle={len(o)} engine={len(e)}")
        continue
    o = o.reset_index(drop=True)
    e = e.reset_index(drop=True)
    bad = None
    for c in o.columns:
        for i, (x, y) in enumerate(zip(o[c], e[c])):
            same = (x == y) or (x is None and y is None) \
                or (isinstance(x, float) and isinstance(y, float)
                    and (math.isnan(x) and math.isnan(y) or x == y)) \
                or (pd.isna(x) is True and pd.isna(y) is True)
            if not same:
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        fail.append(name)
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} "
              f"oracle={bad[2]!r} engine={bad[3]!r}")
    else:
        ok += 1
        print(f"ok   {name} ({len(o)} rows)")

print(f"\nchecked {ok} ok / {len(fail)} fail / {len(timeout)} timeout; "
      f"{len(skipped)} skipped "
      f"({sum(1 for _, r in skipped if r == 'golden-pinned')} golden, "
      f"{sum(1 for _, r in skipped if r == 'graph-CTE')} graph, "
      f"{sum(1 for _, r in skipped if r.startswith('merge-replay'))} merge-replay)")
if fail:
    print("failures:", ", ".join(fail))
if timeout:
    print("timeouts:", ", ".join(timeout))
sys.exit(1 if fail else 0)
