#!/usr/bin/env python3
"""Single-query slice of oracle_check.py with a DuckDB resource budget —
run per query from a driver loop so one exploding oracle SQL is an
isolated, attributable failure (timeout/OOM) instead of taking the
whole sweep down.

Usage: oracle_check_one.py <sfDir> <verifyOutDir> <queryName> [memLimit]
Env:   GRAFT_DUCKDB_TMP   spill directory (default: <verifyOutDir>/duckdb_tmp
                          — out-of-core operators spill there instead of
                          failing at the memory cap)
       GRAFT_DUCKDB_THREADS  worker threads (default: duckdb's own default)
Prints one line: "<name>\t<STATUS>[\t<detail>]"

Note the comparison itself is DuckDB-native hashing-free sort+diff over
pandas; the RESOURCE knobs only bound the oracle SQL evaluation.
"""
import glob
import json
import os
import sys

import duckdb

sfdir, outdir, name = sys.argv[1], sys.argv[2], sys.argv[3]
mem = sys.argv[4] if len(sys.argv) > 4 else "24GB"
con = duckdb.connect()
con.sql(f"SET memory_limit='{mem}'")
tmp = os.environ.get("GRAFT_DUCKDB_TMP", os.path.join(outdir, "duckdb_tmp"))
os.makedirs(tmp, exist_ok=True)
con.sql(f"SET temp_directory='{tmp}'")
threads = os.environ.get("GRAFT_DUCKDB_THREADS")
if threads:
    con.sql(f"SET threads={int(threads)}")
# Row order is irrelevant (the compare sorts); dropping insertion-order
# preservation lets DuckDB stream/spill large aggregations instead of
# buffering them, which is the difference between finishing and OOM on
# the heaviest composed twins at the 10x fixture.
if os.environ.get("GRAFT_DUCKDB_NO_ORDER"):
    con.sql("SET preserve_insertion_order=false")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
sql = json.load(open(f'{outdir}/oracle_sql.json'))
p = os.path.join(outdir, name)
files = glob.glob(f'{p}/*.parquet')
if not files:
    print(f"{name}\tNO_OUTPUT"); sys.exit(0)
if name not in sql:
    n = con.sql(f"select count(*) from '{p}/*.parquet'").fetchone()[0]
    print(f"{name}\tROWS_ONLY\t{n}"); sys.exit(0)
mine = con.sql(f"select * from '{p}/*.parquet'").df()
try:
    orac = con.sql(sql[name]).df()
except Exception as e:
    print(f"{name}\tORACLE_SQL_ERROR\t{str(e)[:160]}"); sys.exit(0)
m = mine.reindex(sorted(mine.columns), axis=1)
o = orac.reindex(sorted(orac.columns), axis=1)
if list(m.columns) != list(o.columns):
    print(f"{name}\tCOLS_MISMATCH\t{list(m.columns)} vs {list(o.columns)}")
elif len(m) != len(o):
    print(f"{name}\tROWS_MISMATCH\t{len(m)} vs {len(o)}")
else:
    ms = m.sort_values(by=list(m.columns), ignore_index=True).astype(str)
    os_ = o.sort_values(by=list(o.columns), ignore_index=True).astype(str)
    if ms.equals(os_):
        print(f"{name}\tOK\t{len(m)}")
    else:
        diff = (ms != os_).any(axis=1)
        idx = diff[diff].index[:2]
        print(f"{name}\tVALUES_MISMATCH\t{int(diff.sum())} rows; "
              f"mine={ms.loc[idx].to_dict('records')} "
              f"orac={os_.loc[idx].to_dict('records')}")
