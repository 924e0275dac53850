#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.
Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import duckdb, json, sys, glob, os
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
sql = json.load(open(f'{outdir}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p): continue
    files = glob.glob(f'{p}/*.parquet')
    if not files:
        results[name] = {'status': 'NO_OUTPUT'}; continue
    mine = con.sql(f"select * from '{p}/*.parquet'").df()
    if name not in sql:
        results[name] = {'status': 'ROWS_ONLY', 'rows': len(mine)}
        continue
    try:
        orac = con.sql(sql[name]).df()
    except Exception as e:
        results[name] = {'status': 'ORACLE_SQL_ERROR', 'err': str(e)[:200]}; continue
    m = mine.reindex(sorted(mine.columns), axis=1)
    o = orac.reindex(sorted(orac.columns), axis=1)
    entry = {'rows': (len(m), len(o)),
             'schema_mine': {c: str(t) for c, t in m.dtypes.items()},
             'schema_orac': {c: str(t) for c, t in o.dtypes.items()}}
    if list(m.columns) != list(o.columns):
        entry['status'] = 'COLS_MISMATCH'; results[name] = entry; continue
    if len(m) != len(o):
        entry['status'] = 'ROWS_MISMATCH'; results[name] = entry; continue
    ms = m.sort_values(by=list(m.columns), ignore_index=True).astype(str)
    os_ = o.sort_values(by=list(o.columns), ignore_index=True).astype(str)
    if ms.equals(os_):
        entry['status'] = 'OK'
    else:
        diff = (ms != os_).any(axis=1)
        entry['status'] = 'VALUES_MISMATCH'
        entry['n_diff'] = int(diff.sum())
        idx = diff[diff].index[:3]
        entry['sample_mine'] = ms.loc[idx].to_dict('records')
        entry['sample_orac'] = os_.loc[idx].to_dict('records')
    results[name] = entry

ok = sum(1 for v in results.values() if v['status'] == 'OK')
rows_only = sum(1 for v in results.values() if v['status'] == 'ROWS_ONLY')
print(f"== {ok} OK, {rows_only} rows-only, {len(results)-ok-rows_only} problems ==")
for name, v in results.items():
    if v['status'] in ('OK',):
        print(f"  OK    {name}")
    elif v['status'] == 'ROWS_ONLY':
        print(f"  ROWS  {name} rows={v['rows']}" + ("  (!! EMPTY)" if v['rows']==0 else ""))
    else:
        print(f"  FAIL  {name}: {v['status']} {json.dumps({k:x for k,x in v.items() if k!='status'}, default=str)[:600]}")
