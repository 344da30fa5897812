#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables and compare rows/schema/values (columns sorted by name)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

green = red = 0
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip('/'))
    try:
        mine = canon(con.execute(f"SELECT * FROM '{d}*.parquet'").df())
    except Exception as e:
        print(f"RED  {name}: cannot read result: {e}"); red += 1; continue
    if name not in oracle:
        print(f"----  {name}: rows-only ({len(mine)} rows)"); continue
    try:
        ref = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"RED  {name}: oracle SQL failed: {str(e)[:200]}"); red += 1; continue
    if list(mine.columns) != list(ref.columns):
        print(f"RED  {name}: columns mine={list(mine.columns)} ref={list(ref.columns)}"); red += 1; continue
    if len(mine) != len(ref):
        print(f"RED  {name}: rows mine={len(mine)} ref={len(ref)}"); red += 1; continue
    bad = None
    for c in mine.columns:
        a, b = mine[c], ref[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (a.astype('float64').values == b.astype('float64').values) | (a.isna().values & b.isna().values)
            else:
                eq = (a.astype(str).values == b.astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq)); bad = (c, a.iloc[i], b.iloc[i], i); break
        except Exception as e:
            bad = (c, 'cmp-error', str(e)[:120], -1); break
    if bad:
        print(f"RED  {name}: col {bad[0]} row {bad[3]}: mine={bad[1]!r} ref={bad[2]!r}"); red += 1
    else:
        print(f"GREEN {name} ({len(mine)} rows)"); green += 1
print(f"\n{green} green, {red} red, {len(oracle)} oracles")
