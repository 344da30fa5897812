#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - load the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with each table in <sfDir> registered
  - sort columns by name, sort rows, compare row count / schema / values
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        # match a hash compare loosely: report exact-ness separately
        return v
    return v

def main(sf_dir, out_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        entry = {}
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            entry["error"] = "no spark result parquet"
            results[name] = entry
            print(f"FAIL {name}: no spark result")
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            results[name] = {"error": f"read spark: {e}"}
            print(f"FAIL {name}: read spark: {e}")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = {"error": f"oracle sql: {e}"}
            print(f"FAIL {name}: oracle sql: {e}")
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        entry["rows"] = (len(sdf), len(odf))
        entry["schema_match"] = scols == ocols
        entry["rows_match"] = len(sdf) == len(odf)
        if not entry["schema_match"]:
            print(f"FAIL {name}: schema spark={scols} oracle={ocols}")
            results[name] = entry
            continue
        if not entry["rows_match"]:
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            results[name] = entry
            continue
        s = sdf[scols].copy()
        o = odf[ocols].copy()
        # canonical row order: sort by all columns as strings
        import pandas as pd
        def canon(df):
            df2 = df.astype(str)
            order = df2.sort_values(by=list(df2.columns)).index
            return df.loc[order].reset_index(drop=True)
        s, o = canon(s), canon(o)
        mismatch = []
        for c in scols:
            sv, ov = s[c], o[c]
            try:
                import numpy as np
                if sv.dtype.kind == 'f' or ov.dtype.kind == 'f':
                    a = sv.astype(float).to_numpy()
                    b = ov.astype(float).to_numpy()
                    nan_ok = (pd.isna(a) == pd.isna(b)).all()
                    exact = nan_ok and np.array_equal(
                        a[~pd.isna(a)], b[~pd.isna(b)])
                    if not exact:
                        close = nan_ok and np.allclose(
                            a[~pd.isna(a)], b[~pd.isna(b)], rtol=1e-12, atol=1e-12)
                        mismatch.append((c, "float-inexact" if close else "float-differs"))
                else:
                    if not (sv.astype(str).to_numpy() == ov.astype(str).to_numpy()).all():
                        mismatch.append((c, "differs"))
            except Exception as e:
                mismatch.append((c, f"cmp-error {e}"))
        entry["hash_match"] = not mismatch
        entry["mismatch"] = mismatch
        results[name] = entry
        if mismatch:
            print(f"FAIL {name}: value mismatch {mismatch}")
            for c, _ in mismatch[:2]:
                print("  spark:", s[c].head(5).tolist())
                print("  oracle:", o[c].head(5).tolist())
        else:
            print(f"OK   {name}: {len(s)} rows")
    n_ok = sum(1 for e in results.values() if e.get("hash_match"))
    no_oracle_dirs = [d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
    print(f"\n{n_ok}/{len(oracle)} oracle-checked green; rows-only (no oracle): {sorted(no_oracle_dirs)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
