#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each Verify output
parquet, run the oracle SQL in DuckDB over the same sf dir and compare
(schema, row count, values after sorting columns by name + rows).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try: df[c] = pd.to_numeric(df[c])
            except Exception: pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        s, o = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(o.columns)}"
            continue
        if len(s) != len(o):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(o)}"
            continue
        bad = []
        for c in s.columns:
            a, b = s[c].values, o[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(o[c].dtype, np.floating):
                af = a.astype(float); bf = b.astype(float)
                nan_ok = np.isnan(af) == np.isnan(bf)
                # Bit-pattern compare (matches the driver's value-hash):
                # -0.0 == +0.0 under IEEE ==, but hashes differently.
                bit_eq = af.view(np.int64) == bf.view(np.int64)
                eq = np.where(np.isnan(af), nan_ok, bit_eq)
                if not eq.all():
                    i = int(np.argmin(eq))
                    diff = np.nanmax(np.abs(np.nan_to_num(af) - np.nan_to_num(bf)))
                    bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i} {a[i]}!={b[i]}, maxabs={diff:.3g}")
            else:
                eq = pd.Series(a).astype(str).values == pd.Series(b).astype(str).values
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i} {a[i]}!={b[i]}")
        results[name] = "OK rows=%d" % len(s) if not bad else "VALUE_MISMATCH " + "; ".join(bad[:3])
    npass = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in results.items():
        print(f"{'PASS' if v.startswith(('OK','ROWS_ONLY')) else 'FAIL'} {k}: {v}")
    print(f"== {npass}/{len(results)} pass")
    return results

def write_json(results, path, round_label=None):
    """Driver-CORRECTNESS-format dump so gen_docs.py can fold the local
    end-of-round gate state into COVERAGE_GATE.md. `round_label` is
    stored under "_meta" so gen_docs.py can label the round explicitly
    instead of inferring it from file mtimes (which git does not
    preserve — a fresh checkout reorders them)."""
    out = {}
    if round_label is not None:
        out["_meta"] = {"round": int(round_label)}
    for name, v in results.items():
        if v.startswith("ROWS_ONLY"):
            rows = int(v.split("rows=")[1])
            out[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": rows,
                         "oracle_rows": None, "err": "no_oracle"}
        elif v.startswith("OK"):
            rows = int(v.split("rows=")[1])
            out[name] = {"rows_match": True, "schema_match": True,
                         "hash_match": True, "spark_rows": rows,
                         "oracle_rows": rows, "err": None}
        else:
            out[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": None,
                         "oracle_rows": None, "err": v[:200]}
    json.dump(out, open(path, "w"), indent=1)

if __name__ == "__main__":
    res = main(sys.argv[1], sys.argv[2])
    if len(sys.argv) > 3 and sys.argv[3] == "--json":
        write_json(res, sys.argv[4] if len(sys.argv) > 4 else "LOCAL_GATE.json",
                   sys.argv[5] if len(sys.argv) > 5 else None)
