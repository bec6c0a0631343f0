#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sfDir>, loads the corresponding Spark parquet result,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def fresh_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # a corpus may declare queries whose exact replay is out of scope for
    # it (e.g. the adversarial edge corpus vs the seeded-training-replay
    # oracles — see TrainOracleSql); {"query_name": "reason"}
    skip_path = os.path.join(sf_dir, "ORACLE_SKIP.json")
    skips = json.load(open(skip_path)) if os.path.exists(skip_path) else {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skips:
            print(f"[SKIP] {name}: {skips[name]}"); continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"[ERR ] {name}: reading spark output: {e}"); n_fail += 1; continue
        try:
            con = fresh_con(sf_dir)  # isolate: a crashing query must not poison others
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {e}"); n_fail += 1; continue
        ok_schema = list(got.columns) == list(exp.columns)
        if not ok_schema:
            print(f"[FAIL] {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # exact value compare (hash-equivalent)
        mismatch = None
        for c in got.columns:
            a, b = got[c].values, exp[c].values
            try:
                eq = (pd.Series(a) == pd.Series(b)) | (pd.isna(a) & pd.isna(b))
            except Exception:
                eq = pd.Series(a).astype(str) == pd.Series(b).astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, a[i], b[i], int((~eq).sum()))
                break
        if mismatch:
            c, i, av, bv, cnt = mismatch
            print(f"[FAIL] {name}: col {c} row {i}: spark={av!r} duck={bv!r} ({cnt} diffs / {len(got)})")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(got)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
