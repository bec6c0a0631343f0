#!/usr/bin/env python3
"""Generate precomputed expected-row oracles for the expensive replays.

The full DuckDB replay oracles (minhash/LSH signature chains, within-
SOM-cell cosine products) cost minutes of CPU per run — round 7's
correctness gate blew its time budget on them and recorded nothing. The
engine side of those queries is cheap and their outputs are tiny
(<= ~500 rows), so this tool runs the FULL replay ONCE per scale factor,
captures the DuckDB result rows, and emits
`src/main/resources/graft/precomputed_oracles.json`: per query, a SQL
statement whose body is the captured rows as VALUES literals, branched
on the corpus signature (documents row count + md5 text checksum). The gate then
compares the engine against DuckDB-derived rows at ~zero oracle cost.

Usage:
  python3 tools/gen_precomputed_oracles.py \
      <full_replay_oracle_sql.json> <outfile> <sfDir> [<sfDir> ...]

where <full_replay_oracle_sql.json> is a Verify dump made with
GRAFT_FULL_REPLAY=1 (so it contains the live replay SQL). Re-run this
tool whenever an EXPENSIVE query or its replay oracle changes; the sbt
`PrecomputedOracleSpec` pins that the resource stays in sync with the
query list.
"""
import sys, os, json, time
import math
from concurrent.futures import ProcessPoolExecutor

# the replay oracles worth caching, measured at sf0.01 (DuckDB CPU
# seconds, threads=2): dedup_semantic 218, dedup_drop_near 89,
# dedup_resolve_minhash 87, dedup_minhash 87, dedup_edit_verify 86,
# ann_lsh_topk 61, ann_recall 60, dedup_keep_best 16,
# dedup_resolve_clusters 15, dedup_simhash 4 — together ~97% of the
# full 115-query sweep's oracle cost.
EXPENSIVE = [
    "dedup_semantic", "dedup_drop_near", "dedup_resolve_minhash",
    "dedup_minhash", "dedup_edit_verify", "ann_lsh_topk", "ann_recall",
    "dedup_keep_best", "dedup_resolve_clusters", "dedup_simhash",
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


# corpus signature: row count + an md5-prefix checksum of the text
# column. count alone is NOT an identity here (the sf0.001 and sf0.01
# documents/embeddings tables have identical row counts with different
# content), and DuckDB's hash() is not stable across versions — md5 is.
SIG_SQL = ("SELECT count(*), sum(('0x' || substr(md5(text), 1, 12))::BIGINT) "
           "FROM documents WHERE text IS NOT NULL")


def run_one(task):
    name, sql, sf_dir = task
    con = connect(sf_dir)
    t0 = time.time()
    df = con.execute(sql).df()
    nd, hd = con.execute(SIG_SQL).fetchone()
    con.close()
    return name, sf_dir, int(nd), int(hd), df, time.time() - t0


def lit(v, dtype):
    import pandas as pd
    if v is None or (isinstance(v, float) and math.isnan(v)) or pd.isna(v):
        return "NULL"
    k = dtype.kind
    if k in "iu":
        return str(int(v))
    if k == "f":
        # repr round-trips float64 exactly; DuckDB parses it back to the
        # identical double, so the exact-equality gate compare holds
        return repr(float(v))
    if k == "b":
        return "TRUE" if v else "FALSE"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def duck_type(dtype):
    k = dtype.kind
    if k in "iu":
        return "BIGINT"
    if k == "f":
        return "DOUBLE"
    if k == "b":
        return "BOOLEAN"
    return "VARCHAR"


def branch_sql(df, nd, hd):
    cols = list(df.columns)
    decls = ", ".join(f'"{c}"' for c in cols)
    casts = ", ".join(
        f'CAST("{c}" AS {duck_type(df[c].dtype)}) AS "{c}"' for c in cols)
    if len(df) == 0:
        # an intentionally-empty expected set still needs the schema: a
        # single dummy row filtered out unconditionally
        dummy = ", ".join("NULL" for _ in cols)
        return (f"SELECT {casts} FROM (VALUES ({dummy})) AS t({decls}) "
                f"WHERE FALSE")
    rows = ", ".join(
        "(" + ", ".join(lit(row[c], df[c].dtype) for c in cols) + ")"
        for _, row in df.iterrows())
    guard = f"(SELECT count(*) = {nd} AND sum(('0x' || substr(md5(text), 1, 12))::BIGINT) = {hd} " \
            f"FROM documents WHERE text IS NOT NULL)"
    return (f"SELECT {casts} FROM (VALUES {rows}) AS t({decls}) "
            f"WHERE {guard}")


def main(oracle_path, outfile, sf_dirs):
    oracle = json.load(open(oracle_path))
    missing = [n for n in EXPENSIVE if n not in oracle]
    if missing:
        sys.exit(f"oracle dump lacks {missing} — regenerate with GRAFT_FULL_REPLAY=1")
    tasks = [(n, oracle[n], d) for n in EXPENSIVE for d in sf_dirs]
    with ProcessPoolExecutor(max_workers=min(16, len(tasks))) as ex:
        results = list(ex.map(run_one, tasks))
    out = {
        "_meta": ("expected rows captured from the FULL DuckDB replay oracles "
                  "(Queries.liveOracles under GRAFT_FULL_REPLAY=1) by "
                  "tools/gen_precomputed_oracles.py over " + ", ".join(sf_dirs) +
                  "; branch guards are (documents row count, md5-prefix text checksum)"),
    }
    for name in EXPENSIVE:
        branches = []
        for rn, sf_dir, nd, hd, df, dt in results:
            if rn != name:
                continue
            print(f"  {name} @ {sf_dir}: {len(df)} rows ({dt:.1f}s replay)")
            branches.append(branch_sql(df, nd, hd))
        header = (f"-- PRECOMPUTED oracle for {name}: rows are the full DuckDB "
                  f"replay's output, captured per scale factor by "
                  f"tools/gen_precomputed_oracles.py (GRAFT_FULL_REPLAY=1 "
                  f"re-derives them live); branches select on the corpus md5 signature\n")
        out[name] = header + "\nUNION ALL\n".join(branches)
    with open(outfile, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {outfile} ({os.path.getsize(outfile)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
