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


# corpus signature: row count + an md5-prefix checksum, over BOTH the
# documents table (text) and the embeddings table (vec_id + vector
# content). count alone is NOT an identity here (the sf0.001 and sf0.01
# documents/embeddings tables have identical row counts with different
# content), and a documents-only checksum is not either: several cached
# oracles (ann_recall, ann_lsh_topk, dedup_semantic, dedup_drop_near,
# dedup_keep_best) read embeddings, and a corpus with identical
# documents but different embeddings must NOT match a stale branch.
# DuckDB's hash() is not stable across versions — md5 is; the
# embedding::VARCHAR rendering is stable for the generating and
# checking DuckDB (the same driver-side install), and any cross-version
# drift fails CLOSED (no branch matches -> sentinel row -> loud
# row-count mismatch).
SIG_SQL = ("SELECT count(*), sum(('0x' || substr(md5(text), 1, 12))::BIGINT) "
           "FROM documents WHERE text IS NOT NULL")
SIG_EMB_SQL = ("SELECT count(*), sum(('0x' || substr(md5(vec_id::VARCHAR || ':' "
               "|| embedding::VARCHAR), 1, 12))::BIGINT) FROM embeddings")


def emb_guard_sql(ne, he):
    return (f"(SELECT count(*) = {ne} AND sum(('0x' || substr(md5(vec_id::VARCHAR || ':' "
            f"|| embedding::VARCHAR), 1, 12))::BIGINT) = {he} FROM embeddings)")


def doc_guard_sql(nd, hd):
    return (f"(SELECT count(*) = {nd} AND sum(('0x' || substr(md5(text), 1, 12))::BIGINT) = {hd} "
            f"FROM documents WHERE text IS NOT NULL)")


def run_one(task):
    name, sql, sf_dir = task
    con = connect(sf_dir)
    t0 = time.time()
    df = con.execute(sql).df()
    nd, hd = con.execute(SIG_SQL).fetchone()
    ne, he = con.execute(SIG_EMB_SQL).fetchone()
    con.close()
    return name, sf_dir, (int(nd), int(hd), int(ne), int(he)), df, time.time() - t0


def lit(v, dtype):
    import pandas as pd
    k = dtype.kind
    if k == "f":
        # pandas float columns conflate SQL NULL with NaN (DuckDB's df()
        # renders both as nan), and a bare nan/inf token would not parse
        # back inside a VALUES list — either way a cached row would
        # silently diverge from the live replay. Fail generation instead:
        # a query whose expected rows carry non-finite doubles must stay
        # on the live replay oracle.
        if v is None or pd.isna(v) or not math.isfinite(float(v)):
            raise ValueError(
                "non-finite or NULL double in expected rows — cannot cache "
                "faithfully (NULL/NaN are indistinguishable via df()); keep "
                "this query on the live replay oracle")
        # repr round-trips float64 exactly; DuckDB parses it back to the
        # identical double, so the exact-equality gate compare holds
        return repr(float(v))
    if v is None or pd.isna(v):
        return "NULL"
    if k in "iu":
        return str(int(v))
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


def branch_sql(df, sig):
    """One corpus branch: (select_sql, guard_sql). The guard covers BOTH
    tables (documents + embeddings) for every cached oracle — stricter
    than each query strictly needs, but it can only fail CLOSED (a
    mismatched table the query ignores drops to the sentinel branch,
    never to wrong expected rows)."""
    nd, hd, ne, he = sig
    guard = f"({doc_guard_sql(nd, hd)} AND {emb_guard_sql(ne, he)})"
    cols = list(df.columns)
    decls = ", ".join(f'"{c}"' for c in cols)
    casts = ", ".join(
        f'CAST("{c}" AS {duck_type(df[c].dtype)}) AS "{c}"' for c in cols)
    if len(df) == 0:
        # an intentionally-empty expected set still needs the schema: a
        # single dummy row filtered out unconditionally (the guard still
        # registers this corpus as KNOWN via the sentinel's NOT(...))
        dummy = ", ".join("NULL" for _ in cols)
        return (f"SELECT {casts} FROM (VALUES ({dummy})) AS t({decls}) "
                f"WHERE FALSE"), guard
    rows = ", ".join(
        "(" + ", ".join(lit(row[c], df[c].dtype) for c in cols) + ")"
        for _, row in df.iterrows())
    return (f"SELECT {casts} FROM (VALUES {rows}) AS t({decls}) "
            f"WHERE {guard}"), guard


def sentinel_sql(df, guards):
    """The unknown-corpus branch: when NO captured signature matches,
    emit one impossible row instead of zero rows — a query that
    legitimately returns 0 rows on an unknown corpus must FAIL the gate
    (row-count mismatch), not silently pass against an empty expected
    set. The engine cannot produce these values, so a match is
    impossible."""
    cols = list(df.columns)
    decls = ", ".join(f'"{c}"' for c in cols)
    casts = ", ".join(
        f'CAST("{c}" AS {duck_type(df[c].dtype)}) AS "{c}"' for c in cols)

    def sval(dtype):
        k = dtype.kind
        if k in "iu":
            return "-314159265358979"
        if k == "f":
            return "-3.141592653589793e+101"
        if k == "b":
            return "TRUE"
        return "'GRAFT_UNKNOWN_CORPUS'"

    row = ", ".join(sval(df[c].dtype) for c in cols)
    known = " OR ".join(guards)
    return (f"SELECT {casts} FROM (VALUES ({row})) AS t({decls}) "
            f"WHERE NOT ({known})")


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
                  "; branch guards are (documents row count + md5-prefix text "
                  "checksum, embeddings row count + md5-prefix content checksum); "
                  "an unmatched corpus yields the GRAFT_UNKNOWN_CORPUS sentinel "
                  "row so the gate fails loudly instead of comparing empty-vs-empty"),
    }
    for name in EXPENSIVE:
        branches, guards, schema_df = [], [], None
        for rn, sf_dir, sig, df, dt in results:
            if rn != name:
                continue
            print(f"  {name} @ {sf_dir}: {len(df)} rows ({dt:.1f}s replay)")
            sel, guard = branch_sql(df, sig)
            branches.append(sel)
            guards.append(guard)
            schema_df = df if schema_df is None else schema_df
        branches.append(sentinel_sql(schema_df, guards))
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
