#!/usr/bin/env python3
"""Generate INDEPENDENT expected-row oracles for the BPE queries.

BPE training is an inherently sequential merge loop — there is no
tractable ANSI-SQL replay for DuckDB to run live. Instead, this tool is
a from-the-paper reference implementation (Sennrich et al. 2016,
arXiv:1508.07909) in pure Python: it tokenizes the corpus WITH DUCKDB
(the same `list_filter(string_split_regex(lower(trim(text)) ...))`
expression every live oracle uses, so tokenizer parity is inherited,
not re-asserted), learns the merge table, encodes every document, and
emits the expected rows as corpus-signature-branched VALUES SQL into
`src/main/resources/graft/independent_oracles.json`.

Independence argument: this implementation shares NO code with the
engine — dict-of-tuples Python vs Spark aggregations + codegen
kernels — and the engine side is additionally differential-tested
against a third naive Scala implementation in `BpeSpec`. Guards are
documents-only (the queries read nothing else); an unmatched corpus
yields the GRAFT_UNKNOWN_CORPUS sentinel row, like the precomputed
replay oracles.

Usage:
  python3 tools/gen_bpe_oracle.py <outfile> <sfDir> [<sfDir> ...]

Must match graft.operators.Bpe exactly:
  - symbols: code points + '</w>' terminal
  - argmax tie-break: (count desc, left asc, right asc)
  - merge application: one greedy left-to-right pass per learned pair
  - stop: best pair count < 2, or 24 merges
  - encode: repeatedly apply the LOWEST-ranked applicable merge (full
    greedy pass each), drop still-standalone '</w>' from the output
"""
import sys, os, json
from collections import Counter

import pandas as pd

from gen_precomputed_oracles import lit, duck_type, doc_guard_sql, SIG_SQL, connect

NUM_MERGES = 24
MIN_PAIR = 2
DUCK_TOKS = ("list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
             "t -> length(t) > 0)")


def train(word_counts, num_merges=NUM_MERGES, min_pair=MIN_PAIR):
    """-> (merges rows [(rank, left, right, n)], ranks {(l, r): rank0})."""
    words = {w: ([*w, "</w>"], n) for w, n in word_counts.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for syms, n in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair:
            break
        merges.append((rank, l, r, n))
        for w, (syms, cnt) in words.items():
            words[w] = (merge_pass(syms, l, r), cnt)
    ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}
    return merges, ranks


def merge_pass(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def encode_word(word, ranks, cache):
    if word in cache:
        return cache[word]
    syms = [*word, "</w>"]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best is None or rk < best[0]):
                best = (rk, syms[i], syms[i + 1])
        if best is None:
            break
        syms = merge_pass(syms, best[1], best[2])
    out = [s for s in syms if s != "</w>"]
    cache[word] = out
    return out


def derive(sf_dir):
    con = connect(sf_dir)
    rows = con.execute(
        f"SELECT doc_id, lang, {DUCK_TOKS} AS toks "
        f"FROM documents WHERE text IS NOT NULL").fetchall()
    nd, hd = con.execute(SIG_SQL).fetchone()
    con.close()

    wc = Counter()
    for _, _, toks in rows:
        wc.update(toks)
    merges, ranks = train(dict(wc))

    merges_df = pd.DataFrame(
        [(int(rk), l, r, int(n)) for rk, l, r, n in merges],
        columns=["rank", "left", "right", "n"]).astype(
        {"rank": "int64", "n": "int64"})

    cache = {}
    per_lang = {}
    for _, lang, toks in rows:
        if not toks:
            continue  # n_tok = 0 rows are absent from encodeStats
        n_sub = sum(len(encode_word(w, ranks, cache)) for w in toks)
        d, t, s = per_lang.get(lang, (0, 0, 0))
        per_lang[lang] = (d + 1, t + len(toks), s + n_sub)
    stats_df = pd.DataFrame(
        [(lang, d, t, s, round(s / t, 6))
         for lang, (d, t, s) in sorted(per_lang.items())],
        columns=["lang", "n_docs", "n_tok", "n_subwords", "fertility"]).astype(
        {"n_docs": "int64", "n_tok": "int64", "n_subwords": "int64",
         "fertility": "float64"})
    return (int(nd), int(hd)), merges_df, stats_df


def branch_sql(df, guard):
    cols = list(df.columns)
    decls = ", ".join(f'"{c}"' for c in cols)
    casts = ", ".join(
        f'CAST("{c}" AS {duck_type(df[c].dtype)}) AS "{c}"' for c in cols)
    if len(df) == 0:
        dummy = ", ".join("NULL" for _ in cols)
        return (f"SELECT {casts} FROM (VALUES ({dummy})) AS t({decls}) "
                f"WHERE FALSE")
    vals = ", ".join(
        "(" + ", ".join(lit(row[c], df[c].dtype) for c in cols) + ")"
        for _, row in df.iterrows())
    return (f"SELECT {casts} FROM (VALUES {vals}) AS t({decls}) "
            f"WHERE {guard}")


def sentinel_sql(df, guards):
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
            # no impossible BOOLEAN exists; the sibling numeric/string
            # sentinel columns in the same row carry the fail-loud
            # signal (casting the string sentinel to BOOLEAN would turn
            # the designed row into a DuckDB ConversionException)
            return "FALSE"
        return "'GRAFT_UNKNOWN_CORPUS'"

    row = ", ".join(sval(df[c].dtype) for c in cols)
    known = " OR ".join(guards)
    return (f"SELECT {casts} FROM (VALUES ({row})) AS t({decls}) "
            f"WHERE NOT ({known})")


def main(outfile, sf_dirs):
    per_query = {"bpe_merges": [], "bpe_encode_stats": []}
    guards = []
    for sf_dir in sf_dirs:
        (nd, hd), merges_df, stats_df = derive(sf_dir)
        guard = f"({doc_guard_sql(nd, hd)})"
        guards.append(guard)
        print(f"  {sf_dir}: {len(merges_df)} merges, "
              f"{len(stats_df)} lang rows (sig {nd}/{hd})")
        per_query["bpe_merges"].append(branch_sql(merges_df, guard))
        per_query["bpe_encode_stats"].append(branch_sql(stats_df, guard))
    schema = {"bpe_merges": merges_df, "bpe_encode_stats": stats_df}
    out = {
        "_meta": ("expected rows derived by tools/gen_bpe_oracle.py — an "
                  "INDEPENDENT pure-Python BPE reference implementation "
                  "(DuckDB tokenization, Sennrich-2016 merge loop) over " +
                  ", ".join(sf_dirs) + "; branch guards are (documents row "
                  "count + md5-prefix text checksum); an unmatched corpus "
                  "yields the GRAFT_UNKNOWN_CORPUS sentinel row"),
    }
    for name, branches in per_query.items():
        branches = branches + [sentinel_sql(schema[name], guards)]
        header = (f"-- INDEPENDENT oracle for {name}: rows derived by an "
                  f"independent Python BPE implementation "
                  f"(tools/gen_bpe_oracle.py re-derives them); branches "
                  f"select on the documents-table md5 signature\n")
        out[name] = header + "\nUNION ALL\n".join(branches)
    with open(outfile, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {outfile} ({os.path.getsize(outfile)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
