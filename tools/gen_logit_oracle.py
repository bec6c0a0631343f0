#!/usr/bin/env python3
"""Generate INDEPENDENT expected-row oracles for the quality_train_*
queries (distributed logistic-gate training, graft.operators.LogitTrain).

Full-batch gradient descent is a sequential fixpoint loop — like BPE
and k-means, there is no tractable ANSI-SQL replay for DuckDB to run
live. This tool mirrors the engine's DETERMINISM CONTRACT (documented
on graft.operators.LogitTrain) in pure Python:

  - features: the round-6 Gopher signal grid
    [1, ln(1+n_tok), min(mean_tok_len, 100), alpha_ratio, stop_ratio]
    (the meanLen clamp = Corpus.qualitySignalArray's overflow bound),
    computed
    here BY DUCKDB with the same SQL spelling the live quality_logit
    oracle uses (tokenizer mirroring TextFunctions.tokens), label
    y = 1.0 iff n_chars >= 200 (an upstream keep/drop decision
    recorded in metadata, distilled into a text-only gate);
  - link: the ALGEBRAIC sigmoid 0.5*(1 + z/(1+|z|)) — no transcendental
    inside the loop, so every iteration is IEEE-754 arithmetic both
    engines spell identically;
  - gradient/residual sums as exact scale-9 longs (order-independent),
    means divided at scale 9 HALF_UP; zero init; ITERS/LR below must
    match Queries.logitIters/logitLr.

Because every floating step is either pinned to a decimal grid or a
sequential IEEE-754 loop both sides spell identically, the expected
rows are exact — no tolerance.

Independence argument: this implementation shares no code with the
engine (DuckDB SQL + plain Python loops vs Spark codegen kernels +
VecSumCount aggregates), and the engine side is additionally
differential-tested against a second naive Scala implementation in
`LogitSpec`.

Guards are documents-table signatures EXTENDED WITH n_chars (row
count + md5-prefix checksum over text:n_chars) because the training
labels read `n_chars` — a corpus with identical text but different
metadata must NOT match a stale branch. An unmatched corpus yields the
GRAFT_UNKNOWN_CORPUS sentinel row.

Usage:
  python3 tools/gen_logit_oracle.py <independent_oracles.json> <sfDir> [...]

Merges its five query keys into the existing file, preserving the
BPE/k-means entries.
"""
import os
import re
import sys, json
from decimal import Decimal

from gen_precomputed_oracles import connect
from gen_bpe_oracle import branch_sql, sentinel_sql
from gen_kmeans_oracle import round_dec, div_half_up_9, E9, E6

import pandas as pd

ITERS, LR = 150, 1.0  # = Queries.logitIters / Queries.logitLr
DIM = 5

# documents signature + n_chars (labels read it)
SIG_DOCLANG_SQL = (
    "SELECT count(*), sum(('0x' || substr(md5(text || ':' || "
    "coalesce(n_chars::VARCHAR, '')), 1, 12))::BIGINT) "
    "FROM documents WHERE text IS NOT NULL")


def doclang_guard_sql(nd, hd):
    return (f"(SELECT count(*) = {nd} AND sum(('0x' || substr(md5(text || ':' || "
            f"coalesce(n_chars::VARCHAR, '')), 1, 12))::BIGINT) = {hd} "
            f"FROM documents WHERE text IS NOT NULL)")


def stopwords_from_scala():
    """The engine's englishStopwords list, parsed from TextFunctions.scala
    so the two can never drift silently."""
    path = os.path.join(os.path.dirname(__file__), "..",
                        "src/main/scala/graft/functions/TextFunctions.scala")
    src = open(path).read()
    m = re.search(r"val englishStopwords: Seq\[String\] = Seq\((.*?)\)\n",
                  src, re.S)
    assert m, "englishStopwords literal not found in TextFunctions.scala"
    words = re.findall(r'"([^"]+)"', m.group(1))
    assert len(words) > 200, f"suspicious stopword count {len(words)}"
    return words


# DuckDB spelling of TextFunctions.tokens + the Gopher signal grid —
# the same expressions Queries.qualityLogitOracle uses (duckToks).
FEATURE_SQL = """
WITH t AS (
  SELECT doc_id, n_chars, text,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> length(t) > 0) AS toks
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
       substr(md5(text), 1, 1) IN ('0', '1', '2') AS is_test,
       CASE WHEN n_chars >= 200 THEN 1.0 ELSE 0.0 END AS y,
       round(ln(1.0 + len(toks)), 6) AS f_len,
       CASE WHEN len(toks) = 0 THEN 0
            ELSE least(round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                       / len(toks), 6), CAST(100.0 AS DOUBLE)) END AS f_mean,
       CASE WHEN len(toks) = 0 THEN 0
            ELSE round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(toks), 6) END AS f_alpha,
       CASE WHEN len(toks) = 0 THEN 0
            ELSE round(CAST(len(list_filter(toks, x -> list_contains([{stops}], x))) AS DOUBLE)
                       / len(toks), 6) END AS f_stop
FROM t ORDER BY doc_id
"""


def s9(x):
    return int(round_dec(x, E9).scaleb(9))


def mean9(unscaled, n):
    return float(Decimal(div_half_up_9(unscaled, n)).scaleb(-9))


def sigmoid_alg(z):
    return 0.5 * (1.0 + z / (1.0 + abs(z)))


def train(feats, iters, lr):
    n = len(feats)
    assert n > 0, "empty training set"
    w = [0.0] * DIM
    mse = float("nan")
    for _ in range(iters):
        sums = [0] * (DIM + 1)
        for _, x, y in feats:
            z = 0.0
            for j in range(DIM):
                z += w[j] * x[j]
            r = sigmoid_alg(z) - y
            for j in range(DIM):
                sums[j] += s9(r * x[j])
            sums[DIM] += s9(r * r)
        w = [w[j] - lr * mean9(sums[j], n) for j in range(DIM)]
        mse = mean9(sums[DIM], n)
    return w, mse, n


def derive(sf_dir):
    stops = ", ".join(f"'{w}'" for w in stopwords_from_scala())
    con = connect(sf_dir)
    fdf = con.execute(FEATURE_SQL.format(stops=stops)).df()
    nd, hd = con.execute(SIG_DOCLANG_SQL).fetchone()
    con.close()
    feats = [(int(r.doc_id),
              [1.0, float(r.f_len), float(r.f_mean), float(r.f_alpha),
               float(r.f_stop)],
              float(r.y))
             for r in fdf.itertuples()]
    is_test = {int(r.doc_id): bool(r.is_test) for r in fdf.itertuples()}

    w, mse, n = train(feats, ITERS, LR)

    def r6(v):
        return float(round_dec(v, E6))

    names = ["bias", "w_log_tok", "w_mean_len", "w_alpha_ratio",
             "w_stop_ratio"]
    weights_df = pd.DataFrame(
        [(t, r6(v)) for t, v in zip(names, w)] +
        [("mse", r6(mse)), ("n_docs", float(n))],
        columns=["term", "value"]).astype({"term": "object",
                                           "value": "float64"})

    score_rows, tp, fp, fn, tn = [], 0, 0, 0, 0
    for doc_id, x, y in feats:
        z = 0.0
        for j in range(DIM):
            z += w[j] * x[j]
        score = r6(sigmoid_alg(z))
        keep = score >= 0.5
        score_rows.append((doc_id, score, keep))
        if keep and y == 1.0:
            tp += 1
        elif keep:
            fp += 1
        elif y == 1.0:
            fn += 1
        else:
            tn += 1
    score_df = pd.DataFrame(score_rows,
                            columns=["doc_id", "score", "keep"]).astype(
        {"doc_id": "int64", "score": "float64", "keep": "bool"})
    eval_df = pd.DataFrame(
        [(tp, fp, fn, tn, r6((tp + tn) / n))],
        columns=["tp", "fp", "fn", "tn", "accuracy"]).astype(
        {"tp": "int64", "fp": "int64", "fn": "int64", "tn": "int64",
         "accuracy": "float64"})

    # uncertainty sampling: the 50 docs whose round-6 score is closest
    # to the 0.5 boundary (ties to the lower doc_id) — mirrors the
    # uncertainty_sample query (same IEEE |score - 0.5| both engines)
    unc = sorted(((abs(sc - 0.5), did, sc) for did, sc, _ in score_rows))[:50]
    unc_df = pd.DataFrame(
        [(r + 1, did, sc) for r, (_, did, sc) in enumerate(unc)],
        columns=["rank", "doc_id", "score"]).astype(
        {"rank": "int64", "doc_id": "int64", "score": "float64"})

    # holdout: train on the content-keyed 13/16 split, evaluate on the
    # held-out 3/16 — mirrors the quality_train_holdout query
    train_feats = [f for f in feats if not is_test[f[0]]]
    test_feats = [f for f in feats if is_test[f[0]]]
    wh, _, _ = train(train_feats, ITERS, LR)
    htp = hfp = hfn = htn = 0
    for _, x, y in test_feats:
        z = 0.0
        for j in range(DIM):
            z += wh[j] * x[j]
        keep = r6(sigmoid_alg(z)) >= 0.5
        if keep and y == 1.0:
            htp += 1
        elif keep:
            hfp += 1
        elif y == 1.0:
            hfn += 1
        else:
            htn += 1
    hn = len(test_feats)
    holdout_df = pd.DataFrame(
        [(htp, hfp, hfn, htn, r6((htp + htn) / hn) if hn else 0.0)],
        columns=["tp", "fp", "fn", "tn", "accuracy"]).astype(
        {"tp": "int64", "fp": "int64", "fn": "int64", "tn": "int64",
         "accuracy": "float64"})
    return (int(nd), int(hd)), weights_df, score_df, eval_df, holdout_df, unc_df


def main(outfile, sf_dirs):
    per_query = {"quality_train_weights": [], "quality_train_score": [],
                 "quality_train_eval": [], "quality_train_holdout": [],
                 "uncertainty_sample": []}
    guards, schema = [], {}
    for sf_dir in sf_dirs:
        (nd, hd), wdf, sdf, edf, hdf, udf = derive(sf_dir)
        guard = f"({doclang_guard_sql(nd, hd)})"
        guards.append(guard)
        print(f"  {sf_dir}: {len(wdf)} weight rows, {len(sdf)} scores, "
              f"eval {edf.iloc[0].to_dict()} (doc:n_chars sig {nd}/{hd})")
        per_query["quality_train_weights"].append(branch_sql(wdf, guard))
        per_query["quality_train_score"].append(branch_sql(sdf, guard))
        per_query["quality_train_eval"].append(branch_sql(edf, guard))
        per_query["quality_train_holdout"].append(branch_sql(hdf, guard))
        per_query["uncertainty_sample"].append(branch_sql(udf, guard))
        schema = {"quality_train_weights": wdf, "quality_train_score": sdf,
                  "quality_train_eval": edf, "quality_train_holdout": hdf,
                  "uncertainty_sample": udf}
    existing = json.load(open(outfile)) if os.path.exists(outfile) else {}
    existing["_meta_logit"] = (
        "quality_train_* expected rows derived by tools/gen_logit_oracle.py "
        "— an INDEPENDENT pure-Python full-batch logistic-gate training "
        "implementation (DuckDB round-6 Gopher features, algebraic sigmoid, "
        "scale-9 DECIMAL gradient sums, ITERS=%d LR=%s) over %s; branch "
        "guards are (documents row count + md5-prefix text:n_chars checksum); "
        "an unmatched corpus yields the GRAFT_UNKNOWN_CORPUS sentinel row"
        % (ITERS, LR, ", ".join(sf_dirs)))
    for name, branches in per_query.items():
        branches = branches + [sentinel_sql(schema[name], guards)]
        header = (f"-- INDEPENDENT oracle for {name}: rows derived by an "
                  f"independent Python logit-training implementation "
                  f"(tools/gen_logit_oracle.py re-derives them); branches "
                  f"select on the documents-table text:n_chars md5 signature\n")
        existing[name] = header + "\nUNION ALL\n".join(branches)
    with open(outfile, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"wrote {outfile} ({os.path.getsize(outfile)} bytes)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
