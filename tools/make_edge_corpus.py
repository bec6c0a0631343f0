#!/usr/bin/env python3
"""Build the adversarial oracle-robustness corpora: a directory that
mirrors a testdata SF dir (symlinks) but swaps in edge-case documents
and embeddings. Run Verify + check_oracle against it after touching any
doc/embedding query — every oracle must stay green on:

  documents: null / empty / whitespace-only / sub-shingle texts,
  multibyte UTF-8 (CJK, accents, 4-byte surrogate pairs), punctuation-
  and digit-only docs, exact and near duplicates, long repetition;
  embeddings: DUPLICATE codebook rows (argmin tie-break to first flat
  index), zero vectors (cosine guard), denormal-tiny and large-magnitude
  values, float-precision near-ties.

Magnitude calibration: the oracle convention rounds to 6 decimals, which
absorbs float-association ulps only for outputs below ~1e9 — the "huge"
embedding row is 1e2 so norm-p3 outputs (cubed) stay inside that range.

Usage: python3 tools/make_edge_corpus.py [out_dir] [sf_dir]
"""
import os
import random
import sys, json

import pyarrow as pa
import pyarrow.parquet as pq


def link_base(out_dir, sf_dir):
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            dst = os.path.join(out_dir, f)
            if os.path.lexists(dst):
                os.remove(dst)
            os.symlink(os.path.join(sf_dir, f), dst)


def write_documents(out_dir):
    docs = [
        (0, None, "en", "edge", 0),
        (1, "", "en", "edge", 0),
        (2, "   \t\n  ", "en", "edge", 7),
        (3, "x", "en", "edge", 1),
        (4, "ab", "en", "edge", 2),
        (5, "abc", "en", "edge", 3),
        (6, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
        (7, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
        (8, "the quick brown fox jumped over the lazy dog", "en", "edge", 44),
        (9, "你好 世界 这是 一个 测试 文档 的 内容", "zh", "edge", 20),
        (10, "¡Hola! ¿Cómo estás? el niño está aquí", "es", "edge", 37),
        (11, "...!!!???;;;:::", "en", "edge", 15),
        (12, "1234567890 9876543210 42", "en", "edge", 24),
        (13, "der hund und die katze sind nicht das problem", "de", "edge", 45),
        (14, "a " * 200, "en", "edge", 400),
        (15, "le chat et le chien sont dans la maison", "fr", "edge", 39),
        (16, "éèêë test €☃", "fr", "edge", 12),
        (17, "\U0001d54c\U0001d55f\U0001d55a\U0001d554\U0001d560\U0001d555\U0001d556 \U0001d565\U0001d556\U0001d564\U0001d565", "en", "edge", 12),
        (18, "tab\tsep\tand\nnewline mix", "en", "edge", 23),
        (19, "the the the the the the the the", "en", "edge", 31),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    path = os.path.join(out_dir, "documents.parquet")
    os.remove(path)
    pq.write_table(tbl, path)


def write_embeddings(out_dir):
    random.seed(17)
    dim = 8
    base = [0.5] * dim
    rows = [(0, base), (1, base), (2, [0.0] * dim)]  # dup + zero codebook rows
    for i in range(3, 9):
        rows.append((i, [random.uniform(-1, 1) for _ in range(dim)]))
    rows += [
        (9, base),                       # exact dup of two codebook rows: tie
        (10, [0.0] * dim),               # zero vector
        (11, [1e-30] * dim),             # denormal-ish
        (12, [1e2] * dim),               # large but inside rounding range
        (13, [v + 1e-7 for v in base]),  # float near-tie
    ]
    for i in range(14, 60):
        rows.append((i, [random.uniform(-1, 1) for _ in range(dim)]))
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([[float(x) for x in r[1]] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[0] % 4 for r in rows], pa.int32()),
    })
    path = os.path.join(out_dir, "embeddings.parquet")
    os.remove(path)
    pq.write_table(tbl, path)


def main(out_dir="/tmp/edgecorpus", sf_dir="/root/testdata/sf0.001"):
    link_base(out_dir, sf_dir)
    write_documents(out_dir)
    write_embeddings(out_dir)
    # The seeded-training-replay oracles are exact on the real corpora
    # (sf0.01/sf0.1) but cannot be exact here: this corpus is a handful
    # of distinct vectors duplicated many times, so after 3 epochs of
    # sigma-smoothing, neighboring neurons' weights -- and some samples'
    # BMU margins -- are separated by less than the accumulated
    # cross-engine float-association divergence. No formula choice fixes
    # that; the gate skips them WITH this reason instead of reporting a
    # meaningless exact-hash mismatch.
    reason = ("degenerate duplicate-heavy corpus: BMU margins below "
              "cross-engine float-association divergence after training")
    # the precomputed expected-row oracles (see PrecomputedOracles /
    # tools/gen_precomputed_oracles.py) branch on the STANDARD corpora's
    # row counts, so on this synthetic corpus they return 0 rows by
    # design; run those queries here with GRAFT_FULL_REPLAY=1 instead
    pre = ("precomputed oracle branches match only the standard sf "
           "corpora; use GRAFT_FULL_REPLAY=1 for a live replay here")
    precomputed = ["dedup_semantic", "dedup_drop_near",
                   "dedup_resolve_minhash", "dedup_minhash",
                   "dedup_edit_verify", "ann_lsh_topk", "ann_recall",
                   "dedup_keep_best", "dedup_resolve_clusters",
                   "dedup_simhash"]
    # the BPE oracles are independent-Python-derived VALUES rows with
    # the same signature-branch scheme (tools/gen_bpe_oracle.py); on an
    # unmatched corpus they return the fail-loud sentinel — re-derive
    # with gen_bpe_oracle.py over this corpus for a real check here
    ind = ("independent-implementation oracle branches match only the "
           "standard sf corpora; re-run tools/gen_bpe_oracle.py over "
           "this corpus for a live derivation")
    # the k-means oracles DO carry a branch for this corpus
    # (gen_kmeans_oracle.py is run over it too — duplicate/zero/denormal
    # vectors are exactly the argmin-tie and scale9 stress cases), so
    # only the BPE queries stay skipped here
    independent = ["bpe_merges", "bpe_encode_stats"]
    skips = {"som_train_activation_response": reason,
             # the same seeded replay forced onto the distributed epoch
             # loop (localFitThreshold=0) — identical degeneracy
             "som_train_distributed": reason,
             "ann_som_topk": reason}
    skips.update({q: pre for q in precomputed})
    skips.update({q: ind for q in independent})
    with open(os.path.join(out_dir, "ORACLE_SKIP.json"), "w") as f:
        json.dump(skips, f, indent=1)
    print(f"edge corpus at {out_dir} (base: {sf_dir})")


if __name__ == "__main__":
    main(*sys.argv[1:])
