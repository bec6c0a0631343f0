#!/usr/bin/env python3
"""Generate INDEPENDENT expected-row oracles for the k-means queries.

Lloyd's k-means is a sequential fixpoint loop — like BPE training,
there is no tractable ANSI-SQL replay for DuckDB to run live. This tool
is a from-the-paper pure-Python implementation mirroring the engine's
DETERMINISM CONTRACT (documented on graft.operators.Kmeans):

  - init: the k vectors with the smallest (md5("km:" + id), id);
  - assignment: squared euclidean accumulated SEQUENTIALLY over
    dimensions in index order, ties to the LOWEST centroid id;
  - update: per-dimension element values rounded to 9 decimals,
    summed exactly (Decimal), divided by the exact member count at
    scale 9 HALF_UP; empty clusters keep their centroid;
  - outputs rounded to 6 decimals HALF_UP.

Because every floating step is either pinned to a decimal grid or a
sequential IEEE-754 loop both sides spell identically, the expected
rows are exact — no tolerance.

Independence argument: this implementation shares no code with the
engine (plain Python dict/list loops vs Spark codegen kernels +
DataFrame aggregations), and the engine side is additionally
differential-tested against a third naive Scala implementation in
`KmeansSpec`.

Guards are EMBEDDINGS-table signatures (the queries read nothing
else): row count + md5-prefix checksum over vec_id:embedding::VARCHAR,
computed by DuckDB exactly as gen_precomputed_oracles.py does. An
unmatched corpus yields the GRAFT_UNKNOWN_CORPUS sentinel row.

Usage:
  python3 tools/gen_kmeans_oracle.py <independent_oracles.json> <sfDir> [...]

Merges its three query keys into the existing file, preserving the BPE
entries.
"""
import sys, os, json, hashlib
from decimal import Decimal, ROUND_HALF_UP
from fractions import Fraction

import pandas as pd

from gen_precomputed_oracles import lit, duck_type, connect, SIG_EMB_SQL, emb_guard_sql
from gen_bpe_oracle import branch_sql, sentinel_sql

K, ITERS = 8, 6            # kmeans_centroids / kmeans_assign
IVF_K, IVF_ITERS, NPROBE, TOPK, NQ = 8, 4, 3, 5, 5  # ann_ivf_kmeans
SALT = "km"

E9 = Decimal("1E-9")
E6 = Decimal("1E-6")


def round_dec(x, q):
    """Spark round(double, s): BigDecimal(Double.toString(x)).setScale(s,
    HALF_UP). Python repr() is the same shortest-round-trip decimal."""
    return Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP)


def div_half_up_9(num_scaled9, n):
    """(sum at scale 9) / n, rounded HALF_UP at scale 9, exactly —
    mirrors java.math.BigDecimal.divide(n, 9, HALF_UP)."""
    f = Fraction(num_scaled9, n)  # value * 10^9 as an exact rational
    sign = -1 if f < 0 else 1
    a = abs(f)
    i, frac = a.numerator // a.denominator, None
    frac = a - (a.numerator // a.denominator)
    if frac >= Fraction(1, 2):
        i += 1
    return sign * i  # unscaled value at scale 9


def load_vectors(sf_dir):
    df = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    rows = []
    for vid, emb in zip(df["vec_id"], df["embedding"]):
        if emb is None:
            continue
        rows.append((int(vid), [float(x) for x in emb]))  # f32 -> f64 exact
    return rows


def init_centroids(rows, k):
    def key(r):
        return (hashlib.md5(f"{SALT}:{r[0]}".encode()).hexdigest(), r[0])
    picked = sorted(rows, key=key)[:k]
    assert len(picked) == k, f"need >= {k} vectors"
    return [list(v) for _, v in picked]


def assign_one(v, c):
    """(cid, d2, d2b) — own and second-nearest squared distances,
    mirroring the engine kernel's one-pass best/second tracking."""
    best, best_d, second_d = 0, float("inf"), float("inf")
    for j, w in enumerate(c):
        d = 0.0
        for i in range(len(w)):
            t = v[i] - w[i]
            d += t * t
        if d < best_d:
            second_d, best_d, best = best_d, d, j
        elif d < second_d:
            second_d = d
    return best, best_d, second_d


def init_farthest(rows, k):
    """Gonzalez farthest-first traversal: md5-smallest seed, then the
    max-min-squared-distance point (ties to the lowest id) k-1 times."""
    picked = [list(init_centroids(rows, 1)[0])]
    while len(picked) < k:
        best_id, best_d, best_v = None, -1.0, None
        for vid, v in rows:
            d = assign_one(v, picked)[1]
            if d > best_d or (d == best_d and vid < best_id):
                best_id, best_d, best_v = vid, d, v
        picked.append(list(best_v))
    return picked


def init_scalable(rows, k, salt="km", rounds=5, oversample=None):
    """k-means||-style init mirroring Kmeans.initScalableCentroids:
    hash-init seed; per round select rows with md5-uniform
    u < ell * d2_9 / phi (phi = exact scale-9 sum of rounded d2);
    weight candidates by captured population; reduce with the
    deterministic weighted greedy (max weight*d2, ties lowest id)."""
    ell = oversample if oversample else 2 * k
    def hkey(r):
        return (hashlib.md5(f"{salt}:{r[0]}".encode()).hexdigest(), r[0])
    seed = sorted(rows, key=hkey)[0]
    cand = [(seed[0], list(seed[1]))]
    seen = {seed[0]}
    for r in range(rounds):
        cvecs = [v for _, v in cand]
        d29 = {}
        phi9 = 0
        for vid, v in rows:
            d = assign_one(v, cvecs)[1]
            d9 = round_dec(d, E9)
            d29[vid] = float(d9)
            phi9 += int(d9.scaleb(9))
        if phi9 <= 0:
            continue
        phi = float(Decimal(phi9).scaleb(-9))
        for vid, v in sorted(rows):  # engine collects ordered by id
            if vid in seen:
                continue
            h = hashlib.md5(f"{salt}|sc{r}:{vid}".encode()).hexdigest()
            u = (int(h[:13], 16) + 0.5) / 2.0 ** 52
            if u < (ell * d29[vid]) / phi:
                seen.add(vid)
                cand.append((vid, list(v)))
    cvecs = [v for _, v in cand]
    counts = {}
    for _, v in rows:
        j = assign_one(v, cvecs)[0]
        counts[j] = counts.get(j, 0) + 1
    n = len(cand)
    ids = [cid for cid, _ in cand]
    ws = [float(counts.get(j, 0)) for j in range(n)]
    dim = len(cvecs[0])
    min_d2 = [float("inf")] * n
    chosen = [False] * n
    seed_i = 0
    for j in range(1, n):
        if ws[j] > ws[seed_i] or (ws[j] == ws[seed_i] and ids[j] < ids[seed_i]):
            seed_i = j
    picked = [seed_i]
    chosen[seed_i] = True
    def update_min(ci):
        c = cvecs[ci]
        for i in range(n):
            if not chosen[i]:
                v = cvecs[i]
                s = 0.0
                for d in range(dim):
                    t = v[d] - c[d]
                    s += t * t
                if s < min_d2[i]:
                    min_d2[i] = s
    update_min(seed_i)
    while len(picked) < k and len(picked) < n:
        bi, bs = -1, -1.0
        for i in range(n):
            if not chosen[i]:
                s = ws[i] * min_d2[i]
                if s > bs or (s == bs and (bi < 0 or ids[i] < ids[bi])):
                    bs, bi = s, i
        chosen[bi] = True
        picked.append(bi)
        update_min(bi)
    out = [list(cvecs[i]) for i in picked]
    if len(out) < k:
        # degenerate corpus (fewer d2-selected candidates than k): the
        # engine pads from the hash-init order under salt + "|pad",
        # skipping already-chosen ids (Kmeans.initScalableCentroids) —
        # mirrored here so oracle generation replays it instead of
        # crashing (r11 advice fix)
        chosen_ids = {ids[i] for i in picked}
        rest = [(hashlib.md5(f"{salt}|pad:{rid}".encode()).hexdigest(), rid, v)
                for rid, v in rows if rid not in chosen_ids]
        rest.sort(key=lambda t: (t[0], t[1]))
        for _h, _rid, v in rest[: k - len(out)]:
            out.append(list(v))
    assert len(out) == k, f"scalable init needs >= {k} distinct non-null vectors"
    return out


def fit(rows, k, iters, init="hash"):
    if init == "farthest":
        c = init_farthest(rows, k)
    elif init == "scalable":
        c = init_scalable(rows, k)
    else:
        c = init_centroids(rows, k)
    dim = len(c[0])
    for _ in range(iters):
        sums = [[0] * dim for _ in range(k)]  # unscaled at 1e-9
        counts = [0] * k
        for _, v in rows:
            j, _, _ = assign_one(v, c)
            counts[j] += 1
            sj = sums[j]
            for i in range(dim):
                sj[i] += int(round_dec(v[i], E9).scaleb(9))
        for j in range(k):
            if counts[j] == 0:
                continue
            for i in range(dim):
                u = div_half_up_9(sums[j][i], counts[j])
                c[j][i] = float(Decimal(u).scaleb(-9))
    return c


def cosine(a, b):
    dot = na = nb = 0.0
    for i in range(min(len(a), len(b))):
        x, y = a[i], b[i]
        dot += x * y
        na += x * x
        nb += y * y
    den = (na * nb) ** 0.5
    return 0.0 if den == 0.0 else dot / den


def derive(sf_dir):
    rows = load_vectors(sf_dir)

    c = fit(rows, K, ITERS)
    assigns = [(vid, *assign_one(v, c)) for vid, v in rows]
    counts = {}
    for _, j, _, _ in assigns:
        counts[j] = counts.get(j, 0) + 1
    centroids_df = pd.DataFrame(
        [(j, d, float(round_dec(c[j][d], E6)), counts.get(j, 0))
         for j in range(K) for d in range(len(c[0]))],
        columns=["cid", "dim", "w", "n"]).astype(
        {"cid": "int64", "dim": "int64", "w": "float64", "n": "int64"})
    assign_df = pd.DataFrame(
        [(vid, j, float(round_dec(d2, E6))) for vid, j, d2, _ in assigns],
        columns=["vec_id", "cid", "d2"]).astype(
        {"vec_id": "int64", "cid": "int64", "d2": "float64"})

    # kmeans_quality: per-cluster mean simplified silhouette + mean
    # own-centroid distance; per-row terms at scale 9, double means
    qsums = {}
    for _, j, d2, d2b in assigns:
        a, b = d2 ** 0.5, d2b ** 0.5
        m = a if a > b else b
        s9 = 0 if m == 0.0 else int(round_dec((b - a) / m, E9).scaleb(9))
        a9 = int(round_dec(a, E9).scaleb(9))
        n, ss, aa = qsums.get(j, (0, 0, 0))
        qsums[j] = (n + 1, ss + s9, aa + a9)
    quality_df = pd.DataFrame(
        [(j, n,
          float(round_dec(float(Decimal(ss).scaleb(-9)) / n, E6)),
          float(round_dec(float(Decimal(aa).scaleb(-9)) / n, E6)))
         for j, (n, ss, aa) in sorted(qsums.items())],
        columns=["cid", "n", "silhouette", "avg_dist"]).astype(
        {"cid": "int64", "n": "int64", "silhouette": "float64",
         "avg_dist": "float64"})

    # kmeans_farthest: the Gonzalez-init path at sf scale (k=8, 4 iters)
    cf = fit(rows, 8, 4, init="farthest")
    fcounts = {}
    for _, v in rows:
        j = assign_one(v, cf)[0]
        fcounts[j] = fcounts.get(j, 0) + 1
    farthest_df = pd.DataFrame(
        [(j, d, float(round_dec(cf[j][d], E6)), fcounts.get(j, 0))
         for j in range(8) for d in range(len(cf[0]))],
        columns=["cid", "dim", "w", "n"]).astype(
        {"cid": "int64", "dim": "int64", "w": "float64", "n": "int64"})

    # kmeans_scalable_init: the k-means||-style large-k init path at sf
    # scale (k=8, 4 iters) — same independent derivation
    cs = fit(rows, 8, 4, init="scalable")
    scounts = {}
    for _, v in rows:
        j = assign_one(v, cs)[0]
        scounts[j] = scounts.get(j, 0) + 1
    scalable_df = pd.DataFrame(
        [(j, d, float(round_dec(cs[j][d], E6)), scounts.get(j, 0))
         for j in range(8) for d in range(len(cs[0]))],
        columns=["cid", "dim", "w", "n"]).astype(
        {"cid": "int64", "dim": "int64", "w": "float64", "n": "int64"})

    # kmeans_balanced_sample: per cell, the 20 rows with the smallest
    # (md5("bs:" + vec_id), vec_id) — same model as centroids/assign
    bs = []
    for vid, j, _, _ in assigns:
        bs.append((j, hashlib.md5(f"bs:{vid}".encode()).hexdigest(), vid))
    bal = []
    for j in sorted({c for c, _, _ in bs}):
        cell = sorted([(h, vid) for c, h, vid in bs if c == j])[:20]
        bal.extend((j, vid) for _, vid in cell)
    balanced_df = pd.DataFrame(bal, columns=["cid", "vec_id"]).astype(
        {"cid": "int64", "vec_id": "int64"})

    # dedup_semantic_kmeans: SemDeDup over the SAME k=8/6-iter model —
    # within-cell pairs with round6(cosine) >= 0.25, connected
    # components via union-find, keep = min id; members of non-trivial
    # components only
    TH = 0.25
    cells_by_id = {vid: j for vid, j, _, _ in assigns}
    by_cell = {}
    for vid, v in rows:
        by_cell.setdefault(cells_by_id[vid], []).append((vid, v))
    parent = {}
    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    dup_ids = set()
    for j, members in by_cell.items():
        members.sort()
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                (ia, va), (ib, vb) = members[ai], members[bi]
                if float(round_dec(cosine(va, vb), E6)) >= TH:
                    union(ia, ib)
                    dup_ids.add(ia); dup_ids.add(ib)
    sem = sorted((vid, cells_by_id[vid], find(vid)) for vid in dup_ids)
    sem_df = pd.DataFrame(sem, columns=["vec_id", "cid", "keep_id"]).astype(
        {"vec_id": "int64", "cid": "int64", "keep_id": "int64"})

    # ann_ivf_kmeans: its own (smaller-iteration) model
    ci = fit(rows, IVF_K, IVF_ITERS)
    cells = {vid: assign_one(v, ci)[0] for vid, v in rows}
    by_id = dict(rows)
    qids = sorted(by_id)[:NQ]
    out = []
    for qid in qids:
        q = by_id[qid]
        probed = sorted(
            ((sum((q[i] - w[i]) ** 2 for i in range(len(w))), j)
             for j, w in enumerate(ci)))[:NPROBE]
        probe_set = {j for _, j in probed}
        cand = [(vid, cosine(v, q)) for vid, v in rows
                if cells[vid] in probe_set and vid != qid]
        cand.sort(key=lambda t: (-t[1], t[0]))
        for r, (nid, sim) in enumerate(cand[:TOPK], start=1):
            out.append((qid, r, nid, float(round_dec(sim, E6))))
    ivf_df = pd.DataFrame(out, columns=["qid", "rank", "nid", "sim"]).astype(
        {"qid": "int64", "rank": "int64", "nid": "int64", "sim": "float64"})

    con = connect(sf_dir)
    ne, he = con.execute(SIG_EMB_SQL).fetchone()
    con.close()
    return (int(ne), int(he)), centroids_df, assign_df, quality_df, farthest_df, scalable_df, balanced_df, sem_df, ivf_df


def main(outfile, sf_dirs):
    per_query = {"kmeans_centroids": [], "kmeans_assign": [],
                 "kmeans_quality": [], "kmeans_farthest": [],
                 "kmeans_scalable_init": [],
                 "kmeans_balanced_sample": [], "dedup_semantic_kmeans": [],
                 "ann_ivf_kmeans": []}
    guards, schema = [], {}
    for sf_dir in sf_dirs:
        (ne, he), cdf, adf, qdf, fdf, scdf, bdf, sdf, idf = derive(sf_dir)
        guard = f"({emb_guard_sql(ne, he)})"
        guards.append(guard)
        print(f"  {sf_dir}: {len(cdf)} centroid rows, {len(adf)} assigns, "
              f"{len(qdf)} quality rows, {len(idf)} ivf rows (emb sig {ne}/{he})")
        per_query["kmeans_centroids"].append(branch_sql(cdf, guard))
        per_query["kmeans_assign"].append(branch_sql(adf, guard))
        per_query["kmeans_quality"].append(branch_sql(qdf, guard))
        per_query["kmeans_farthest"].append(branch_sql(fdf, guard))
        per_query["kmeans_scalable_init"].append(branch_sql(scdf, guard))
        per_query["kmeans_balanced_sample"].append(branch_sql(bdf, guard))
        per_query["dedup_semantic_kmeans"].append(branch_sql(sdf, guard))
        per_query["ann_ivf_kmeans"].append(branch_sql(idf, guard))
        schema = {"kmeans_centroids": cdf, "kmeans_assign": adf,
                  "kmeans_quality": qdf, "kmeans_farthest": fdf,
                  "kmeans_scalable_init": scdf,
                  "kmeans_balanced_sample": bdf,
                  "dedup_semantic_kmeans": sdf, "ann_ivf_kmeans": idf}
    existing = json.load(open(outfile)) if os.path.exists(outfile) else {}
    existing["_meta_kmeans"] = (
        "k-means expected rows derived by tools/gen_kmeans_oracle.py — an "
        "INDEPENDENT pure-Python Lloyd's implementation (md5-seeded init, "
        "sequential distance loops, DECIMAL update sums) over " +
        ", ".join(sf_dirs) + "; branch guards are (embeddings row count + "
        "md5-prefix vec_id:embedding checksum); an unmatched corpus yields "
        "the GRAFT_UNKNOWN_CORPUS sentinel row")
    for name, branches in per_query.items():
        branches = branches + [sentinel_sql(schema[name], guards)]
        header = (f"-- INDEPENDENT oracle for {name}: rows derived by an "
                  f"independent Python k-means implementation "
                  f"(tools/gen_kmeans_oracle.py re-derives them); branches "
                  f"select on the embeddings-table md5 signature\n")
        existing[name] = header + "\nUNION ALL\n".join(branches)
    with open(outfile, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"wrote {outfile} ({os.path.getsize(outfile)} bytes)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
