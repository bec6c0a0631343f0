package graft

import graft.plans.HashKernels

/** DuckDB oracle SQL for the hash-based dedup queries.
  *
  * The MinHash/SimHash kernels (`graft.plans.HashKernels`) are built
  * from engine-portable primitives — ASCII-whitespace tokenization,
  * FNV-1a 64 over UTF-16 code units, splitmix64 — so the full signature
  * pipeline can be reproduced bit-for-bit in DuckDB SQL: 64-bit modular
  * arithmetic runs in HUGEINT (128-bit) with explicit `mod 2^64`
  * reductions, and 64x64-bit multiplication is split into 32-bit limbs
  * so no intermediate exceeds 2^97. That turns the LSH candidate
  * queries from rows-only checks into exact hash-compared oracles.
  *
  * All values flow through the CTEs as HUGEINT in [0, 2^64); signed
  * views (for xor / signed-min parity with the JVM `Long` kernels) are
  * produced by `toS64` exactly where needed.
  */
object HashOracleSql {

  private val M64 = "18446744073709551616::HUGEINT"  // 2^64

  /** Unsigned HUGEINT in [0,2^64) -> the BIGINT with the same bits. */
  private def toS64(h: String): String =
    s"CAST(CASE WHEN $h >= 9223372036854775808::HUGEINT THEN $h - $M64 ELSE $h END AS BIGINT)"

  /** Signed BIGINT -> unsigned HUGEINT with the same bits. */
  private def toU64(x: String): String =
    s"(CASE WHEN $x < 0 THEN CAST($x AS HUGEINT) + $M64 ELSE CAST($x AS HUGEINT) END)"

  private def xor64(a: String, b: String): String =
    toU64(s"xor(${toS64(a)}, ${toS64(b)})")

  /** (a * c) mod 2^64: split `a` into 32-bit limbs so every intermediate
    * stays below 2^97 (HUGEINT overflows at 2^127).
    */
  private def mul64(a: String, c: String): String =
    s"((($a) % 4294967296::HUGEINT) * $c::HUGEINT + " +
      s"(((($a) // 4294967296::HUGEINT) * $c::HUGEINT) % 4294967296::HUGEINT) " +
      s"* 4294967296::HUGEINT) % $M64"

  private def shr(a: String, n: Int): String = s"(($a) // ${1L << n}::HUGEINT)"

  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  /** CTE chain computing `outCol` = splitmix64(`x0`) with only
    * column-reference fan-out (each stage names its intermediate, so
    * the expression strings stay linear in size). Returns (ctes, last).
    */
  private def smStages(cteIn: String, carry: Seq[String], x0: String,
                       outCol: String, prefix: String): (Seq[String], String) = {
    val cols = carry.mkString(", ")
    val s = Seq(
      s"${prefix}_a AS (SELECT $cols, (($x0) + ${u(0x9e3779b97f4a7c15L)}::HUGEINT) % $M64 AS x1 FROM $cteIn)",
      s"${prefix}_b AS (SELECT $cols, ${mul64(xor64("x1", shr("x1", 30)), u(0xbf58476d1ce4e5b9L))} AS x2 FROM ${prefix}_a)",
      s"${prefix}_c AS (SELECT $cols, ${mul64(xor64("x2", shr("x2", 27)), u(0x94d049bb133111ebL))} AS x3 FROM ${prefix}_b)",
      s"${prefix}_d AS (SELECT $cols, ${xor64("x3", shr("x3", 31))} AS $outCol FROM ${prefix}_c)")
    (s, s"${prefix}_d")
  }

  /** ASCII-whitespace class — must stay in sync with `HashKernels.isWs`. */
  private val ws = """[\t\n\x0b\f\r ]+"""

  private val fnvInit = u(0xcbf29ce484222325L)

  /** documents -> th(doc_id, tpos, th): FNV-1a 64 of each whitespace
    * token over its UTF-16 code units (surrogate pairs expanded to
    * match the JVM's CharSequence view of astral code points).
    * `docWhere` restricts the doc set (default: all non-null-text docs)
    * — banding/signatures are per-doc, so a restricted replay equals
    * the full replay filtered to those docs, at a fraction of the cost
    * (the dedup_pr oracle replays only its fixed-size sample).
    */
  private def tokenHashCtes(docWhere: String = "TRUE"): Seq[String] = Seq(
    s"t0 AS (SELECT doc_id, list_filter(string_split_regex(text, '$ws'), x -> length(x) > 0) AS toks " +
      s"FROM documents WHERE text IS NOT NULL AND ($docWhere))",
    "t1 AS (SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS tpos FROM t0)",
    "t2 AS (SELECT doc_id, tpos, toks[tpos] AS tok FROM t1)",
    "c0 AS (SELECT doc_id, tpos, tok, unnest(range(1, length(tok)+1)) AS cpos FROM t2)",
    "c1 AS (SELECT doc_id, tpos, cpos, ord(substr(tok, cpos, 1)) AS cp FROM c0)",
    "c2 AS (SELECT doc_id, tpos, cpos, CASE WHEN cp < 65536 THEN [cp] " +
      "ELSE [55296 + (cp-65536)//1024, 56320 + (cp-65536)%1024] END AS us FROM c1)",
    "c3 AS (SELECT doc_id, tpos, cpos, unnest(us) AS unit, generate_subscripts(us, 1) AS sub FROM c2)",
    "ul AS (SELECT doc_id, tpos, list(CAST(unit AS HUGEINT) ORDER BY cpos, sub) AS units " +
      "FROM c3 GROUP BY doc_id, tpos)",
    s"th AS MATERIALIZED (SELECT doc_id, tpos, list_reduce(list_concat([$fnvInit::HUGEINT], units), " +
      s"(h, c) -> ${mul64(xor64("h", "c"), "1099511628211")}) AS th FROM ul)")

  /** CTEs from documents to sig(doc_id, sig list of 64 signed BIGINT) —
    * the exact mirror of `HashKernels.minhash(text, 64, 3, seed=13)`.
    */
  private def minhashSigCtes(docWhere: String = "TRUE"): Seq[String] = {
    var ctes = tokenHashCtes(docWhere).toVector
    ctes :+=
      "sh0 AS (SELECT a.doc_id, a.tpos AS spos, a.th AS th0, b.th AS th1, c.th AS th2 " +
        "FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.tpos = a.tpos + 1 " +
        "JOIN th c ON a.doc_id = c.doc_id AND c.tpos = a.tpos + 2)"
    val (s0, l0) = smStages("sh0", Seq("doc_id", "spos", "th1", "th2"),
      xor64(s"$fnvInit::HUGEINT", "th0"), "f0", "sm0")
    ctes ++= s0
    val (s1, l1) = smStages(l0, Seq("doc_id", "spos", "th2"), xor64("f0", "th1"), "f1", "sm1")
    ctes ++= s1
    val (s2, l2) = smStages(l1, Seq("doc_id", "spos"), xor64("f1", "th2"), "sh", "sm2")
    ctes ++= s2
    // the 64 per-hash seeds are splitmix64(13 + k) — computed HERE by
    // the same JVM kernel the engine uses, embedded as literals
    val seeds = (0 until 64)
      .map(k => s"($k, ${u(HashKernels.splitmix64(13L + k))}::HUGEINT)").mkString(", ")
    ctes :+= s"ks(k, kseed) AS (SELECT * FROM (VALUES $seeds))"
    ctes :+= s"mh0 AS (SELECT doc_id, k, ${xor64("sh", "kseed")} AS x0 FROM $l2, ks)"
    val (s3, l3) = smStages("mh0", Seq("doc_id", "k"), "x0", "hv", "sm3")
    ctes ++= s3
    // SIGNED min — the JVM kernel minimizes over Long comparison
    ctes :+= s"sigv AS (SELECT doc_id, k, min(${toS64("hv")}) AS mv FROM $l3 GROUP BY doc_id, k)"
    ctes :+= "sig AS MATERIALIZED (SELECT doc_id, list(mv ORDER BY k) AS sig FROM sigv GROUP BY doc_id)"
    ctes
  }

  /** Oracle for `dedup_minhash`: banded LSH candidates (8 bands x 8
    * rows) with the full-signature jaccard estimate.
    */
  lazy val minhashCandidates: String = minhashCandidatesWhere("TRUE")

  /** `minhashCandidates` over only the docs matching `docWhere` —
    * identical per-pair semantics (LSH banding and signature agreement
    * are pairwise properties), restricted replay cost.
    */
  def minhashCandidatesWhere(docWhere: String): String = {
    val ctes = minhashSigCtes(docWhere) ++ Seq(
      "bands AS MATERIALIZED (SELECT doc_id, b, sig[b*8+1 : b*8+8] AS chunk FROM sig, " +
        "(SELECT unnest(range(0, 8)) AS b))",
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a " +
        "JOIN bands b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id)")
    "WITH " + ctes.mkString(",\n") + "\n" +
      "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, " +
      "ROUND(CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64, 6) AS est_jaccard " +
      "FROM cand JOIN sig sa ON sa.doc_id = cand.id_a JOIN sig sb ON sb.doc_id = cand.id_b"
  }

  /** Oracle for `dedup_simhash` (8 bands x 8 bits, hamming <= 7):
    * per-bit majority vote over token FNV hashes, banded candidates,
    * exact hamming verify.
    */
  lazy val simhashCandidates: String = {
    val pws = (0 until 64).map(b => s"($b, ${java.lang.Long.toUnsignedString(1L << b)}::HUGEINT)").mkString(", ")
    val cpws = (0 until 8).map(b => s"($b, ${java.lang.Long.toUnsignedString(1L << (8 * b))}::HUGEINT)").mkString(", ")
    val ctes = tokenHashCtes() ++ Seq(
      s"pw(bit, pw) AS (SELECT * FROM (VALUES $pws))",
      "votes AS (SELECT doc_id, bit, pw, " +
        "SUM(CASE WHEN (th // pw) % 2 = 1 THEN 1 ELSE -1 END) AS v " +
        "FROM th, pw GROUP BY doc_id, bit, pw)",
      "fps0 AS (SELECT doc_id, SUM(CASE WHEN v > 0 THEN pw ELSE 0::HUGEINT END) AS fp " +
        "FROM votes GROUP BY doc_id)",
      // docs with text but no tokens get fp = 0 (they band together);
      // NULL text yields a NULL fingerprint engine-side (null-intolerant
      // expression) and never matches a band — excluded here too
      "fps AS (SELECT d.doc_id, COALESCE(f.fp, 0::HUGEINT) AS fp " +
        "FROM documents d LEFT JOIN fps0 f ON d.doc_id = f.doc_id " +
        "WHERE d.text IS NOT NULL)",
      s"cw(band, cpw) AS (SELECT * FROM (VALUES $cpws))",
      "bands AS MATERIALIZED (SELECT doc_id, fp, band, (fp // cpw) % 256 AS chunk FROM fps, cw)",
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, " +
        s"bit_count(xor(${toS64("a.fp")}, ${toS64("b.fp")})) AS hamming " +
        "FROM bands a JOIN bands b ON a.band = b.band AND a.chunk = b.chunk " +
        "AND a.doc_id < b.doc_id)")
    "WITH " + ctes.mkString(",\n") + "\n" +
      "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, " +
      "CAST(hamming AS BIGINT) AS hamming FROM cand WHERE hamming <= 7"
  }

  /** Oracle for `ann_lsh_topk`: the random hyperplanes are SEEDED
    * (scala.util.Random(31), Gaussian), so the exact plane tensor the
    * engine uses is regenerated here and embedded as literals — the
    * bucketing, candidate sets, and rerank are then fully reproducible
    * in SQL. Mirrors `Similarity.lshCosineTopK(..., k=5, numPlanes=6,
    * numTables=8, seed=31)` over 64-dim embeddings with the first 5
    * vec_ids as queries.
    */
  lazy val lshTopK: String =
    lshRankedWith + "\n" +
      """SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS BIGINT) AS rank,
        |       CAST(nid AS BIGINT) AS nid, CAST(round(sim, 6) AS DOUBLE) AS sim
        |FROM ranked WHERE rn <= 5""".stripMargin

  /** Shared WITH-chain ending at the LSH `ranked` CTE (plus `ex`,
    * `norms`, `qids` reused by the recall oracle's brute-force leg).
    */
  private lazy val lshRankedWith: String = {
    val numPlanes = 6; val numTables = 8; val maxDim = 64
    val rnd = new scala.util.Random(31)
    // the engine sizes its plane tensor from the RUNTIME embedding dim
    // (planes[(t*numPlanes+p)*dim + i] drawn sequentially), so the
    // oracle embeds the raw Gaussian STREAM and rebuilds the layout in
    // SQL from the actual dim — one oracle serves any dim <= maxDim
    val stream = Array.fill(numTables * numPlanes * maxDim)(rnd.nextGaussian())
    val rows = stream.zipWithIndex.map { case (w, idx) => s"($idx, $w)" }
    s"""WITH gs(idx, w) AS (SELECT * FROM (VALUES ${rows.mkString(", ")})),
       |dims AS (SELECT max(len(embedding)) AS dim FROM embeddings),
       |ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings
       |), norms AS (SELECT vec_id, sum(v * v) AS nrm FROM ex GROUP BY vec_id),
       |tp AS (SELECT a.t, b.p FROM (SELECT unnest(range(0, $numTables)) AS t) a,
       |       (SELECT unnest(range(0, $numPlanes)) AS p) b),
       |proj AS (
       |  SELECT e.vec_id, tp.t, tp.p, sum(e.v * g.w) AS s
       |  FROM ex e CROSS JOIN tp
       |  JOIN gs g ON g.idx = (tp.t * $numPlanes + tp.p) * (SELECT dim FROM dims) + (e.i - 1)
       |  GROUP BY e.vec_id, tp.t, tp.p
       |), buck AS MATERIALIZED (
       |  SELECT vec_id, t,
       |         SUM(CASE WHEN s > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
       |  FROM proj GROUP BY vec_id, t
       |), qids AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT 5),
       |cand AS (
       |  SELECT DISTINCT qb.vec_id AS qid, nb.vec_id AS nid
       |  FROM buck qb JOIN buck nb ON nb.t = qb.t AND nb.bucket = qb.bucket
       |  WHERE qb.vec_id IN (SELECT qid FROM qids) AND nb.vec_id <> qb.vec_id
       |), dots AS (
       |  SELECT c.qid, c.nid, sum(a.v * b.v) AS dot
       |  FROM cand c JOIN ex a ON a.vec_id = c.qid
       |              JOIN ex b ON b.vec_id = c.nid AND b.i = a.i
       |  GROUP BY c.qid, c.nid
       |), ranked AS (
       |  SELECT d.qid, d.nid,
       |         CASE WHEN sqrt(nq.nrm * nn.nrm) = 0 THEN 0
       |              ELSE d.dot / sqrt(nq.nrm * nn.nrm) END AS sim,
       |         row_number() OVER (PARTITION BY d.qid
       |           ORDER BY (CASE WHEN sqrt(nq.nrm * nn.nrm) = 0 THEN 0
       |                          ELSE d.dot / sqrt(nq.nrm * nn.nrm) END) DESC,
       |                    d.nid ASC) AS rn
       |  FROM dots d JOIN norms nq ON nq.vec_id = d.qid
       |              JOIN norms nn ON nn.vec_id = d.nid)""".stripMargin
  }

  /** Oracle for `ann_recall`: per-query |LSH top-k ∩ brute-force top-k|
    * / k. Replays the full LSH pipeline (same CTE chain as `lshTopK`)
    * AND an exhaustive cosine ranking, intersects the two top-5 id sets,
    * and emits recall per query — a qid with no surviving candidates
    * still appears with recall 0 (LEFT JOIN from `qids`).
    */
  lazy val annRecall: String =
    lshRankedWith + ",\n" +
      """bdots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v * b.v) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id <> a.vec_id
        |  WHERE a.vec_id IN (SELECT qid FROM qids)
        |  GROUP BY a.vec_id, b.vec_id
        |), branked AS (
        |  SELECT d.qid, d.nid,
        |         row_number() OVER (PARTITION BY d.qid
        |           ORDER BY (CASE WHEN sqrt(nq.nrm * nn.nrm) = 0 THEN 0
        |                          ELSE d.dot / sqrt(nq.nrm * nn.nrm) END) DESC,
        |                    d.nid ASC) AS rn
        |  FROM bdots d JOIN norms nq ON nq.vec_id = d.qid
        |               JOIN norms nn ON nn.vec_id = d.nid
        |), hits AS (
        |  SELECT qid, count(*) AS n FROM (
        |    SELECT qid, nid FROM ranked WHERE rn <= 5
        |    INTERSECT
        |    SELECT qid, nid FROM branked WHERE rn <= 5) GROUP BY qid)
        |SELECT CAST(q.qid AS BIGINT) AS qid,
        |       CAST(round(COALESCE(h.n, 0) / 5.0, 6) AS DOUBLE) AS recall
        |FROM qids q LEFT JOIN hits h ON h.qid = q.qid""".stripMargin

  /** Oracle for `dedup_resolve_minhash`: minhash candidates with
    * est_jaccard >= 0.5 (signature agreement >= 32/64 — compared in
    * integers, no float boundary), collapsed to keep-id clusters by the
    * same unrolled min-label + pointer-jump fixpoint used for
    * `dedup_resolve_clusters`.
    */
  /** Unrolled pointer-jump depth of the cluster oracles; the final CTE
    * is `lab$clusterRounds` — interpolated in every consumer so raising
    * the depth cannot silently leave a SELECT on an intermediate level.
    */
  private val clusterRounds = 16

  /** Shared WITH-clause: minhash signatures -> banding -> candidate
    * edges at >= 32/64 agreement (est_jaccard >= 0.5) -> `clusterRounds`
    * unrolled neighbor-min + pointer-jump levels.
    */
  private lazy val minhashClusterWith: String = {
    val rounds = clusterRounds
    val levels = (1 to rounds).map { i =>
      s"""nbr$i AS (
         |  SELECT e.id, min(l.keep_id) AS nk
         |  FROM edges e JOIN lab${i - 1} l ON l.id = e.nbr GROUP BY e.id
         |), step$i AS MATERIALIZED (
         |  SELECT l.id, least(l.keep_id, COALESCE(n.nk, l.keep_id)) AS keep_id
         |  FROM lab${i - 1} l LEFT JOIN nbr$i n ON n.id = l.id
         |), lab$i AS MATERIALIZED (
         |  SELECT s.id, least(s.keep_id, COALESCE(j.keep_id, s.keep_id)) AS keep_id
         |  FROM step$i s LEFT JOIN step$i j ON j.id = s.keep_id
         |)""".stripMargin
    }.mkString(", ")
    val ctes = minhashSigCtes() ++ Seq(
      "bands AS MATERIALIZED (SELECT doc_id, b, sig[b*8+1 : b*8+8] AS chunk FROM sig, " +
        "(SELECT unnest(range(0, 8)) AS b))",
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a " +
        "JOIN bands b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id)",
      "e AS MATERIALIZED (SELECT id_a, id_b FROM cand " +
        "JOIN sig sa ON sa.doc_id = cand.id_a JOIN sig sb ON sb.doc_id = cand.id_b " +
        "WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) >= 32)",
      "edges AS (SELECT id_a AS id, id_b AS nbr FROM e UNION ALL SELECT id_b AS id, id_a AS nbr FROM e)",
      "lab0 AS (SELECT id, least(id, min(nbr)) AS keep_id FROM edges GROUP BY id)",
      levels)
    "WITH " + ctes.mkString(",\n") + "\n"
  }

  lazy val resolveMinhash: String =
    minhashClusterWith +
      s"SELECT CAST(id AS BIGINT) AS id, CAST(keep_id AS BIGINT) AS keep_id FROM lab$clusterRounds"

  /** Survivors of the one-call near-dedup: every non-null-text document
    * whose id is not a dropped (id != keep_id) cluster member. NOT
    * EXISTS, not NOT IN: a NULL doc_id never matches the engine's
    * left_anti equi-join (row kept), and NOT EXISTS agrees by
    * construction where NOT IN would return NULL and silently drop it.
    */
  lazy val dropNearMinhash: String =
    minhashClusterWith +
      s"""SELECT CAST(d.doc_id AS BIGINT) AS doc_id
         |FROM documents d
         |WHERE d.text IS NOT NULL
         |  AND NOT EXISTS (SELECT 1 FROM lab$clusterRounds l
         |                  WHERE l.id != l.keep_id AND l.id = d.doc_id)""".stripMargin
}
