package graft

import graft.som.Decay

/** DuckDB oracles that REPLAY seeded SOM training end to end in SQL.
  *
  * Batch-SOM training is deterministic given (grid, seed, data): the
  * uniform init stream comes from java.util.Random(seed) (embedded here
  * as literals, laid out at the runtime embedding dim like
  * `HashOracleSql.lshTopK`), eta cancels in the batch update ratio
  * num/den, and each epoch is BMU assignment + gaussian-weighted
  * averaging — all expressible as an unrolled CTE chain. Verified exact
  * against the engine at sf0.01 and sf0.1.
  *
  * Limitation (documented, not hidden): on the adversarial edge corpus
  * the sample set is degenerate (a handful of distinct vectors, heavy
  * duplication). After smoothing, neighboring neurons' weights — and
  * then some samples' BMU distances — end up separated by less than the
  * accumulated cross-engine float-association divergence, so an exact
  * hash compare is not achievable there by ANY formula choice; the edge
  * harness skips these two queries with that reason
  * (`tools/make_edge_corpus.py` writes ORACLE_SKIP.json).
  */
object TrainOracleSql {

  private val maxDim = 64

  /** CTE chain training an x*y SOM for `epochs` epochs with the default
    * config (gaussian/rect/euclidean, sigma0=min(x,y)/2, exponential
    * decay, stdCoeff=0.5, uniform-normalized init from `seed`). Leaves
    * `ex` (vec_id, c, v), `nids`, and `cb{epochs}` (nid, c, w) in scope.
    */
  private def trainCtes(x: Int, y: Int, epochs: Int, seed: Long): Seq[String] = {
    val n = x * y
    val rnd = new java.util.Random(seed)
    val stream = Array.fill(n * maxDim)(rnd.nextDouble() * 2 - 1)
    val vals = stream.zipWithIndex
      .map { case (w, i) => s"($i, CAST($w AS DOUBLE))" }.mkString(", ")
    val sigma0 = math.min(x, y) / 2.0
    var ctes = Vector(
      s"us(idx, w) AS (SELECT * FROM (VALUES $vals))",
      "dims AS (SELECT max(len(embedding)) AS dim FROM embeddings)",
      "cb0n AS (SELECT idx // (SELECT dim FROM dims) AS nid, " +
        s"idx % (SELECT dim FROM dims) AS c, w FROM us " +
        s"WHERE idx < $n * (SELECT dim FROM dims))",
      "norm0 AS (SELECT nid, sqrt(sum(w*w)) AS nrm FROM cb0n GROUP BY nid)",
      "cb0 AS MATERIALIZED (SELECT cb0n.nid, cb0n.c, " +
        "CASE WHEN nrm > 0 THEN w / nrm ELSE w END AS w " +
        "FROM cb0n JOIN norm0 ON norm0.nid = cb0n.nid)",
      "ex AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS c, " +
        "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)",
      s"nids AS (SELECT unnest(range(0, $n)) AS nid)")
    for (t <- 0 until epochs) {
      val sig = Decay.Exponential(sigma0, 1.0, t, epochs)
      // gaussian rect: exp(-grid_dist2 / (2 * stdCoeff^2 * sigma^2));
      // eta multiplies num AND den identically, so it cancels
      val denom = 2 * 0.25 * sig * sig
      val i = t + 1
      ctes ++= Vector(
        s"d$i AS (SELECT e.vec_id, cb.nid, sum((e.v - cb.w)*(e.v - cb.w)) AS d2 " +
          s"FROM ex e JOIN cb$t cb ON cb.c = e.c GROUP BY e.vec_id, cb.nid)",
        s"b$i AS (SELECT vec_id, (array_agg(nid ORDER BY d2 ASC, nid ASC))[1] AS bmu " +
          s"FROM d$i GROUP BY vec_id)",
        s"g$i AS (SELECT b.vec_id, n.nid, " +
          s"exp(-CAST((n.nid//$y - b.bmu//$y)*(n.nid//$y - b.bmu//$y) + " +
          s"(n.nid%$y - b.bmu%$y)*(n.nid%$y - b.bmu%$y) AS DOUBLE)/$denom) AS g " +
          s"FROM b$i b CROSS JOIN nids n)",
        s"num$i AS (SELECT g.nid, e.c, sum(g.g * e.v) AS num " +
          s"FROM g$i g JOIN ex e ON e.vec_id = g.vec_id GROUP BY g.nid, e.c)",
        s"den$i AS (SELECT nid, sum(g) AS den FROM g$i GROUP BY nid)",
        s"cb$i AS MATERIALIZED (SELECT o.nid, o.c, " +
          "CASE WHEN d.den = 0 THEN o.w ELSE n.num / d.den END AS w " +
          s"FROM cb$t o JOIN den$i d ON d.nid = o.nid " +
          s"LEFT JOIN num$i n ON n.nid = o.nid AND n.c = o.c)")
    }
    ctes
  }

  /** Oracle for `som_train_activation_response`: 6x6, 3 epochs, seed 42;
    * BMU counts under the final trained codebook.
    */
  lazy val trainActivationResponse: String = {
    val e = 3
    val ctes = trainCtes(6, 6, e, 42L)
    "WITH " + ctes.mkString(",\n") + "\n" +
      "SELECT CAST(bmu AS BIGINT) AS bmu_id, CAST(count(*) AS BIGINT) AS n_wins " +
      "FROM (SELECT vec_id, (array_agg(nid ORDER BY d2 ASC, nid ASC))[1] AS bmu " +
      "FROM (SELECT e.vec_id, cb.nid, sum((e.v - cb.w)*(e.v - cb.w)) AS d2 " +
      s"FROM ex e JOIN cb$e cb ON cb.c = e.c GROUP BY e.vec_id, cb.nid) dd " +
      "GROUP BY vec_id) bb GROUP BY bmu"
  }

  /** Oracle for `ann_som_topk`: replay the 4x4/3-epoch/seed-42 coarse
    * quantizer, assign every row to its BMU cell, probe the 4 cells
    * nearest each of the first 5 queries (centroid distance, ties to
    * lower nid), rerank candidates by exact cosine.
    */
  lazy val annSomTopK: String = {
    val e = 3
    val ctes = trainCtes(4, 4, e, 42L) ++ Seq(
      // final-codebook BMU per row
      s"dfin AS (SELECT e.vec_id, cb.nid, sum((e.v - cb.w)*(e.v - cb.w)) AS d2 " +
        s"FROM ex e JOIN cb$e cb ON cb.c = e.c GROUP BY e.vec_id, cb.nid)",
      "assign AS (SELECT vec_id, (array_agg(nid ORDER BY d2 ASC, nid ASC))[1] AS bmu " +
        "FROM dfin GROUP BY vec_id)",
      "qids AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT 5)",
      // nProbe=4 nearest cells per query by centroid distance
      "probe AS (SELECT qid, nid FROM (" +
        "SELECT d.vec_id AS qid, d.nid, " +
        "row_number() OVER (PARTITION BY d.vec_id ORDER BY d.d2 ASC, d.nid ASC) AS rn " +
        "FROM dfin d WHERE d.vec_id IN (SELECT qid FROM qids)) WHERE rn <= 4)",
      "norms AS (SELECT vec_id, sum(v*v) AS nrm FROM ex GROUP BY vec_id)",
      "cand AS (SELECT p.qid, a.vec_id AS nid FROM probe p " +
        "JOIN assign a ON a.bmu = p.nid WHERE a.vec_id <> p.qid)",
      "dots AS (SELECT c.qid, c.nid, sum(a.v * b.v) AS dot " +
        "FROM cand c JOIN ex a ON a.vec_id = c.qid " +
        "JOIN ex b ON b.vec_id = c.nid AND b.c = a.c GROUP BY c.qid, c.nid)",
      "ranked AS (SELECT d.qid, d.nid, " +
        "CASE WHEN sqrt(nq.nrm * nn.nrm) = 0 THEN 0 ELSE d.dot / sqrt(nq.nrm * nn.nrm) END AS sim, " +
        "row_number() OVER (PARTITION BY d.qid ORDER BY " +
        "(CASE WHEN sqrt(nq.nrm * nn.nrm) = 0 THEN 0 ELSE d.dot / sqrt(nq.nrm * nn.nrm) END) DESC, " +
        "d.nid ASC) AS rn " +
        "FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nn ON nn.vec_id = d.nid)")
    "WITH " + ctes.mkString(",\n") + "\n" +
      "SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS BIGINT) AS rank, " +
      "CAST(nid AS BIGINT) AS nid, CAST(round(sim, 6) AS DOUBLE) AS sim " +
      "FROM ranked WHERE rn <= 5"
  }
}
