package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.som._

/** The driver-checked query inventory: every operator from SURVEY.md §2
  * gets an entry here, plus the LLM-data-pipeline operators. Queries that
  * are ANSI-SQL-expressible also get a DuckDB oracle in `oracles`
  * (column names and types must match exactly — everything numeric is
  * cast to BIGINT/DOUBLE and float outputs are rounded to 6 decimals on
  * both sides).
  *
  * SOM inference queries run against a FIXED deterministic codebook (the
  * first 9 embeddings by vec_id, a 3x3 map) so the oracle can recompute
  * them; training itself is exercised by `som_epoch_update` (one epoch
  * from that codebook — SQL-expressible) and by the non-oracled
  * `som_train_*` queries.
  */
object Queries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** First 9 embeddings by vec_id as a 3x3 codebook (driver-local, like
    * the reference's in-core codebook).
    */
  private def fixedRows(s: SparkSession, dir: String): Seq[Array[Double]] =
    emb(s, dir).orderBy("vec_id").limit(9).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toSeq

  private def fixedModel(s: SparkSession, dir: String, distance: String = "euclidean",
                         normP: Double = 2.0): SomModel =
    SomModel.fromWeights(
      SomConfig(3, 3, distance = distance, normP = normP), fixedRows(s, dir))

  /** Shared oracle CTE: codebook + per-(sample, neuron) squared euclidean
    * distance, all math in DOUBLE.
    */
  private val cbDistCte: String =
    """WITH cb AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS nid, embedding AS w
      |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 9)
      |), d AS (
      |  SELECT e.vec_id, c.nid,
      |         sum((CAST(u.v AS DOUBLE) - CAST(c.w[u.i] AS DOUBLE))
      |           * (CAST(u.v AS DOUBLE) - CAST(c.w[u.i] AS DOUBLE))) AS dist2
      |  FROM embeddings e CROSS JOIN cb c,
      |       LATERAL (SELECT unnest(e.embedding) AS v,
      |                       generate_subscripts(e.embedding, 1) AS i) u
      |  GROUP BY e.vec_id, c.nid
      |)""".stripMargin

  // ------------------------------------------------------------ queries

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // winner / predict (xpysom.py:370-417,608-617)
    "som_winner" -> ((s, dir) =>
      fixedModel(s, dir).transform(emb(s, dir), "embedding")
        .select(col("vec_id").cast("long").as("vec_id"),
                col("bmu_id").cast("long").as("bmu_id"))),

    // activation_response (xpysom.py:819-829)
    "som_activation_response" -> ((s, dir) =>
      fixedModel(s, dir).activationResponse(emb(s, dir), "embedding")
        .select(col("bmu_id").cast("long").as("bmu_id"),
                col("n_wins").cast("long").as("n_wins"))),

    // win_map (xpysom.py:831-840) in relational form: group key + member
    "som_win_map" -> ((s, dir) =>
      fixedModel(s, dir).transform(emb(s, dir), "embedding")
        .select(col("bmu_id").cast("long").as("bmu_id"),
                col("vec_id").cast("long").as("vec_id"))),

    // labels_map (xpysom.py:842-865)
    "som_labels_map" -> ((s, dir) =>
      fixedModel(s, dir).labelsMap(emb(s, dir), "label", "embedding")
        .select(col("bmu_id").cast("long").as("bmu_id"),
                col("label").cast("long").as("label"),
                col("n").cast("long").as("n"))),

    // quantization (xpysom.py:620-645)
    "som_quantization" -> ((s, dir) =>
      fixedModel(s, dir).quantize(emb(s, dir), "embedding")
        .select(col("vec_id").cast("long").as("vec_id"),
                posexplode(col("quantized")).as(Seq("dim", "q")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
                col("q").cast("double").as("q"))),

    // quantization_error (xpysom.py:673-707)
    "som_quantization_error" -> ((s, dir) => {
      val qe = fixedModel(s, dir).quantizationError(emb(s, dir), "embedding")
      s.createDataFrame(Seq(Tuple1(r6(qe)))).toDF("qe")
    }),

    // topographic_error (xpysom.py:709-746)
    "som_topographic_error" -> ((s, dir) => {
      val te = fixedModel(s, dir).topographicError(emb(s, dir), "embedding")
      s.createDataFrame(Seq(Tuple1(r6(te)))).toDF("te")
    }),

    // distance kernels (distances.py) exploded per (sample, neuron)
    "som_distance_euclidean" -> ((s, dir) =>
      distanceQuery(s, dir, "euclidean_no_opt", sqrtDist = true)),
    "som_distance_cosine" -> ((s, dir) =>
      distanceQuery(s, dir, "cosine", sqrtDist = false)),
    "som_distance_manhattan" -> ((s, dir) =>
      distanceQuery(s, dir, "manhattan", sqrtDist = false)),
    "som_distance_norm_p3" -> ((s, dir) =>
      distanceQuery(s, dir, "norm_p", sqrtDist = false, normP = 3.0)),

    // one full training epoch from the fixed codebook (xpysom.py:420-455)
    "som_epoch_update" -> ((s, dir) => {
      val som = new Som(SomConfig(3, 3, sigma = 1.0, stdCoeff = 0.5, seed = 0))
      val model = som.fit(emb(s, dir), "embedding", numEpochs = 1,
        init = Codebook.fromRows(3, 3, fixedRows(s, dir)))
      val rows = for (n <- 0 until 9; c <- 0 until model.dim) yield
        (n.toLong, c.toLong, r6(model.codebook.weights(n * model.dim + c)))
      s.createDataFrame(rows).toDF("nid", "dim", "w")
    }),

    // decay schedules (decays.py)
    "som_decays" -> ((s, dir) => {
      val rows = (0 until 10).map { t =>
        (t.toLong,
          r6(Decay.Linear(0.5, 0.01, t, 10)),
          r6(Decay.Exponential(0.5, 0.01, t, 10)),
          r6(Decay.Asymptotic(0.5, 0.01, t, 10)))
      }
      s.createDataFrame(rows).toDF("t", "lin", "exp", "asym")
    }),

    // neighborhood kernels (neighborhoods.py) over all centers of a 5x5 grid
    "som_neighborhood_gaussian" -> ((s, dir) => neighborhoodQuery(s, "gaussian")),
    "som_neighborhood_mexican_hat" -> ((s, dir) => neighborhoodQuery(s, "mexican_hat")),
    "som_neighborhood_bubble" -> ((s, dir) => neighborhoodQuery(s, "bubble")),
    "som_neighborhood_triangle" -> ((s, dir) => neighborhoodQuery(s, "triangle")),

    // U-matrix over the fixed codebook (xpysom.py:788-817)
    "som_umatrix" -> ((s, dir) => {
      val dm = Codebook.fromRows(3, 3, fixedRows(s, dir)).distanceMap(Rectangular(3, 3))
      val rows = for (i <- 0 until 3; j <- 0 until 3)
        yield (i.toLong, j.toLong, r6(dm(i)(j)))
      s.createDataFrame(rows).toDF("i", "j", "u")
    }),

    // hexagonal euclidean coordinates (xpysom.py:291-320,205-206)
    "som_hex_coords" -> ((s, dir) => {
      val m = SomModel.fromWeights(
        SomConfig(5, 5, topology = "hexagonal"),
        Seq.fill(25)(Array(0.0)))
      val rows = m.euclideanCoordinates.map { case (i, j, ex, ey) =>
        (i.toLong, j.toLong, ex, ey)
      }
      s.createDataFrame(rows).toDF("i", "j", "ex", "ey")
    }),

    // full training on embeddings — not SQL-expressible; rows-only check
    "som_train_activation_response" -> ((s, dir) => {
      val df = emb(s, dir)
      val model = new Som(SomConfig(6, 6, seed = 42)).fit(df, "embedding", numEpochs = 3)
      model.activationResponse(df, "embedding")
        .select(col("bmu_id").cast("long").as("bmu_id"),
                col("n_wins").cast("long").as("n_wins"))
    })
  )

  /** Round to 6 decimals HALF_UP — same mode as Spark's `round()` and
    * DuckDB's `round()`, so hashes match bit-exactly.
    */
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exploded per-(sample, neuron) distances through the model's
    * activation path (`activate`, xpysom.py:323-354).
    */
  private def distanceQuery(s: SparkSession, dir: String, distance: String,
                            sqrtDist: Boolean, normP: Double = 2.0): DataFrame = {
    val m = fixedModel(s, dir, distance = distance, normP = normP)
    val base = m.activate(emb(s, dir), "embedding")
      .select(col("vec_id").cast("long").as("vec_id"),
              posexplode(col("activation")).as(Seq("nid", "dist")))
    val d = if (sqrtDist) sqrt(greatest(col("dist"), lit(0.0))) else col("dist")
    base.select(col("vec_id"), col("nid").cast("long").as("nid"),
                round(d, 6).as("dist"))
  }

  /** All-centers neighborhood dump on a 5x5 rect grid, sigma=1,
    * std_coeff=0.5 (driver-local math, like the reference kernels).
    */
  private def neighborhoodQuery(s: SparkSession, name: String): DataFrame = {
    val topo = Rectangular(5, 5)
    val n = Neighborhoods(name, topo, stdCoeff = 0.5, compact = false)
    val out = new Array[Double](25)
    val rows = (for (ci <- 0 until 5; cj <- 0 until 5) yield {
      n.compute(Array(ci), Array(cj), 1, 1.0, out)
      (for (i <- 0 until 5; j <- 0 until 5)
        yield (ci.toLong, cj.toLong, i.toLong, j.toLong, r6(out(i * 5 + j)))).toVector
    }).flatten
    s.createDataFrame(rows).toDF("ci", "cj", "i", "j", "g")
  }

  // ------------------------------------------------------------ oracles

  val oracles: Map[String, String] = Map(
    "som_winner" ->
      s"""$cbDistCte
         |SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |       (array_agg(nid ORDER BY dist2 ASC, nid ASC))[1] AS bmu_id
         |FROM d GROUP BY vec_id""".stripMargin,

    "som_activation_response" ->
      s"""$cbDistCte, bmu AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         (array_agg(nid ORDER BY dist2 ASC, nid ASC))[1] AS bmu_id
         |  FROM d GROUP BY vec_id)
         |SELECT bmu_id, CAST(count(*) AS BIGINT) AS n_wins FROM bmu GROUP BY bmu_id""".stripMargin,

    "som_win_map" ->
      s"""$cbDistCte
         |SELECT (array_agg(nid ORDER BY dist2 ASC, nid ASC))[1] AS bmu_id,
         |       CAST(vec_id AS BIGINT) AS vec_id
         |FROM d GROUP BY vec_id""".stripMargin,

    "som_labels_map" ->
      s"""$cbDistCte, bmu AS (
         |  SELECT vec_id, (array_agg(nid ORDER BY dist2 ASC, nid ASC))[1] AS bmu_id
         |  FROM d GROUP BY vec_id)
         |SELECT b.bmu_id, CAST(e.label AS BIGINT) AS label,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM bmu b JOIN embeddings e ON b.vec_id = e.vec_id
         |GROUP BY b.bmu_id, e.label""".stripMargin,

    "som_quantization" ->
      s"""$cbDistCte, bmu AS (
         |  SELECT vec_id, (array_agg(nid ORDER BY dist2 ASC, nid ASC))[1] AS bmu_id
         |  FROM d GROUP BY vec_id)
         |SELECT CAST(b.vec_id AS BIGINT) AS vec_id,
         |       CAST(u.i - 1 AS BIGINT) AS dim,
         |       CAST(c.w[u.i] AS DOUBLE) AS q
         |FROM bmu b JOIN cb c ON b.bmu_id = c.nid,
         |     LATERAL (SELECT generate_subscripts(c.w, 1) AS i) u""".stripMargin,

    "som_quantization_error" ->
      s"""$cbDistCte
         |SELECT CAST(round(avg(sqrt(m)), 6) AS DOUBLE) AS qe
         |FROM (SELECT vec_id, min(dist2) AS m FROM d GROUP BY vec_id)""".stripMargin,

    "som_topographic_error" ->
      s"""$cbDistCte, ranked AS (
         |  SELECT vec_id, nid, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, nid ASC) AS rn
         |  FROM d)
         |SELECT CAST(round(avg(CASE WHEN abs(b1.nid // 3 - b2.nid // 3) > 1
         |                            OR abs(b1.nid % 3 - b2.nid % 3) > 1
         |                           THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS te
         |FROM ranked b1 JOIN ranked b2 ON b1.vec_id = b2.vec_id AND b1.rn = 1 AND b2.rn = 2""".stripMargin,

    "som_distance_euclidean" ->
      s"""$cbDistCte
         |SELECT CAST(vec_id AS BIGINT) AS vec_id, nid,
         |       CAST(round(sqrt(dist2), 6) AS DOUBLE) AS dist FROM d""".stripMargin,

    "som_distance_cosine" ->
      """WITH cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS nid, embedding AS w
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 9)
        |), d AS (
        |  SELECT e.vec_id, c.nid,
        |         sum(CAST(u.v AS DOUBLE) * CAST(c.w[u.i] AS DOUBLE)) AS dot,
        |         sum(CAST(u.v AS DOUBLE) * CAST(u.v AS DOUBLE)) AS x2,
        |         sum(CAST(c.w[u.i] AS DOUBLE) * CAST(c.w[u.i] AS DOUBLE)) AS w2
        |  FROM embeddings e CROSS JOIN cb c,
        |       LATERAL (SELECT unnest(e.embedding) AS v,
        |                       generate_subscripts(e.embedding, 1) AS i) u
        |  GROUP BY e.vec_id, c.nid
        |)
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, nid,
        |       CAST(round(1 - CASE WHEN sqrt(x2 * w2) = 0 THEN 0
        |                           ELSE dot / sqrt(x2 * w2) END, 6) AS DOUBLE) AS dist
        |FROM d""".stripMargin,

    "som_distance_manhattan" ->
      """WITH cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS nid, embedding AS w
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 9)
        |)
        |SELECT CAST(e.vec_id AS BIGINT) AS vec_id, c.nid,
        |       CAST(round(sum(abs(CAST(u.v AS DOUBLE) - CAST(c.w[u.i] AS DOUBLE))), 6) AS DOUBLE) AS dist
        |FROM embeddings e CROSS JOIN cb c,
        |     LATERAL (SELECT unnest(e.embedding) AS v,
        |                     generate_subscripts(e.embedding, 1) AS i) u
        |GROUP BY e.vec_id, c.nid""".stripMargin,

    "som_distance_norm_p3" ->
      """WITH cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS nid, embedding AS w
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 9)
        |)
        |SELECT CAST(e.vec_id AS BIGINT) AS vec_id, c.nid,
        |       CAST(round(sum(pow(abs(CAST(u.v AS DOUBLE) - CAST(c.w[u.i] AS DOUBLE)), 3)), 6) AS DOUBLE) AS dist
        |FROM embeddings e CROSS JOIN cb c,
        |     LATERAL (SELECT unnest(e.embedding) AS v,
        |                     generate_subscripts(e.embedding, 1) AS i) u
        |GROUP BY e.vec_id, c.nid""".stripMargin,

    "som_epoch_update" ->
      s"""$cbDistCte, bmu AS (
         |  SELECT vec_id, (array_agg(nid ORDER BY dist2 ASC, nid ASC))[1] AS bmu_id
         |  FROM d GROUP BY vec_id),
         |g AS (
         |  SELECT b.vec_id, c.nid,
         |         0.5 * exp(-CAST((c.nid // 3 - b.bmu_id // 3) * (c.nid // 3 - b.bmu_id // 3) AS DOUBLE) / 0.5)
         |             * exp(-CAST((c.nid % 3 - b.bmu_id % 3) * (c.nid % 3 - b.bmu_id % 3) AS DOUBLE) / 0.5) AS g
         |  FROM bmu b CROSS JOIN cb c),
         |num AS (
         |  SELECT g.nid, CAST(u.i - 1 AS BIGINT) AS dim,
         |         sum(g.g * CAST(u.v AS DOUBLE)) AS num
         |  FROM g JOIN embeddings e ON g.vec_id = e.vec_id,
         |       LATERAL (SELECT unnest(e.embedding) AS v,
         |                       generate_subscripts(e.embedding, 1) AS i) u
         |  GROUP BY g.nid, u.i),
         |den AS (SELECT nid, sum(g) AS den FROM g GROUP BY nid)
         |SELECT num.nid, num.dim,
         |       CAST(round(num.num / den.den, 6) AS DOUBLE) AS w
         |FROM num JOIN den ON num.nid = den.nid""".stripMargin,

    "som_decays" ->
      """SELECT CAST(t AS BIGINT) AS t,
        |       CAST(round(0.5 + (0.01 - 0.5) * t / 9.0, 6) AS DOUBLE) AS lin,
        |       CAST(round(0.5 * exp(-t * (-ln(0.01 / 0.5) / 10.0)), 6) AS DOUBLE) AS exp,
        |       CAST(round(0.5 / (1 + 2.0 * t / 10.0), 6) AS DOUBLE) AS asym
        |FROM generate_series(0, 9) s(t)""".stripMargin,

    "som_neighborhood_gaussian" ->
      """SELECT CAST(ci AS BIGINT) AS ci, CAST(cj AS BIGINT) AS cj,
        |       CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(round(exp(-CAST((i - ci) * (i - ci) AS DOUBLE) / 0.5)
        |                * exp(-CAST((j - cj) * (j - cj) AS DOUBLE) / 0.5), 6) AS DOUBLE) AS g
        |FROM generate_series(0, 4) a(ci), generate_series(0, 4) b(cj),
        |     generate_series(0, 4) c(i), generate_series(0, 4) e(j)""".stripMargin,

    "som_neighborhood_mexican_hat" ->
      """SELECT CAST(ci AS BIGINT) AS ci, CAST(cj AS BIGINT) AS cj,
        |       CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(round(exp(-CAST((i-ci)*(i-ci) + (j-cj)*(j-cj) AS DOUBLE) / 0.5)
        |                * (1 - 4.0 * CAST((i-ci)*(i-ci) + (j-cj)*(j-cj) AS DOUBLE)), 6) AS DOUBLE) AS g
        |FROM generate_series(0, 4) a(ci), generate_series(0, 4) b(cj),
        |     generate_series(0, 4) c(i), generate_series(0, 4) e(j)""".stripMargin,

    "som_neighborhood_bubble" ->
      """SELECT CAST(ci AS BIGINT) AS ci, CAST(cj AS BIGINT) AS cj,
        |       CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(CASE WHEN i > ci - 1 AND i < ci + 1 AND j > cj - 1 AND j < cj + 1
        |                 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS g
        |FROM generate_series(0, 4) a(ci), generate_series(0, 4) b(cj),
        |     generate_series(0, 4) c(i), generate_series(0, 4) e(j)""".stripMargin,

    "som_neighborhood_triangle" ->
      """SELECT CAST(ci AS BIGINT) AS ci, CAST(cj AS BIGINT) AS cj,
        |       CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(round(greatest(0.0, 1.0 - abs(CAST(ci - i AS DOUBLE)))
        |                * greatest(0.0, 1.0 - abs(CAST(cj - j AS DOUBLE))), 6) AS DOUBLE) AS g
        |FROM generate_series(0, 4) a(ci), generate_series(0, 4) b(cj),
        |     generate_series(0, 4) c(i), generate_series(0, 4) e(j)""".stripMargin,

    "som_umatrix" ->
      """WITH cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS nid, embedding AS w
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 9)
        |), nb AS (
        |  SELECT a.nid AS n1, b.nid AS n2,
        |         sqrt(sum((CAST(a.w[u.i] AS DOUBLE) - CAST(b.w[u.i] AS DOUBLE))
        |                * (CAST(a.w[u.i] AS DOUBLE) - CAST(b.w[u.i] AS DOUBLE)))) AS dist
        |  FROM cb a JOIN cb b
        |    ON a.nid <> b.nid
        |   AND abs(a.nid // 3 - b.nid // 3) <= 1 AND abs(a.nid % 3 - b.nid % 3) <= 1,
        |       LATERAL (SELECT generate_subscripts(a.w, 1) AS i) u
        |  GROUP BY a.nid, b.nid
        |), um AS (SELECT n1, sum(dist) AS u FROM nb GROUP BY n1)
        |SELECT CAST(n1 // 3 AS BIGINT) AS i, CAST(n1 % 3 AS BIGINT) AS j,
        |       CAST(round(u / (SELECT max(u) FROM um), 6) AS DOUBLE) AS u
        |FROM um""".stripMargin,

    "som_hex_coords" ->
      """SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(CASE WHEN (5 - 1 - j) % 2 = 0 THEN i - 0.5 ELSE CAST(i AS DOUBLE) END AS DOUBLE) AS ex,
        |       CAST(j AS DOUBLE) AS ey
        |FROM generate_series(0, 4) a(i), generate_series(0, 4) b(j)""".stripMargin
  )
}
