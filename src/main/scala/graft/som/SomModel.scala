package graft.som

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trained SOM: inference and analytics queries over a broadcast codebook.
  *
  * Every distributed query is a narrow `mapPartitions` over the input
  * (no shuffle) followed, where the reference semantics are relational
  * (group-bys, `xpysom.py:819-865`), by stock Catalyst aggregates — so
  * Spark's optimizer, AQE and whole-stage codegen handle the relational
  * layer while the numeric kernels stay in batched BLAS calls.
  */
final class SomModel(val config: SomConfig, val codebook: Codebook)
    extends Serializable {
  config.validated // name/size validation also on the fromWeights path

  def topo: Topology = config.topo
  def x: Int = config.x
  def y: Int = config.y
  def dim: Int = codebook.dim

  // ---------------------------------------------------------------- core

  /** Batched per-partition map: for each feature vector compute a small
    * result array via `f(distRow)` where distRow is that sample's
    * distance vector to all neurons. Appends the produced columns.
    */
  private def mapWithDistances(df: DataFrame, featuresCol: String,
                               dist: Distance, newFields: Seq[StructField])(
      emit: (Array[Double], Int, Int, Array[Double]) => Seq[Any]): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ newFields)
    val fIdx = df.schema.fieldIndex(featuresCol)
    val bc = spark.sparkContext.broadcast(codebook.weights)
    val cfg = config
    val k = x * y
    val d = dim
    val distFn = dist
    val rdd = df.rdd.mapPartitions { it =>
      val w = bc.value
      val bs = cfg.batchSize
      val xBuf = new Array[Double](bs * d)
      val dBuf = new Array[Double](bs * k)
      val rows = new Array[Row](bs)
      val wSq = if (distFn.canCache) Distances.rowSumSq(w, k, d) else null
      new Iterator[Row] {
        private var n = 0
        private var pos = 0
        private def fill(): Unit = {
          n = 0
          while (n < bs && it.hasNext) {
            val r = it.next()
            rows(n) = r
            val v = SomData.rowToVec(r, fIdx)
            if (v.length != d)
              throw new IllegalArgumentException(
                s"Received ${v.length} features, expected $d.")
            System.arraycopy(v, 0, xBuf, n * d, d)
            n += 1
          }
          if (n > 0) distFn.compute(xBuf, n, w, k, d, wSq, dBuf)
          pos = 0
        }
        def hasNext: Boolean = pos < n || { if (it.hasNext) { fill(); pos < n } else false }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException("next on empty iterator")
          val row = rows(pos)
          val extra = emit(dBuf, pos * k, k, w)
          pos += 1
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  // ------------------------------------------------------------- queries

  /** BMU assignment (`winner`/`predict`, `xpysom.py:370-417,608-617`):
    * appends bmu_id (= i*y + j, the raveled index), bmu_i, bmu_j.
    * Uses the configured activation distance; argmin ties resolve to the
    * first flat index, like numpy.
    */
  def transform(df: DataFrame, featuresCol: String = "features"): DataFrame = {
    val yLocal = y // avoid capturing `this` (and the codebook) in the closure
    mapWithDistances(df, featuresCol, config.distanceFn, Seq(
      StructField("bmu_id", IntegerType, nullable = false),
      StructField("bmu_i", IntegerType, nullable = false),
      StructField("bmu_j", IntegerType, nullable = false))) { (dBuf, off, k, _) =>
      val best = Distances.argminRow(dBuf, off, k)
      Seq(best, best / yLocal, best % yLocal)
    }
  }

  /** Expression-based BMU transform: appends bmu_id/bmu_i/bmu_j as a pure
    * column operation via the native `som_bmu` Catalyst expression
    * (`graft.plans.SomBmu`) — stays inside whole-stage codegen and,
    * unlike the mapPartitions path, composes with Structured Streaming.
    * Identical semantics to `transform`.
    */
  def withBmu(df: DataFrame, featuresCol: String = "features"): DataFrame = {
    val bmu = graft.plans.SomBmuFunctions.som_bmu(
      col(featuresCol), codebook.weights, dim, config.distance, config.normP)
    df.withColumn("bmu_id", bmu)
      .withColumn("bmu_i", floor(col("bmu_id") / y).cast("int"))
      .withColumn("bmu_j", pmod(col("bmu_id"), lit(y)).cast("int"))
  }

  /** Activation map (`activate`, `xpysom.py:323-354`): appends the full
    * per-neuron distance vector.
    */
  def activate(df: DataFrame, featuresCol: String = "features"): DataFrame =
    mapWithDistances(df, featuresCol, config.distanceFn, Seq(
      StructField("activation", ArrayType(DoubleType, containsNull = false)))) {
      (dBuf, off, k, _) =>
        val arr = java.util.Arrays.copyOfRange(dBuf, off, off + k)
        Seq(arr.toSeq)
    }

  /** Quantization (`xpysom.py:620-645`): appends the BMU's codebook
    * vector. BMU here always uses true euclidean distance
    * (`_distance_from_weights`, `xpysom.py:660-671`) regardless of the
    * configured activation distance — reference behavior.
    */
  def quantize(df: DataFrame, featuresCol: String = "features"): DataFrame = {
    val dimLocal = dim
    mapWithDistances(df, featuresCol, Distances.EuclideanTrue, Seq(
      StructField("quantized", ArrayType(DoubleType, containsNull = false)),
      StructField("q_dist", DoubleType, nullable = false))) { (dBuf, off, k, w) =>
      val best = Distances.argminRow(dBuf, off, k)
      val base = best * dimLocal
      val q = java.util.Arrays.copyOfRange(w, base, base + dimLocal)
      Seq(q.toSeq, dBuf(off + best))
    }
  }

  /** Quantization error (`xpysom.py:673-707`): mean distance between each
    * sample and its BMU codebook vector (euclidean, as in the reference).
    * Distributed narrow map + scalar aggregate.
    */
  def quantizationError(df: DataFrame, featuresCol: String = "features"): Double = {
    val r = df.select(avg(graft.plans.SomBmuFunctions.som_qdist(
        col(featuresCol), codebook.weights, dim)).as("qe"))
      .head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** Topographic error (`xpysom.py:709-746`): share of samples whose two
    * best-matching units are not grid-adjacent. Per-row top-2 selection
    * (partial, not a full sort) then a scalar aggregate. 1x1 maps are
    * undefined (NaN), as in the reference (`xpysom.py:721-724`).
    */
  def topographicError(df: DataFrame, featuresCol: String = "features"): Double = {
    if (x * y == 1) {
      System.err.println("The topographic error is not defined for a 1-by-1 map.")
      return Double.NaN
    }
    val t = topo
    val yy = y
    val errs = mapWithDistances(df, featuresCol, Distances.EuclideanTrue, Seq(
      StructField("te_err", IntegerType, nullable = false))) { (dBuf, off, k, _) =>
      val (b1, b2) = Distances.top2Row(dBuf, off, k)
      val adj = t.adjacent(b1 / yy, b1 % yy, b2 / yy, b2 % yy)
      Seq(if (adj) 0 else 1)
    }
    val r = errs.agg(avg("te_err")).head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** Wins per neuron (`activation_response`, `xpysom.py:819-829`) as a
    * DataFrame (bmu_id, bmu_i, bmu_j, n_wins) — a hash aggregate over the
    * expression-based BMU (whole scan + partial agg stay in one codegen
    * stage; no Row round-trip).
    */
  def activationResponse(df: DataFrame, featuresCol: String = "features"): DataFrame =
    withBmu(df, featuresCol)
      .groupBy("bmu_id", "bmu_i", "bmu_j")
      .agg(count(lit(1)).as("n_wins"))

  /** Samples grouped by winning neuron (`win_map`, `xpysom.py:831-840`)
    * as (bmu_id, bmu_i, bmu_j, samples array).
    *
    * Scale note: the collected array concentrates a hot neuron's entire
    * sample set in one reducer group — faithful to the reference but the
    * wrong shape past memory scale. `maxPerNeuron` caps the group
    * payload BEFORE collection, ordered by (hash, features) — the
    * feature column itself breaks 32-bit hash collisions, so the
    * selection is a total order up to exact duplicates (which are
    * interchangeable) and reproducible across runs. For unbounded
    * relational access use the (bmu_id, vec_id) form that `transform`
    * already emits — the oracled `som_win_map` query shape.
    */
  def winMap(df: DataFrame, featuresCol: String = "features",
             maxPerNeuron: Int = Int.MaxValue): DataFrame = {
    val tagged = withBmu(df, featuresCol)
    val bounded =
      if (maxPerNeuron == Int.MaxValue) tagged
      else {
        require(maxPerNeuron > 0, s"maxPerNeuron must be positive, got $maxPerNeuron")
        // partition by all three group keys (bmu_i/bmu_j are functions of
        // bmu_id) so the aggregation below reuses this exchange instead
        // of shuffling the wide feature vectors a second time
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bmu_id", "bmu_i", "bmu_j")
          .orderBy(hash(col(featuresCol)), col(featuresCol))
        tagged.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= maxPerNeuron).drop("__rn")
      }
    bounded
      .groupBy("bmu_id", "bmu_i", "bmu_j")
      .agg(collect_list(col(featuresCol)).as("samples"))
  }

  /** Label histogram per neuron (`labels_map`, `xpysom.py:842-865`) as
    * (bmu_id, bmu_i, bmu_j, label, n) — a two-level hash aggregate.
    */
  def labelsMap(df: DataFrame, labelCol: String,
                featuresCol: String = "features"): DataFrame =
    withBmu(df, featuresCol)
      .groupBy(col("bmu_id"), col("bmu_i"), col("bmu_j"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))

  /** U-matrix (`distance_map`, `xpysom.py:788-817`) — driver-local, the
    * codebook is x*y*dim doubles.
    */
  def distanceMap(): Array[Array[Double]] = codebook.distanceMap(topo)

  /** Euclidean-plane neuron coordinates (`get_euclidean_coordinates` /
    * `convert_map_to_euclidean`, `xpysom.py:291-320`).
    */
  def euclideanCoordinates: Seq[(Int, Int, Double, Double)] =
    for (i <- 0 until x; j <- 0 until y)
      yield (i, j, topo.euclidX(i, j), topo.euclidY(i, j))

  // --------------------------------------------------------------- save

  /** Persist params as JSON + codebook as parquet (the MLWritable-style
    * analogue of the reference's pickle round-trip, `xpysom.py:868-892`).
    */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val c = config
    val json =
      s"""{"x":${c.x},"y":${c.y},"sigma":${c.sigma},"sigmaN":${c.sigmaN},
         |"learningRate":${c.learningRate},"learningRateN":${c.learningRateN},
         |"decay":"${c.decay}","neighborhood":"${c.neighborhood}",
         |"stdCoeff":${c.stdCoeff},"topology":"${c.topology}",
         |"distance":"${c.distance}","normP":${c.normP},
         |"compactSupport":${c.compactSupport},"seed":${c.seed},
         |"batchSize":${c.batchSize},"treeDepth":${c.treeDepth},"dim":${codebook.dim}}"""
        .stripMargin.replace("\n", "")
    val neurons = (0 until x * y).map(n => (n, codebook.weights.slice(n * dim, (n + 1) * dim).toSeq))
    neurons.toDF("nid", "w").coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    spark.createDataset(Seq(json)).coalesce(1).write.mode("overwrite").text(s"$path/params")
  }
}

object SomModel {
  def load(spark: SparkSession, path: String): SomModel = {
    val json = spark.read.textFile(s"$path/params").head()
    def str(k: String): String = {
      val m = ("\"" + k + "\":\"([^\"]*)\"").r.findFirstMatchIn(json)
      m.map(_.group(1)).getOrElse(sys.error(s"missing $k"))
    }
    def num(k: String): Double = {
      val m = ("\"" + k + "\":(-?[0-9.eE+-]+)").r.findFirstMatchIn(json)
      m.map(_.group(1).toDouble).getOrElse(sys.error(s"missing $k"))
    }
    val cfg = SomConfig(
      x = num("x").toInt, y = num("y").toInt, sigma = num("sigma"),
      sigmaN = num("sigmaN"), learningRate = num("learningRate"),
      learningRateN = num("learningRateN"), decay = str("decay"),
      neighborhood = str("neighborhood"), stdCoeff = num("stdCoeff"),
      topology = str("topology"), distance = str("distance"),
      normP = num("normP"),
      compactSupport = json.contains("\"compactSupport\":true"),
      seed = num("seed").toLong, batchSize = num("batchSize").toInt,
      treeDepth = num("treeDepth").toInt)
    val dim = num("dim").toInt
    val rows = spark.read.parquet(s"$path/codebook")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
      .map(_._2)
    new SomModel(cfg, Codebook.fromRows(cfg.x, cfg.y, rows.toSeq))
  }

  /** Train-free model over an explicit codebook (for fixed-codebook
    * inference and tests).
    */
  def fromWeights(cfg: SomConfig, rows: Seq[Array[Double]]): SomModel =
    new SomModel(cfg, Codebook.fromRows(cfg.x, cfg.y, rows))
}
