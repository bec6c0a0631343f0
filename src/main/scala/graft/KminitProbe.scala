package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the k-means|| scalable-init round structure
  * (round 11): the pre-r11 loop (per round: a φ aggregate scan, a
  * range-partitioning `orderBy(__id)` sampling pass + sorted collect for
  * the picked candidates, and a `count()` to materialize the merged
  * state) against the shipped loop (φ rides the merge materialization
  * and carries between rounds; unsorted collect + driver-side sort).
  * Same data, same JVM; centroid-for-centroid equality is asserted
  * every run, and per-variant Spark JOB COUNTS are printed — the
  * noise-free evidence for the passes-per-round claim.
  *
  * `runMain graft.KminitProbe [nRows] [k]` (default 200000 64-dim rows,
  * k=256 — the bench entry's regime).
  */
object KminitProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 200000L
    val k = if (args.length > 1) args(1).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def time3(f: => Unit): Double = Seq(time(f), time(f), time(f)).min

    val big = spark.range(nRows).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i * 0.7 + i * 1.3).cast("float")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()

    import graft.plans.KmeansFunctions
    import graft.operators.{Kmeans, Materialize}

    /** The pre-r11 loop, inlined verbatim (modulo the shared-helper
      * seeded selection, spelled out here).
      */
    def oldInit(df: DataFrame, kk: Int, salt: String = "km",
                rounds: Int = 5): Array[Array[Double]] = {
      val ell = 2 * kk
      val data = df.where(col("embedding").isNotNull)
        .select(col("id").cast("long").as("__id"),
          col("embedding").cast("array<double>").as("__v"))
      val seedRows = data
        .withColumn("__h", md5(concat_ws(":", lit(salt), col("__id"))))
        .orderBy(col("__h"), col("__id")).limit(1).collect()
      val firstId = seedRows(0).getLong(0)
      val first = Array(seedRows(0).getSeq[Double](1).toArray)
      val dim = first(0).length
      val cand = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
      val seen = scala.collection.mutable.HashSet[Long]()
      cand += ((firstId, first(0))); seen += firstId
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      def merged(prev: DataFrame, newFlat: Array[Double], baseIdx: Int): DataFrame =
        Materialize.once(prev, "__na",
            KmeansFunctions.kmeans_assign(col("__v"), newFlat, dim))
          .select(col("__id"), col("__v"),
            when(col("__na.d2") < col("__md2"), col("__na.d2"))
              .otherwise(col("__md2")).as("__md2"),
            when(col("__na.d2") < col("__md2"), col("__na.cid") + lit(baseIdx))
              .otherwise(col("__cid")).as("__cid"))
      var state = Materialize.once(data, "__na",
          KmeansFunctions.kmeans_assign(col("__v"),
            Kmeans.Model(Array(first(0))).flat, dim))
        .select(col("__id"), col("__v"), col("__na.d2").as("__md2"),
          lit(0).as("__cid"))
        .persist(mem)
      state.count()
      val md29 = round(col("__md2"), 9)
      var r = 0
      while (r < rounds) {
        val phiRow = state.select(
          sum(md29.cast(org.apache.spark.sql.types.DecimalType(38, 9))).as("phi"))
          .collect()(0)
        val phi =
          if (phiRow.isNullAt(0)) 0.0 else phiRow.getDecimal(0).doubleValue()
        if (phi > 0.0) {
          val u = (conv(substring(md5(concat_ws(":", lit(s"$salt|sc$r"),
              col("__id"))), 1, 13), 16, 10)
            .cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
          val picked = state
            .where(u < lit(ell.toDouble) * md29 / lit(phi))
            .orderBy(col("__id"))
            .select(col("__id"), col("__v"))
            .collect()
          val baseIdx = cand.length
          picked.foreach { row =>
            val id = row.getLong(0)
            if (!seen.contains(id)) {
              seen += id
              cand += ((id, row.getSeq[Double](1).toArray))
            }
          }
          if (cand.length > baseIdx) {
            val newFlat =
              Kmeans.Model(cand.slice(baseIdx, cand.length).map(_._2).toArray).flat
            val next = merged(state, newFlat, baseIdx).persist(mem)
            next.count()
            state.unpersist(blocking = false)
            state = next
          }
        }
        r += 1
      }
      val wRows = state.groupBy("__cid").agg(count(lit(1)).as("n"))
        .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
      state.unpersist(blocking = false)
      val weighted = cand.zipWithIndex.map { case ((id, v), j) =>
        (id, v, wRows.getOrElse(j, 0L))
      }
      val nC = weighted.length
      val ids = weighted.map(_._1).toArray
      val vecs = weighted.map(_._2).toArray
      val ws = weighted.map(_._3.toDouble).toArray
      val minD2 = Array.fill(nC)(Double.MaxValue)
      val chosen = new Array[Boolean](nC)
      var seedIdx = 0
      var j = 1
      while (j < nC) {
        if (ws(j) > ws(seedIdx) ||
            (ws(j) == ws(seedIdx) && ids(j) < ids(seedIdx))) seedIdx = j
        j += 1
      }
      val pickedIdx = scala.collection.mutable.ArrayBuffer[Int]()
      def updateMin(cIdx: Int): Unit = {
        val c = vecs(cIdx)
        var i = 0
        while (i < nC) {
          if (!chosen(i)) {
            val v = vecs(i)
            var s = 0.0; var d = 0
            while (d < dim) { val t = v(d) - c(d); s += t * t; d += 1 }
            if (s < minD2(i)) minD2(i) = s
          }
          i += 1
        }
      }
      chosen(seedIdx) = true; pickedIdx += seedIdx; updateMin(seedIdx)
      while (pickedIdx.length < kk && pickedIdx.length < nC) {
        var bi = -1; var bs = -1.0
        var i = 0
        while (i < nC) {
          if (!chosen(i)) {
            val s = ws(i) * minD2(i)
            if (s > bs || (s == bs && (bi < 0 || ids(i) < ids(bi)))) {
              bs = s; bi = i
            }
          }
          i += 1
        }
        chosen(bi) = true; pickedIdx += bi; updateMin(bi)
      }
      val out = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
      pickedIdx.foreach(i => out += ((ids(i), vecs(i))))
      require(out.length == kk, s"probe oldInit found ${out.length} < $kk")
      out.map(_._2).toArray
    }

    def newInit(): Array[Array[Double]] =
      Kmeans.initScalableCentroids(big, "embedding", "id", k)

    // KMINIT_FAST=1: probe-regime mode — the 200k/1M runs already pin
    // centroid equality, so at the ~200 s/rep regime skip the equality
    // pass and time ONE interleaved A/B/A/B round instead of min-of-3
    // (interleaving shares any machine drift across both arms)
    val fast = sys.env.contains("KMINIT_FAST")
    if (!fast) {
      // equality gate: identical centroid matrices
      val a = oldInit(big, k)
      val b = newInit()
      require(a.length == b.length &&
        a.zip(b).forall { case (x, y) => x.sameElements(y) },
        "old/new scalable-init centroid matrices diverge")
    }
    jobs.set(0); oldInit(big, k); val oldJobs = jobs.get()
    jobs.set(0); newInit(); val newJobs = jobs.get()
    val (tOld, tNew) =
      if (fast) {
        val o1 = time { oldInit(big, k); () }
        val n1 = time { newInit(); () }
        val o2 = time { oldInit(big, k); () }
        val n2 = time { newInit(); () }
        (math.min(o1, o2), math.min(n1, n2))
      } else
        (time3 { oldInit(big, k); () }, time3 { newInit(); () })
    println(f"[kminitprobe] n=$nRows k=$k old=$tOld%.3f s ($oldJobs jobs) " +
      f"new=$tNew%.3f s ($newJobs jobs) speedup=${tOld / tNew}%.2f")
    big.unpersist(blocking = false)
    spark.stop()
  }
}
