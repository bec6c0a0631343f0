package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B probe: constant-reduce-side iteration loops (k-means
  * Lloyd's, logit GD, k-means|| rounds) under the session default
  * (AQE on, 32 shuffle partitions) vs a loop-scoped child session with
  * AQE off + reduce partitions sized to the key space (≤ k). The
  * reduce side of these loops is k×(dim+1) longs (or dim+2 for logit)
  * PER PARTITION regardless of corpus size, so AQE's per-stage
  * materialization barrier buys nothing at any scale — this probe
  * prices what it costs per iteration locally. Interleaved A/B/A/B;
  * ratios stay valid under machine drift.
  */
object AqeLoopProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val big = spark.range(200000).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i * 0.7 + i * 1.3).cast("float").cast("double"))
        .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()
    val bigDocs = BenchData.dupGroupDocs(spark, 200000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bigDocs.count()

    def timed(name: String)(f: => Any): Unit = {
      f // warm
      Thread.sleep(200); jobs.set(0)
      val t0 = System.nanoTime(); f
      val s1 = (System.nanoTime() - t0) / 1e9; val j1 = jobs.get()
      Thread.sleep(200); jobs.set(0)
      val t1 = System.nanoTime(); f
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"[aqeprobe] $name%-34s min ${math.min(s1, s2)}%.3f s  jobs $j1")
    }

    var mA: operators.Kmeans.Model = null
    var mB: operators.Kmeans.Model = null
    // interleaved arms in ONE JVM: old = loop-session rebase disabled
    // via the probe hook, new = enabled. A/B/A/B so machine drift hits
    // both arms equally.
    for (rep <- 1 to 2; arm <- Seq("old", "new")) {
      if (arm == "old") sys.props("graft.loopsession.off") = "1"
      else sys.props.remove("graft.loopsession.off")
      timed(s"kmeans fit k=64 iters=3 ($arm $rep)") {
        mA = operators.Kmeans.fit(big, "embedding", "id", k = 64, iters = 3)
      }
      timed(s"kminit k=256 ($arm $rep)") {
        mB = operators.Kmeans.Model(operators.Kmeans.initScalableCentroids(
          big, "embedding", "id", k = 256))
      }
      timed(s"logit train10 ($arm $rep)") {
        val feats = operators.LogitTrain.features(bigDocs, "text",
          "doc_id", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
        operators.LogitTrain.train(feats, iters = 10, lr = 1.0)
      }
      println(s"[aqeprobe] $arm$rep stamp centroid0 ${mA.flat.take(2).mkString(",")} " +
        s"init0 ${mB.flat.take(2).mkString(",")}")
    }
    // equality stamp so A/B reps prove they computed the same thing
    println(s"[aqeprobe] centroid0 ${mA.flat.take(4).mkString(",")} " +
      s"init0 ${mB.flat.take(4).mkString(",")}")
    spark.stop()
  }
}
