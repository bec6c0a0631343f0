package graft

import org.apache.spark.sql.SparkSession

/** Suite-wide job-count profiler: runs every SparkEntry query at the
  * given SF with a job listener and prints `(name, jobs, warm sec)`
  * sorted by job count. Job counts are DETERMINISTIC (no window noise),
  * so they rank scheduler-overhead-bound queries even on a machine
  * whose wall clock can't be trusted — the round-11 measurement rule.
  *
  * `runMain graft.JobProf <sfDir> [minJobs]`
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val minJobs = if (args.length > 1) args(1).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warmup (also fills any per-session memo)
        // listener events are async — onJobStart fires on submit (sync
        // enough for counting), but give the bus a beat to drain
        Thread.sleep(150)
        jobs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        out += ((name, jobs.get(), sec))
      } catch {
        case e: Throwable =>
          println(s"[jobprof] $name FAILED: ${e.getClass.getSimpleName}")
      }
    }
    println(f"${"query"}%-36s jobs  warm_sec")
    out.sortBy(-_._2).foreach { case (n, j, s) =>
      if (j >= minJobs) println(f"$n%-36s $j%4d  $s%.3f")
    }
    println(f"[jobprof] total queries=${out.length} " +
      f"total jobs=${out.map(_._2).sum} total warm sec=${out.map(_._3).sum}%.1f")
    spark.stop()
  }
}
