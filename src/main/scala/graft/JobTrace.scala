package graft

import org.apache.spark.sql.SparkSession

/** Per-job trace for one named query: prints every Spark job the warm
  * run submits (callsite + first-stage name + task count) so
  * scheduler-overhead-bound queries can be attributed job by job —
  * JobProf gives the COUNT, this gives the WHO. Usage:
  * `runMain graft.JobTrace <query> [sfDir]`.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobTrace <query> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = Queries.all(name)
    fn(spark, dir).count() // warmup
    Thread.sleep(300)
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val on = new java.util.concurrent.atomic.AtomicBoolean(true)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (on.get) {
          val s = js.stageInfos.sortBy(_.stageId)
          val site = s.headOption.map(_.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("JobTrace"))
            .getOrElse(s.head.details.linesIterator.take(1).mkString))
            .getOrElse("?")
          log.add(f"job ${js.jobId}%3d stages=${s.length} " +
            f"tasks=${s.map(_.numTasks).sum}%4d " +
            s"[${s.map(_.name.takeWhile(_ != ' ')).mkString(",")}] $site")
        }
    })
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(400)
    on.set(false)
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq.foreach(println)
    println(f"[jobtrace] $name warm ${sec}%.3f s, ${log.size} jobs")
    spark.stop()
  }
}
