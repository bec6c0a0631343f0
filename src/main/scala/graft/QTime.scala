package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration:
  * `runMain graft.QTime <sfDir> <queryName> [queryName ...]` —
  * 1 warmup + min-of-2 timed reps per query (the Bench methodology),
  * optionally dumping the formatted plan with GRAFT_QTIME_EXPLAIN=1.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup
      val t = math.min(time { fn(spark, sfDir).count(); () },
                       time { fn(spark, sfDir).count(); () })
      println(f"[qtime] $name: $t%.3f s")
      if (sys.env.get("GRAFT_QTIME_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
