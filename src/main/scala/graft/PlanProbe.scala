package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc physical-plan probe: `runMain graft.PlanProbe <query> [...]`
  * prints each named query's EXECUTED plan filtered to the
  * load-bearing operators (exchanges, joins, scans, aggregates,
  * codegen spans) — the quick check that a new operator's plan has the
  * shuffle/broadcast shape its scaladoc claims, without hand-editing
  * Explain.scala's snapshot list.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name (executed plan) =====")
      println(Queries.all(name)(spark, dir).queryExecution.executedPlan
        .toString.split("\n")
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Scan") || l.contains("Aggregate") ||
          l.contains("WholeStageCodegen") || l.contains("TopNSmallest"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
