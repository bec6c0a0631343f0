package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the iterative duplicate-cluster resolution: runs the
  * two resolve-backed driver queries with per-phase wall times so a bench
  * regression can be attributed to candidate generation vs round count vs
  * per-round cost (enable round logs with GRAFT_DEBUG_RESOLVE=1).
  */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (rep <- 1 to 2) {
      val cands = operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, maxOffset = 5)
        .where(col("jaccard") >= 0.5)
        .persist()
      val tc = time { cands.count(); () }
      val tr = time { operators.Dedup.resolveDuplicateClusters(cands).count(); () }
      cands.unpersist(blocking = true)
      println(f"[probe rep $rep] ngram candidates $tc%.2f s, resolve $tr%.2f s")
    }
    spark.stop()
  }
}
