package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the ITERATIVE cluster-resolution path on mid-size
  * graphs (the regime between the union-find threshold and full cluster
  * scale): a 200k-edge chain graph, forced past the fast path with
  * localEdgeThreshold=0. Used to tune the edges-per-partition sizing of
  * the per-round shuffles (enable round logs with GRAFT_DEBUG_RESOLVE=1).
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val chains = spark.range(200000)
      .where(pmod(col("id"), lit(1000)) =!= lit(999))
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    chains.count()
    for (rep <- 1 to 3) {
      val t = time {
        val r = operators.Dedup.resolveDuplicateClusters(chains, localEdgeThreshold = 0L)
        r.count()
        org.apache.spark.sql.GraftBridge.freeCheckpoint(r)
      }
      println(f"[iter rep $rep] resolve 200k-edge chains: $t%.2f s")
    }
    spark.stop()
  }
}
