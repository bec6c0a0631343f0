package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc resolver diagnostic on a binary-tree graph (the bushy
  * extreme): `runMain graft.DebugResolve [nNodes] [repeats]` with
  * GRAFT_DEBUG_RESOLVE=1 for per-round timings and label-space
  * estimates. Repeats expose same-JVM warmup/GC variance — round-7
  * measurements on this workload swung 3x between legs of one JVM,
  * which is why the mid-loop-exit and broadcast-hop experiments were
  * judged on same-JVM A/B pairs and reverted.
  */
object DebugResolve {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val repeats = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tree = BenchData.treeGraph(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tree.count()
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    for (rep <- 1 to repeats) {
      val t = time {
        val r = operators.Dedup.resolveDuplicateClusters(tree, localEdgeThreshold = -1)
        println("  labeled: " + r.count())
        org.apache.spark.sql.GraftBridge.freeCheckpoint(r)
      }
      println(f"[dbg] tree $n iterative loop (run $rep/$repeats): $t%.1f s")
    }
    spark.stop()
  }
}
