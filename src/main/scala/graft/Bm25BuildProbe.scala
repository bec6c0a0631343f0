package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the BM25 index build (the most expensive
  * non-intentional bench entry) — isolates tokenize/explode, the df
  * aggregation, the token join, and the bucketed write so plan work
  * targets the real cost. `runMain graft.Bm25BuildProbe [nDocs]`.
  */
object Bm25BuildProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bm25probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = BenchData.dupGroupDocs(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[bm25probe] docs: ${docs.count()}")

    val d = docs.where(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("dl"),
        graft.plans.GraftFunctions.token_tf(col("text")).as("__kvs"))
    val pairs = d
      .select(col("doc_id"), col("dl"), explode(col("__kvs")).as("kv"))
      .select(col("kv.token").as("token"), col("doc_id"), col("dl"),
        col("kv.tf").as("tf"))

    time("pairs scan+explode (count)") { pairs.count(); () }
    val dfs = pairs.groupBy("token").agg(count(lit(1)).as("df"))
    time("dfs aggregate (count)") { dfs.count(); () }
    val full = pairs.join(dfs, Seq("token"))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"), col("df"))
    time("pairs JOIN dfs (count)") { full.count(); () }

    val tag = s"probe_${ProcessHandle.current.pid}"
    time("writeBucketed compactFirst=true (full current path)") {
      graft.sources.Bucketed.writeBucketed(full, s"bm25p1_$tag",
        s"/tmp/bm25p1_$tag", "token", 32)
    }
    time("writeBucketed compactFirst=false") {
      graft.sources.Bucketed.writeBucketed(full, s"bm25p2_$tag",
        s"/tmp/bm25p2_$tag", "token", 32, compactFirst = false)
    }
    // window variant: df computed after ONE repartition by token
    val win = org.apache.spark.sql.expressions.Window.partitionBy("token")
    val full2 = pairs.repartition(32, col("token"))
      .withColumn("df", count(lit(1)).over(win))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"), col("df"))
    time("window-df + writeBucketed compactFirst=false") {
      graft.sources.Bucketed.writeBucketed(full2, s"bm25p3_$tag",
        s"/tmp/bm25p3_$tag", "token", 32, compactFirst = false)
    }
    Seq(s"bm25p1_$tag", s"bm25p2_$tag", s"bm25p3_$tag").foreach { nm =>
      graft.sources.Bucketed.drop(spark, nm)
      BenchData.deleteRecursively(s"/tmp/$nm")
    }
    spark.stop()
  }
}
