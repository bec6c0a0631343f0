package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the segmented-BM25 SERVE leg (round 11): the old
  * spelling (df via `count(*) over (partition by token)` on the unioned
  * pruned postings — re-shuffles every scanned posting row and pins a
  * hot token's postings on one task) against the shipped spelling
  * (map-side-combined per-token aggregate + broadcast join-back, no
  * posting exchange). Same index, same queries, same JVM — the ratio
  * stays valid under machine noise (the repo's bucketed-vs-plain
  * methodology). Row-for-row output equality is asserted every run.
  *
  * `runMain graft.Bm25ServeProbe [nDocs]` (default 200k, the bench
  * scale).
  */
object Bm25ServeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def time3(f: => Unit): Double =
      Seq(time(f), time(f), time(f)).min

    val name = s"graft_b25probe_${ProcessHandle.current.pid}"
    val path = s"/tmp/$name"
    BenchData.deleteRecursively(path)
    val docs = BenchData.dupGroupDocs(spark, nDocs)
    spark.sparkContext.setJobDescription("probe: segment appends")
    graft.operators.Retrieval.appendBm25Segment(
      docs.where(col("doc_id") % 3 =!= 2), "text", "doc_id",
      name, path, nBuckets = 32, segment = "base")
    graft.operators.Retrieval.appendBm25Segment(
      docs.where(col("doc_id") % 3 === 2), "text", "doc_id",
      name, path, nBuckets = 32, segment = "delta")
    graft.operators.Retrieval.deleteFromBm25Index(
      docs.where(col("doc_id") % 7 === 3).select(col("doc_id")),
      "doc_id", path)
    val q16 = (0L until 16L).map(i =>
      i -> (s"w${i * 13 % 10000} w${(i * 131 + 7) % 10000} w${(i * 997 + 3) % 10000}"))

    // ---- OLD serve spelling (pre-r11): window df over unioned postings
    def serveWindow(): DataFrame = {
      val qTerms = q16.flatMap { case (qid, q) =>
        q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t))
      }
      val qdf = broadcast(qTerms.toDF("qid", "token"))
      val terms = qTerms.map(_._2).distinct
      val segs = Seq("base", "delta")
      val tomb = broadcast(
        spark.read.parquet(s"$path/_tombstones").select("doc_id").distinct())
      val scanned = segs.map { s =>
        graft.sources.Bucketed.table(spark, s"${name}__$s")
          .where(col("token").isin(terms: _*))
      }.reduce(_ union _)
      val posts = scanned.join(tomb, Seq("doc_id"), "left_anti")
      val statsAll = segs.map(s => spark.read.parquet(s"$path/seg_${s}_stats"))
        .reduce(_ union _)
        .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      val dead = segs.map(s => spark.read.parquet(s"$path/seg_${s}_docs"))
        .reduce(_ union _)
        .join(tomb, Seq("doc_id"))
        .agg(count(lit(1)).as("dead_n"), coalesce(sum("dl"), lit(0L)).as("dead_dl"))
      val stats = statsAll.crossJoin(dead)
        .select((col("n_docs") - col("dead_n")).as("n_docs"),
          (col("sum_dl") - col("dead_dl")).as("sum_dl"))
      val k1 = 1.2; val b = 0.75
      val tfD = col("tf").cast("double")
      val dlNorm = col("dl").cast("double") /
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
      val idf = round(log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))), 6)
      val norm = tfD * lit(k1 + 1.0) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
      val contrib = posts
        .withColumn("df", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("token")))
        .crossJoin(broadcast(stats))
        .join(qdf, Seq("token"))
        .select(col("qid"), col("doc_id"),
          round(idf * norm, 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("c"))
      contrib.groupBy("qid", "doc_id")
        .agg(sum(col("c")).as("sdec"))
        .select(col("qid"), col("doc_id"), col("sdec").cast("double").as("score"))
        .groupBy("qid")
        .agg(graft.plans.TopNFunctions.topn_smallest_by_double(
          negate(col("score")), col("doc_id"), 10).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("r", "p")))
        .select(col("qid"), (col("r") + 1).cast("long").as("rank"),
          col("p.id").as("doc_id"), negate(col("p.s")).as("score"))
    }

    def serveAgg(): DataFrame =
      graft.operators.Retrieval.bm25TopKSegmented(spark, name, path, q16, 10)

    // variant: posts materialized ONCE via eager localCheckpoint (no
    // second scan/anti-join eval for the df side; checkpoint keeps the
    // scan partitioning — no exchange, no hot-token pin), result
    // checkpointed so the posts checkpoint can be freed before return
    def serveCkpt(): DataFrame = {
      val qTerms = q16.flatMap { case (qid, q) =>
        q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t))
      }
      val qdf = broadcast(qTerms.toDF("qid", "token"))
      val terms = qTerms.map(_._2).distinct
      val segs = Seq("base", "delta")
      val tombRaw = spark.read.parquet(s"$path/_tombstones").select("doc_id")
      val tomb = broadcast(tombRaw.distinct())
      val scanned = segs.map { s =>
        graft.sources.Bucketed.table(spark, s"${name}__$s")
          .where(col("token").isin(terms: _*))
      }.reduce(_ union _)
      val posts = scanned.join(tomb, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val statsAll = segs.map(s => spark.read.parquet(s"$path/seg_${s}_stats"))
        .reduce(_ union _)
        .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      val dead = segs.map(s => spark.read.parquet(s"$path/seg_${s}_docs"))
        .reduce(_ union _)
        .join(tomb, Seq("doc_id"))
        .agg(count(lit(1)).as("dead_n"), coalesce(sum("dl"), lit(0L)).as("dead_dl"))
      val stats = statsAll.crossJoin(dead)
        .select((col("n_docs") - col("dead_n")).as("n_docs"),
          (col("sum_dl") - col("dead_dl")).as("sum_dl"))
      val k1 = 1.2; val b = 0.75
      val tfD = col("tf").cast("double")
      val dlNorm = col("dl").cast("double") /
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
      val idf = round(log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))), 6)
      val norm = tfD * lit(k1 + 1.0) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
      val dfs = posts.groupBy("token").agg(count(lit(1)).as("df"))
      val contrib = posts
        .join(broadcast(dfs), Seq("token"))
        .crossJoin(broadcast(stats))
        .join(qdf, Seq("token"))
        .select(col("qid"), col("doc_id"),
          round(idf * norm, 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("c"))
      val out = contrib.groupBy("qid", "doc_id")
        .agg(sum(col("c")).as("sdec"))
        .select(col("qid"), col("doc_id"), col("sdec").cast("double").as("score"))
        .groupBy("qid")
        .agg(graft.plans.TopNFunctions.topn_smallest_by_double(
          negate(col("score")), col("doc_id"), 10).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("r", "p")))
        .select(col("qid"), (col("r") + 1).cast("long").as("rank"),
          col("p.id").as("doc_id"), negate(col("p.s")).as("score"))
        .localCheckpoint(true)
      org.apache.spark.sql.GraftBridge.freeCheckpoint(posts)
      out
    }

    // equality gate: identical rows from all spellings
    val a = serveWindow().orderBy("qid", "rank").collect().toSeq
    val bRows = serveAgg().orderBy("qid", "rank").collect().toSeq
    val cRows = serveCkpt().orderBy("qid", "rank").collect().toSeq
    require(a == bRows, s"serve spellings diverge: ${a.size} vs ${bRows.size}")
    require(a == cRows, s"ckpt spelling diverges: ${a.size} vs ${cRows.size}")

    serveWindow().count(); serveAgg().count(); serveCkpt().count() // warm all
    spark.sparkContext.setJobDescription("probe: serve window-df")
    val tw = time3 { serveWindow().count(); () }
    spark.sparkContext.setJobDescription("probe: serve agg-df")
    val ta = time3 { serveAgg().count(); () }
    spark.sparkContext.setJobDescription("probe: serve ckpt-agg-df")
    val tc = time3 { serveCkpt().count(); () }
    println(f"[b25probe] nDocs=$nDocs serve window-df=$tw%.3f s " +
      f"agg-df=$ta%.3f s ckpt-agg-df=$tc%.3f s win/agg=${tw / ta}%.2f win/ckpt=${tw / tc}%.2f")
    BenchData.deleteRecursively(path)
    graft.sources.Bucketed.drop(spark, s"${name}__base")
    graft.sources.Bucketed.drop(spark, s"${name}__delta")
    spark.stop()
  }
}
