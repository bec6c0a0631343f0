package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the whole point of bucketed tables: a join of two tables
  * bucketed on the join key plans with NO shuffle Exchange on either
  * side (the write amortized it), and the within-bucket sortBy removes
  * the Sort as well. Correctness of the joined values is driver-gated
  * via `dedup_bucketed_join`; this spec owns the plan shape.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_bkt_$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes its stages
    df.queryExecution.executedPlan.toString
  }

  test("bucketed-bucketed equi-join plans without Exchange or extra Sort") {
    val left = (0L until 400L).map(i => (i, s"fp_${i % 97}")).toDF("id", "fp")
    val right = (0L until 300L).map(i => (i + 1000L, s"fp_${i % 89}")).toDF("rid", "fp")
    Bucketed.writeBucketed(left, "graft_spec_bkt_l", tmpDir("l"), "fp", 4)
    Bucketed.writeBucketed(right, "graft_spec_bkt_r", tmpDir("r"), "fp", 4)
    try {
      val l = Bucketed.table(spark, "graft_spec_bkt_l")
      val r = Bucketed.table(spark, "graft_spec_bkt_r")
      // hint an INPUT side (a hint on the join output is a no-op):
      // broadcast would hide the bucket benefit
      val joined = l.join(r.hint("merge"), "fp")
      // value correctness vs the plain (unbucketed) spelling
      val expected = left.join(right, "fp").count()
      assert(joined.count() === expected)
      val plan = finalPlan(joined)
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the scan really is bucket-pruning-aware, not a plain file scan
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan:\n$plan")
      // NOTE a Sort node remains by design: since Spark 3.0 a bucketed
      // scan does not report its sortBy ordering (SPARK-28595 — with
      // multiple files per bucket the claim would be wrong), so the SMJ
      // re-sorts. The data arrives already sorted (sortBy persisted it),
      // making that Sort a linear verify pass; the expensive node — the
      // Exchange — is the one the bucketing removes.
    } finally {
      Bucketed.drop(spark, "graft_spec_bkt_l")
      Bucketed.drop(spark, "graft_spec_bkt_r")
    }
  }

  test("bucketed self-join for dup-pair discovery stays shuffle-free") {
    // the dedup confirm shape: corpus bucketed by fingerprint once,
    // then repeatedly self-joined (or probed by batches) on fp
    val docs = (0L until 500L).map(i => (i, s"fp_${i % 50}")).toDF("doc_id", "fp")
    Bucketed.writeBucketed(docs, "graft_spec_bkt_self", tmpDir("self"), "fp", 4)
    try {
      val t = Bucketed.table(spark, "graft_spec_bkt_self")
      val a = t.select(col("doc_id").as("id_a"), col("fp"))
      val b = t.select(col("doc_id").as("id_b"), col("fp"))
      val pairs = a.join(b.hint("merge"), Seq("fp")).where(col("id_a") < col("id_b"))
      // 50 groups of 10 docs -> 45 ordered pairs each
      assert(pairs.count() === 50L * 45L)
      val plan = finalPlan(pairs)
      assert(!plan.contains("Exchange"),
        s"bucketed self-join should not shuffle:\n$plan")
    } finally Bucketed.drop(spark, "graft_spec_bkt_self")
  }

  test("compactFirst bounds file count to one per bucket") {
    val df = (0L until 1000L).map(i => (i, s"k$i")).toDF("id", "k")
      .repartition(8) // many writer tasks
    val dir = tmpDir("compact")
    Bucketed.writeBucketed(df, "graft_spec_bkt_c", dir, "k", 4, compactFirst = true)
    try {
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString).count(_.endsWith(".parquet"))
      assert(files === 4, s"expected one file per bucket, got $files")
    } finally Bucketed.drop(spark, "graft_spec_bkt_c")
  }
}
