package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two ingest behaviors a long-lived corpus hits that the
  * driver-gate corpus (single schema, well-formed files) cannot:
  * schema evolution across releases and corrupt-file tolerance.
  */
class IngestRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  test("schema evolution: a later release's new nullable column merges; old rows read NULL") {
    // release 1: (doc_id, text); release 2 adds a quality score — the
    // additive-nullable-column evolution every multi-release corpus
    // eventually performs. mergeSchema reconciles the footers; rows
    // from the old release surface the new column as NULL.
    val dir = tmp("evolve")
    Seq((1L, "old doc")).toDF("doc_id", "text")
      .write.parquet(s"$dir/r1")
    Seq((2L, "new doc", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/r2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/r1", s"$dir/r2")
    assert(merged.columns.toSet === Set("doc_id", "text", "quality"))
    val byId = merged.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId(1L) === None)      // old release: new column is NULL
    assert(byId(2L) === Some(0.9))
    // and WITHOUT mergeSchema the footer-sampled schema can silently
    // drop the new column — the reason ingest must opt in explicitly
    val unmergedCols = spark.read.parquet(s"$dir/r1", s"$dir/r2").columns.toSet
    assert(unmergedCols.subsetOf(Set("doc_id", "text", "quality")))
  }

  test("corrupt-file tolerance: ignoreCorruptFiles reads past a truncated shard") {
    // a truncated/garbage file inside a 100 TB ingest directory must be
    // skippable by POLICY (the per-LINE quarantine in Jsonl covers
    // malformed records; this covers an unreadable FILE)
    val dir = tmp("corrupt")
    (0L until 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(1).write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    // default: the corrupt file fails the read
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    // policy opt-in: skip it, keep the readable rows
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.parquet(dir).count() === 10)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }
}
