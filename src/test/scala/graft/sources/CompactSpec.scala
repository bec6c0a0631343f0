package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction shrinks a fragmented directory, preserves every row") {
    val in = java.nio.file.Files.createTempDirectory("graft_compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out").toString
    (0L until 5000L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
      .repartition(32) // the fragmented ingest shape
      .write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).length === 32)
    val totalBytes = parquetFiles(in).map(_.length).sum
    // target a quarter of the total (ceil, so 4 targets cover it all)
    // -> expect exactly 4 output files
    val (nIn, nOut) = Compact.compactParquet(spark, in, out,
      targetFileBytes = (totalBytes + 3) / 4)
    assert(nIn === 32)
    assert(nOut === 4)
    assert(parquetFiles(out).length === 4)
    // round-robin repartition spreads bytes evenly: no file is a skew
    // magnet (each within 2x of the mean)
    val sizes = parquetFiles(out).map(_.length)
    assert(sizes.max < 2 * (sizes.sum / sizes.length),
      s"uneven compaction: ${sizes.mkString(",")}")
    // content identical
    val a = spark.read.parquet(in).collect().map(_.toString).sorted
    val b = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(a === b)
  }

  test("compaction of a routed tree preserves the partition directories") {
    val in = java.nio.file.Files.createTempDirectory("graft_compact_tree_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_tree_out").toString
    val docs = (0L until 3000L)
      .map(i => (i, s"doc $i", Seq("en", "de", "fr")((i % 3).toInt)))
      .toDF("doc_id", "text", "lang")
    // fragment each partition: many writer tasks per lang directory
    docs.repartition(16).write.mode("overwrite").partitionBy("lang").parquet(in)
    val fragged = new java.io.File(in).listFiles().filter(_.isDirectory)
      .map(d => parquetFiles(d.toString).length).sum
    assert(fragged > 3, s"expected a fragmented tree, got $fragged files")
    val (nIn, nOut) = Compact.compactParquet(spark, in, out)
    assert(nIn === fragged)
    assert(nOut === 3, s"one compacted file per lang leaf, got $nOut")
    // the routing tree survives (so static pruning still works)
    val outDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_")).sorted
    assert(outDirs === Array("lang=de", "lang=en", "lang=fr"))
    // content identical, partition column included
    val a = spark.read.parquet(in).collect().map(_.toString).sorted
    val b = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(a === b)
  }

  test("compact refuses in-place rewrites (plain and URI-spelled) and bad targets") {
    val d = java.nio.file.Files.createTempDirectory("graft_compact_same").toString
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, d, d)
    }
    // a URI spelling of the same directory must not sneak past the guard
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, s"file://$d", d)
    }
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, d, d + "_out", targetFileBytes = 0)
    }
    // nested targets: outDir inside inDir would be walked as a partition
    // subdirectory and compacted into itself (the retry-with-stale-output
    // trap); inDir inside outDir would be overwritten mid-read
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, d, d + "/out")
    }
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, d + "/in", d)
    }
    // a sibling whose name merely shares the prefix is NOT nested and
    // must pass the guard (it fails later only for having no parquet)
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, d, d + "_sibling")
    }.getMessage match {
      case m => assert(m.contains("no parquet files"), m)
    }
  }
}
