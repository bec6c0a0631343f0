package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSpec {
  import spark.implicits._

  test("routed write prunes statically: only requested directories are scanned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_routed").toString
    val docs = (0L until 300L)
      .map(i => (i, s"doc $i", Seq("en", "de", "fr", "ja", "pt")((i % 5).toInt)))
      .toDF("doc_id", "text", "lang")
    Partitioned.writeRouted(docs, dir, "lang")
    // one directory per value, one file per directory (pre-shuffle)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(subdirs === Array("lang=de", "lang=en", "lang=fr", "lang=ja", "lang=pt"))
    subdirs.foreach { d =>
      val files = new java.io.File(dir, d).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$d should hold one file, got ${files.length}")
    }
    val routed = Partitioned.readRouted(spark, dir, "lang", Seq("en", "ja"))
    assert(routed.count() === 120)
    // static pruning: the scan's file listing contains ONLY the two
    // requested subtrees (same proof style as the IVF partitioned index)
    val scanned = routed.queryExecution.executedPlan.collectLeaves()
      .flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
        case _ => Nil
      }
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => p.contains("lang=en") || p.contains("lang=ja")),
      s"unpruned paths: ${scanned.filterNot(p => p.contains("lang=en") || p.contains("lang=ja"))}")
    // and PartitionFilters (not a post-scan Filter) carry the isin
    val planStr = routed.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("lang"))
  }

  test("null route values round-trip through the default partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_routed_null").toString
    val docs = Seq((1L, "a", "en"), (2L, "b", null), (3L, "c", "de"))
      .toDF("doc_id", "text", "lang")
    Partitioned.writeRouted(docs, dir, "lang")
    val back = spark.read.parquet(dir)
    assert(back.where(col("lang").isNull).select("doc_id").as[Long].collect()
      === Array(2L))
  }
}
