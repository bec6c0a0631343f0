package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the release-artifact contracts of the sharded export that the
  * driver oracle (which is order-independent by design) cannot see:
  * within-shard determinism across runs, shard-assignment stability
  * under corpus growth, and rough balance.
  */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_shards_$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def shardContent(path: String, k: Int): Seq[Long] =
    spark.read.parquet(s"$path/shard=$k").select("doc_id")
      .collect().map(_.getLong(0)).toSeq // single sorted file: read order = file order

  test("two writes of the same data produce identical shard content in identical order") {
    val df = (0L until 500L).map(i => (i, f"fp$i%05d")).toDF("doc_id", "fp")
    val (d1, d2) = (tmp("a"), tmp("b"))
    Shards.writeSharded(df, d1, "doc_id", nShards = 4)
    Shards.writeSharded(df.repartition(7), d2, "doc_id", nShards = 4) // different input layout
    (0 until 4).foreach { k =>
      val (a, b) = (shardContent(d1, k), shardContent(d2, k))
      assert(a === b, s"shard $k diverged between runs")
      assert(a === a.sorted, s"shard $k not internally sorted")
    }
  }

  test("a document's shard never moves when the corpus grows") {
    val small = (0L until 200L).map(i => (i, "x")).toDF("doc_id", "fp")
      .withColumn("shard", Shards.shardOf(col("doc_id"), 8))
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val big = (0L until 2000L).map(i => (i, "x")).toDF("doc_id", "fp")
      .withColumn("shard", Shards.shardOf(col("doc_id"), 8))
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    small.foreach { case (id, s) => assert(big(id) === s, s"doc $id moved shards") }
    // and the md5 draw spreads load: no shard holds more than 2x its fair share
    val sizes = big.values.groupBy(identity).view.mapValues(_.size).values
    assert(sizes.max < 2 * (2000 / 8), s"unbalanced shards: $sizes")
  }
}
