package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.som._
import graft.streaming.StreamingSom

/** Manual E2E drive of the streaming surface: file-source stream of the
  * embeddings table, som_bmu tagging, aggregate to console.
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val static = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = new Som(SomConfig(4, 4, seed = 42)).fit(static, "embedding", 2)
    val streamDir = java.nio.file.Files.createTempDirectory("stream-smoke")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"),
      streamDir.resolve("embeddings.parquet"))
    val stream = spark.readStream.schema(static.schema).parquet(streamDir.toString)
    val tagged = StreamingSom.assignBmu(stream, model, "embedding")
    val q = tagged.groupBy("bmu_id").count()
      .writeStream.format("memory").queryName("stream_ar").outputMode("complete").start()
    q.processAllAvailable()
    val rows = spark.table("stream_ar").orderBy("bmu_id")
    println("[stream-smoke] neurons=" + rows.count())
    rows.show(20, truncate = false)
    q.stop()
    // cross-check against the batch path
    val batch = model.activationResponse(static, "embedding")
      .select("bmu_id", "n_wins").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val streamed = spark.table("stream_ar").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    println("[stream-smoke] batch==stream: " + (batch == streamed))
    spark.stop()
  }
}
