package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the maintenance pass every streaming or
  * incremental ingest eventually needs. A file-stream sink (or a
  * per-batch `write.parquet`) produces one file per (trigger, task);
  * at 100 TB that becomes millions of KB-sized files whose per-file
  * open/footer cost dominates scans and whose listing alone stalls the
  * driver. Compaction rewrites a directory to ~`targetFileBytes` files
  * in one distributed pass.
  *
  * The rewrite uses round-robin `repartition(n)` — a shuffle — rather
  * than `coalesce(n)`: coalesce would avoid the shuffle but glues
  * ARBITRARY input partitions together, so one output file can end up
  * with most of the bytes (exactly the skew compaction exists to fix).
  * The shuffle moves each byte once; for a maintenance job that runs
  * off the critical path, even output beats saved movement.
  */
object Compact {

  /** Rewrite `inDir`'s parquet files into `outDir` as approximately
    * `targetFileBytes`-sized files. Returns (input file count, output
    * file count). Sizing uses the INPUT's on-disk (compressed) bytes —
    * parquet-to-parquet rewrites keep similar compression, so output
    * files land near the target without a calibration pass.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 512L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    require(new java.io.File(outDir).getCanonicalPath !=
            new java.io.File(inDir).getCanonicalPath,
      "compact in place is not atomic — write to a new directory and swap")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (files.length, nOut)
  }
}
