package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Small-file compaction — the maintenance pass every streaming or
  * incremental ingest eventually needs. A file-stream sink (or a
  * per-batch `write.parquet`) produces one file per (trigger, task);
  * at 100 TB that becomes millions of KB-sized files whose per-file
  * open/footer cost dominates scans and whose listing alone stalls the
  * driver. Compaction rewrites a directory to ~`targetFileBytes` files
  * in one distributed pass per leaf directory.
  *
  * Partitioned layouts ([[Partitioned]] routing trees, [[Shards]]
  * exports) compact PER LEAF DIRECTORY, mirroring the tree into the
  * output — the directory routing (and therefore static pruning)
  * survives, and each partition's file count is sized to its own
  * bytes. A flat directory is the single-leaf case of the same walk.
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
    * `targetFileBytes`-sized files, recursing into partition
    * subdirectories (each leaf compacts independently; `_`-prefixed
    * sink metadata like `_spark_metadata` is skipped). Returns (input
    * file count, output file count) summed over the tree. Sizing uses
    * the INPUT's on-disk (compressed) bytes — parquet-to-parquet
    * rewrites keep similar compression, so output files land near the
    * target without a calibration pass.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 512L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val inFs = new Path(inDir).getFileSystem(conf)
    val outFs = new Path(outDir).getFileSystem(conf)
    // qualify through the FileSystem (not java.io.File, which treats
    // URI spellings like file:///x as relative paths) so 'file:///tmp/d'
    // and '/tmp/d' cannot sneak past the in-place guard
    val inQ = inFs.makeQualified(new Path(inDir))
    val outQ = outFs.makeQualified(new Path(outDir))
    require(inQ != outQ,
      "compact in place is not atomic — write to a new directory and swap")
    // nesting is as bad as equality: outDir under inDir would be listed
    // by walk() as a partition subdirectory and compacted into itself
    // (duplicating rows); inDir under outDir would be clobbered by the
    // Overwrite of its ancestor
    def isAncestor(a: Path, b: Path): Boolean =
      a.toUri == b.toUri ||
        (a.toUri.getScheme == b.toUri.getScheme &&
          b.toUri.getPath.startsWith(a.toUri.getPath.stripSuffix("/") + "/"))
    require(!isAncestor(inQ, outQ) && !isAncestor(outQ, inQ),
      s"input and output directories must not be nested: $inQ vs $outQ")

    def walk(in: Path, out: Path): (Int, Int) = {
      val entries = inFs.listStatus(in)
      val files = entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val dirs = entries.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      val here =
        if (files.isEmpty) (0, 0)
        else {
          val totalBytes = files.map(_.getLen).sum
          val nOut = math.max(1L,
            (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
          spark.read.parquet(in.toString).repartition(nOut)
            .write.mode(SaveMode.Overwrite).parquet(out.toString)
          (files.length, nOut)
        }
      dirs.foldLeft(here) { case ((ni, no), d) =>
        val (ci, co) = walk(d.getPath, new Path(out, d.getPath.getName))
        (ni + ci, no + co)
      }
    }
    val (nIn, nOut) = walk(inQ, outQ)
    require(nIn > 0, s"no parquet files found under $inDir")
    (nIn, nOut)
  }
}
