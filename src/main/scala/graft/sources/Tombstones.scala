package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** The compaction/delete fence shared by the serving-index compactors
  * ([[graft.operators.Similarity.compactIvfIndex]] and
  * [[graft.operators.Retrieval.compactBm25Index]]).
  *
  * Both indexes record deletes as parquet id-lists appended to a
  * tombstone side-table, and compaction folds the pending tombstones
  * into a fresh epoch at `outPath` whose own tombstone dir starts
  * empty. That leaves a race: a delete issued AFTER the fold snapshots
  * the side-table but BEFORE the deployment layer swaps epochs lands
  * only in the OLD epoch's side-table and would vanish with it.
  *
  * The fence closes it without requiring writers to quiesce:
  *
  *  1. at fold time the compactor lists the tombstone files it is
  *     about to fold and records exactly those names in the NEW epoch
  *     (`outPath/<marker>`, one file name per line — [[writeFolded]]);
  *     the fold reads exactly the listed files, never the live
  *     directory, so the snapshot and the fold cannot diverge;
  *  2. immediately before the swap, maintenance calls the compactor's
  *     replay entry point ([[replayDelta]]): every file now present in
  *     the old epoch's tombstone dir but absent from the folded
  *     listing is copied into the new epoch's tombstone dir. Ids whose
  *     rows were already folded away are harmless no-ops under the
  *     anti-join, so replaying a file that raced the listing is safe —
  *     the delta can only over-approximate, never lose a delete.
  *
  * Appended tombstone files carry unique part-UUID names, so the
  * name-set difference identifies the delta exactly.
  */
object Tombstones {

  /** Parquet part files directly under `dir` (absent dir → empty),
    * sorted by name for a deterministic listing.
    */
  def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
  }

  /** Record the tombstone snapshot a compaction folded: one file NAME
    * per line at `outPath/marker`. Written unconditionally (an empty
    * listing is itself the fence's statement that nothing was folded),
    * driver-side — it is a few hundred bytes of metadata, not a job.
    */
  def writeFolded(spark: SparkSession, outPath: String, marker: String,
                  files: Seq[String]): Unit = {
    val p = new Path(s"$outPath/$marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(files.map(f => new Path(f).getName).sorted
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readFolded(spark: SparkSession, outPath: String,
                         marker: String): Set[String] = {
    val p = new Path(s"$outPath/$marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** Copy every tombstone file present under `oldTombDir` but absent
    * from the new epoch's folded listing into `newTombDir` — the
    * pre-swap replay step. Returns the number of files replayed.
    * Absent folded listing = fresh epoch that never folded (or a
    * pre-fence epoch): the whole side-table replays, which is correct
    * and at worst re-excludes already-folded ids. Idempotent: appended
    * tombstone files carry unique part-UUID names, so a name already
    * present at the destination IS the same file and is skipped — a
    * second replay of the same delta returns 0.
    */
  def replayDelta(spark: SparkSession, oldTombDir: String,
                  newEpoch: String, marker: String,
                  newTombDir: String): Int = {
    val folded = readFolded(spark, newEpoch, marker)
    val already = listParquet(spark, newTombDir)
      .map(f => new Path(f).getName).toSet
    val pending = listParquet(spark, oldTombDir)
      .map(f => new Path(f).getName)
      .filter(nm => !folded.contains(nm) && !already.contains(nm))
      .map(nm => s"$oldTombDir/$nm")
    if (pending.isEmpty) return 0
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(newTombDir)
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst)
    pending.foreach { f =>
      val src = new Path(f)
      FileUtil.copy(src.getFileSystem(conf), src, fs,
        new Path(dst, src.getName), false, conf)
    }
    pending.length
  }
}
