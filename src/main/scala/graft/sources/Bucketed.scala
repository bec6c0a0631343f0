package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet tables — the shuffle-elimination story for joins
  * that repeat on the same key.
  *
  * A 100 TB corpus joined on `fp` (dedup confirm, incremental ingest,
  * metadata attach) pays a full shuffle of both sides on EVERY join.
  * Writing each side bucketed by the join key amortizes that shuffle
  * into the write: Spark records `bucketBy(n, key)` in the catalog,
  * hash-partitions rows into `n` files per partition dir at write time,
  * and the planner then satisfies the join's distribution requirement
  * straight from the scan — `SortMergeJoin` over two bucketed scans has
  * NO Exchange on either side (spec-pinned in `BucketedSpec`). At
  * 1000-executor scale this converts the join from cluster-wide network
  * movement into node-local merge work.
  *
  * `sortBy(key)` additionally persists the within-bucket sort. Spark ≥3.0
  * still plans a Sort above the scan (SPARK-28595: with several files per
  * bucket the persisted order could interleave, so the scan never claims
  * it) — but over pre-sorted input that Sort is a linear merge-verify
  * pass, not an n·log n shuffle-buffer sort; the Exchange is the node
  * bucketing actually deletes.
  *
  * Caveats that matter at scale, encoded here rather than left to the
  * caller:
  *  - Bucket counts must MATCH across the tables being joined (or be
  *    integer multiples under `spark.sql.bucketing.coalesceBucketsInJoin`);
  *    [[writeBucketed]] takes the count explicitly so callers co-plan it.
  *  - Bucketing lives in the session catalog, not the parquet footer: a
  *    plain `spark.read.parquet(path)` of the same files forgets the
  *    layout. Read through [[table]].
  *  - One file per (task, bucket) pair is written; pre-repartitioning by
  *    the bucket key at write time keeps small-file counts bounded
  *    ([[writeBucketed]] does this when asked).
  */
object Bucketed {

  /** Write `df` as a bucketed, within-bucket-sorted external parquet
    * table at `path`, registered as `name` in the session catalog.
    *
    * `compactFirst` pre-shuffles rows by the bucket key so each bucket
    * is produced by one task — one file per bucket instead of
    * (tasks × buckets) files. Worth it whenever the table is written
    * once and joined many times; skip it to save the extra shuffle when
    * the writer is already partitioned compatibly.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    bucketCol: String, nBuckets: Int,
                    compactFirst: Boolean = true): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val staged =
      if (compactFirst)
        df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      else df
    staged.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Read a bucketed table back through the catalog (the only route
    * that preserves the bucket layout for the planner).
    */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Drop the catalog entry (external data files are kept). */
  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
