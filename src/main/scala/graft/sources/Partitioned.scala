package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Directory-partitioned parquet — the routing layout, completing the
  * three storage layouts this engine writes:
  *
  *  - `Partitioned` (this): `partitionBy(col)` directory trees for
  *    STATIC PRUNING — a reader that wants `lang=en` lists and scans
  *    only that subtree. Right when most queries filter on a
  *    low-cardinality routing column (language, source, date).
  *  - [[Bucketed]]: hash buckets for SHUFFLE-FREE JOINS on a
  *    high-cardinality key.
  *  - [[Compact]]: file-size maintenance for either.
  *
  * The cardinality caveat is the whole design decision: `partitionBy`
  * creates one directory per distinct value PER WRITING TASK, so a
  * high-cardinality column (doc_id, fingerprint) produces millions of
  * KB-files and a listing-bound driver. Partition by routing columns
  * (tens to thousands of values), bucket by join keys. [[writeRouted]]
  * enforces the repartition-by-value staging that bounds files to one
  * per (partition value), mirroring `Bucketed.writeBucketed`'s
  * compaction stance.
  */
object Partitioned {

  /** Write `df` partitioned by `routeCol` with one file per partition
    * value (the pre-shuffle groups all rows of a value into one task).
    * NULL route values land in Spark's `__HIVE_DEFAULT_PARTITION__`
    * directory and come back as NULL — lossless for the null stratum.
    */
  def writeRouted(df: DataFrame, path: String, routeCol: String): Unit =
    df.repartition(col(routeCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(routeCol)
      .parquet(path)

  /** Read back with an explicit route filter. The `isin` lands in the
    * scan's `PartitionFilters` (static pruning — unlisted directories
    * are never opened, spec-pinned in `PartitionedSpec`). NOTE the
    * routing column returns with the type parquet partition discovery
    * infers from directory names; pass `routeType` (e.g. "string") to
    * pin it against surprise (`spark.sql.sources.partitionColumnTypeInference`).
    */
  def readRouted(spark: SparkSession, path: String, routeCol: String,
                 values: Seq[String], routeType: String = "string"): DataFrame = {
    require(values.nonEmpty, "readRouted needs at least one route value")
    // filter BEFORE the cast: a cast wrapped around the partition
    // column would block the isin from reaching PartitionFilters
    spark.read.parquet(path)
      .where(col(routeCol).isin(values: _*))
      .withColumn(routeCol, col(routeCol).cast(routeType))
  }
}
