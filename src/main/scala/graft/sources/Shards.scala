package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharded export + manifest — the release artifact step.
  *
  * A dataset release wants (a) a FIXED number of shards whose membership
  * is reproducible across engines, runs, partitionings and retries, and
  * (b) a manifest a consumer can verify without trusting the producer:
  * per-shard row counts and an order-independent content checksum. Both
  * come from the same content-keyed md5 convention the samplers use
  * (`Sampling.bucket`): shard = first-8-hex(md5(salt‖id)) mod n — so a
  * document's shard never moves when the corpus grows, and the DuckDB
  * replay is exact.
  *
  * Scale shape: the write is one hash-shuffle on the shard id (one task
  * per shard writes one file via the value-grouped repartition); the
  * manifest is a map-side-combined aggregate over (shard, fingerprint)
  * pairs — neither moves document text more than once.
  */
object Shards {

  /** Reproducible shard assignment (engine-replayable md5 arithmetic —
    * NOT xxhash64/Murmur3, which other engines cannot replay).
    */
  def shardOf(key: Column, nShards: Int, salt: String = "graft"): Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    // fused md5-prefix kernel: same bits as
    // conv(substring(md5(..),1,8),16,10)::long, no per-row hex string
    pmod(graft.plans.GraftFunctions.md5_prefix_long(
      concat(lit(salt), key.cast("string")), 8), lit(nShards.toLong))
  }

  /** Write `df` into `nShards` directories (`shard=K/`), one file per
    * shard, rows sorted by `idCol` WITHIN each shard — without the
    * sort, row order inside a shard is shuffle-arrival order and two
    * runs over identical data produce different files; with it, the
    * release artifact is reproducible end-to-end (spec-pinned in
    * `ShardsSpec`). Reuses the routed (partitionBy) layout, so a
    * consumer can read any single shard with static pruning.
    */
  def writeSharded(df: DataFrame, path: String, idCol: String,
                   nShards: Int, salt: String = "graft"): Unit =
    df.withColumn("shard", shardOf(col(idCol), nShards, salt))
      .repartition(col("shard"))
      // sort by (shard, id): a task can hold SEVERAL shards (hash
      // collisions), and the parquet writer then re-sorts rows by the
      // partition column with an unstable sort — leading with `shard`
      // satisfies the writer's required ordering so it adds no sort of
      // its own and the within-shard id order survives to the file
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)

  /** Per-shard manifest over the written export: row count and an
    * order-independent content checksum (sum of the 60-bit numeric
    * prefix of each row's `fpCol`, accumulated in DECIMAL(38,0) so the
    * sum cannot overflow or depend on partial-aggregation order). A
    * consumer recomputes this from the shards alone.
    */
  def manifest(spark: SparkSession, path: String, fpCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col("shard").cast("long").as("shard"),
        conv(substring(col(fpCol), 1, 15), 16, 10).cast("decimal(38,0)").as("fpv"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("fpv")).cast("string").as("fp_sum"))
}
