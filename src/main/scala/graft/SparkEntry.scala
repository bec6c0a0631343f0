package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.som._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Trains a 6x6 SOM on the embeddings table (reference defaults:
    * euclidean + gaussian + exponential decay, `xpysom.py:75-78`) and
    * answers the activation-response query (`xpysom.py:819-829`) —
    * SURVEY §7.2's acceptance slice.
    */
  def entry(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = new Som(SomConfig(6, 6, seed = 42)).fit(df, "embedding", numEpochs = 3)
    model.activationResponse(df, "embedding")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
