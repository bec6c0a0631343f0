package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the LATEST right row with
  * the same key and `right.ts <= left.ts` — the attribution/enrichment
  * join (each purchase gets its most recent preceding click; each trade
  * gets the prevailing quote) that stock Spark has no operator for.
  *
  * Spelled as a UNION + running `last(ignoreNulls)` window rather than
  * an inequality join: a range θ-join materializes every (left, right)
  * pair within the time bound before picking the max (quadratic in the
  * per-key event rate), while the union form is one shuffle on the key,
  * one in-partition sort, and a single linear pass — the same
  * merge-scan an ASOF-native engine runs. Right rows sort BEFORE left
  * rows at equal timestamps, so the match is inclusive (`<=`).
  *
  * Determinism contract: several right rows on the SAME (key, ts) are
  * ordered by their full column struct, and the match takes the
  * greatest — with an id-led right schema that means "max id wins",
  * replayable in any engine. NULL keys form their own partition (null
  * left rows match null right rows), mirroring window semantics, and
  * NULL timestamps sort first, i.e. a null-ts left row matches only
  * null-ts right rows.
  *
  * Scale shape: the window partitions by key — splittable across the
  * key space, hot ONLY if a single key carries an unsplittable share of
  * events; for that regime pre-bucket the time axis and run this
  * per (key, bucket) with a carry-in, same as any merge-scan engine
  * shards its streams.
  */
object AsOfJoin {

  /** Left columns plus an `asof` struct of the matched right row
    * (NULL when no right row precedes). `keyCol`/`tsCol` must exist on
    * both sides with compatible types.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lTagged = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rType).as("__r"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"),
      lit(null).cast(lType).as("__l"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionAll(lTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col("__match").as("asof"))
  }
}
