package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The driver's events.parquet has shipped `ts` in different physical
  * encodings across rounds: long epoch-nanos (INT64 + nanos annotation,
  * read as LongType under `nanosAsLong`) and timestamp[us] (read as
  * TIMESTAMP / TIMESTAMP_NTZ). Round 7's regeneration flipped the
  * encoding and would have broken the ANSI driver gate (timestamp minus
  * bigint throws) had `AnsiModeSpec` not caught it first. This pins the
  * fix: every ts-arithmetic driver query must produce IDENTICAL results
  * for all three encodings of the same instants.
  */
class EventsTsSpec extends SparkSpec {
  import spark.implicits._

  test("events queries are invariant to the ts parquet encoding") {
    // user 100: t=0, +1000 s (same 30-min session), +4000 s (new
    // session, also a new hour window); user 200: one event
    val base = Seq(
      (1L, 100L, 0L, "a", 1.0),
      (2L, 100L, 1000L * 1000000000L, "b", 2.0),
      (3L, 100L, 4000L * 1000000000L, "a", 3.0),
      (4L, 200L, 0L, "b", 4.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")

    def writeVariant(suffix: String, f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"ev-$suffix")
      f(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir.toString
    }
    val dirs = Seq(
      writeVariant("ns", identity), // long epoch nanos
      writeVariant("ts", _.withColumn("ts",
        timestamp_micros(expr("ts div 1000")))), // TIMESTAMP (micros)
      writeVariant("ntz", _.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))))

    // encoding sanity: the three variants really read back as three types
    val readTypes = dirs.map(d =>
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType).toSet
    assert(readTypes.exists(_ == org.apache.spark.sql.types.LongType))
    assert(readTypes.exists(t => t == TimestampType || t == TimestampNTZType))

    for (q <- Seq("events_sessionize", "events_hourly")) {
      val results = dirs.map(d =>
        Queries.all(q)(spark, d).collect().map(_.toString).sorted.toSeq)
      assert(results.distinct.size == 1,
        s"$q diverges across ts encodings: ${results.map(_.take(3))}")
    }
    val sess = Queries.all("events_sessionize")(spark, dirs.head)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sess == Map(100L -> ((2L, 3L)), 200L -> ((1L, 1L))), sess.toString)
  }
}
