package graft

import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Engine-wide concurrency net: several operators with internal state
  * (persists, child sessions, broadcasts, trained models) run
  * SIMULTANEOUSLY on the shared SparkSession and must produce exactly
  * the results they produce alone. Catches any operator that reaches
  * for session-global mutable state (conf, catalog, cache) without
  * isolation — the class of bug the resolve-specific concurrency test
  * pins, but across the whole surface.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // canonical results computed sequentially
  private def runs: Seq[(String, () => Set[String])] = {
    val docs = () => spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
    Seq(
      "minhash_resolve" -> (() => {
        // unpersist the frame minhashCandidates actually persisted (its
        // return value) — unpersisting a filtered derivative is a no-op
        // and would leak a cached candidate set per run into the
        // suite-shared session
        val all = operators.Dedup.minhashCandidates(docs(), "text", "doc_id")
        val r = operators.Dedup
          .resolveDuplicateClusters(all.where(col("est_jaccard") >= 0.5))
          .collect().map(_.toString).toSet
        all.unpersist(blocking = false)
        r
      }),
      "token_freq" -> (() =>
        operators.Corpus.tokenFrequencies(docs(), "text", 10)
          .collect().map(_.toString).toSet),
      "quality" -> (() =>
        docs().select(col("doc_id"),
            functions.TextFunctions.qualityScore(col("text")).as("q"))
          .collect().map(_.toString).toSet),
      "chunks" -> (() =>
        operators.Corpus.chunkByTokens(docs(), "text", "doc_id", 32, 4)
          .collect().map(_.toString).toSet))
  }

  test("operators running concurrently match their sequential results") {
    val sequential = runs.map { case (name, f) => name -> f() }.toMap
    // two concurrent waves: every operator in flight at once, twice
    for (wave <- 1 to 2) {
      val futures = runs.map { case (name, f) => Future(name -> f()) }
      val concurrent = Await.result(Future.sequence(futures), 120.seconds).toMap
      for ((name, expected) <- sequential)
        assert(concurrent(name) == expected, s"wave $wave: $name diverged under concurrency")
    }
  }
}
