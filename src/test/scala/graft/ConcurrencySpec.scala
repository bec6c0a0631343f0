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
          .collect().map(_.toString).toSet),
      // round-7 stateful operators: prefix-sum packing (persist +
      // broadcast offsets), PQ serving (persist + checkpoint), semantic
      // dedup (persist + resolver child session + checkpoint)
      "pack" -> (() => {
        val p = operators.Packing.packSequences(docs(), "text", "doc_id", 64)
        val r = p.collect().map(_.toString).toSet
        p.unpersist(blocking = false)
        r
      }),
      "pq_topk" -> (() => {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val rows = emb.orderBy("vec_id").limit(16).collect()
          .map(_.getSeq[Float](1).map(_.toDouble).toArray).toSeq
        val cb = operators.Similarity.pqCodebookFromRows(rows, m = 4)
        val qs = Seq((0L, rows.head))
        operators.Similarity.pqTopK(emb, "embedding", "vec_id", cb,
            m = 4, k = 16, qs, kNN = 5)
          .collect().map(_.toString).toSet
      }),
      "semantic" -> (() => {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val rows = emb.orderBy("vec_id").limit(9).collect()
          .map(_.getSeq[Float](1).map(_.toDouble).toArray).toSeq
        val model = som.SomModel.fromWeights(som.SomConfig(3, 3), rows)
        val r = operators.Dedup.semanticDupClusters(emb, "embedding",
          "vec_id", model, threshold = 0.25)
        val s = r.collect().map(_.toString).toSet
        org.apache.spark.sql.GraftBridge.freeCheckpoint(r)
        s
      }),
      // fourth-pass stateful sources: bucketed writes hit the
      // session-shared CATALOG (saveAsTable), routed/jsonl writes hit
      // the filesystem — per-call unique names keep runs isolated, and
      // concurrent catalog registration must not corrupt either table
      "bucketed" -> (() => {
        val n = ConcurrencySpec.seq.incrementAndGet()
        val tag = s"conc_${ProcessHandle.current.pid}_$n"
        val d = docs().select(col("doc_id").cast("long").as("doc_id"),
          functions.TextFunctions.docFingerprint(col("text")).as("fp"))
        sources.Bucketed.writeBucketed(d, s"graft_$tag", s"/tmp/graft_$tag",
          "doc_id", 4)
        val r = sources.Bucketed.table(spark, s"graft_$tag")
          .collect().map(_.toString).toSet
        sources.Bucketed.drop(spark, s"graft_$tag")
        BenchData.deleteRecursively(s"/tmp/graft_$tag")
        r
      }),
      "routed" -> (() => {
        val n = ConcurrencySpec.seq.incrementAndGet()
        val path = s"/tmp/graft_routed_conc_${ProcessHandle.current.pid}_$n"
        sources.Partitioned.writeRouted(
          docs().select(col("doc_id"), col("lang")), path, "lang")
        val r = sources.Partitioned.readRouted(spark, path, "lang", Seq("en", "de"))
          .collect().map(_.toString).toSet
        BenchData.deleteRecursively(path)
        r
      }),
      "jsonl" -> (() => {
        val n = ConcurrencySpec.seq.incrementAndGet()
        val path = s"/tmp/graft_jsonl_conc_${ProcessHandle.current.pid}_$n"
        sources.Jsonl.write(docs(), path)
        val r = sources.Jsonl.readStrict(spark, path, sources.Jsonl.documentsSchema)
          .select(col("doc_id"),
            functions.TextFunctions.docFingerprint(col("text")).as("fp"))
          .collect().map(_.toString).toSet
        BenchData.deleteRecursively(path)
        r
      }))
  }

  test("operators running concurrently match their sequential results") {
    ConcurrencySpec.seq.get() // touch the companion so init races can't hide
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

object ConcurrencySpec {
  /** Per-call unique suffix for catalog/filesystem names under
    * concurrent waves.
    */
  val seq = new java.util.concurrent.atomic.AtomicLong(0)
}
