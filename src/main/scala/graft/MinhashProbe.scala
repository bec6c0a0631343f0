package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the MinHash LSH candidate pipeline at the
  * bench's 200k-doc scale: signature kernel vs banding join vs pair
  * dedup vs estimate re-attach, so a bench drift is attributable.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val bigDocs = BenchData.dupGroupDocs(spark, 200000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bigDocs.count()
    for (rep <- 1 to 2) {
      val sigs = bigDocs.select(col("doc_id").cast("long").as("id"),
          graft.plans.GraftFunctions.minhash_sig(col("text"), 64, 3).as("sig"))
        .where(col("sig").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tSig = time { sigs.count(); () }
      val banded = sigs.select(col("id"),
        posexplode(graft.plans.GraftFunctions.band_folds(col("sig"), 8)))
        .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
      val a = banded.alias("a")
      val b = banded.hint("shuffle_hash").alias("b")
      val rawPairs = a.join(b, col("a.band") === col("b.band") &&
                            col("a.bucket") === col("b.bucket") &&
                            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val tJoin = time { println("  raw pairs: " + rawPairs.count()) }
      val pairs = rawPairs.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tDistinct = time { println("  distinct pairs: " + pairs.count()) }
      val est = pairs
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")).hint("shuffle_hash"), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")).hint("shuffle_hash"), "id_b")
        .where(graft.plans.GraftFunctions.band_agree(col("sig_a"), col("sig_b"), 8))
        .select(col("id_a"), col("id_b"),
          graft.plans.GraftFunctions.sig_agreement(col("sig_a"), col("sig_b")).as("est_jaccard"))
      val tEst = time { est.count(); () }
      println(f"[minhash rep $rep] sig $tSig%.2f  bandjoin $tJoin%.2f  distinct $tDistinct%.2f  estimate $tEst%.2f")
      pairs.unpersist(blocking = true)
      sigs.unpersist(blocking = true)
      val tFull = time {
        val r = operators.Dedup.minhashCandidates(bigDocs, "text", "doc_id")
        r.count(); r.unpersist(blocking = true); ()
      }
      println(f"[minhash rep $rep] full operator $tFull%.2f s")
    }
    spark.stop()
  }
}
