package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.som.{Som, SomConfig, SomModel}

/** Round-11 measurement for the IVF index BUILD write shape
  * (`Similarity.writeAssignedIndex` and the writeIvf{Pq,Sq}Index code
  * writes): `df.write.partitionBy(cell)` emits one file per
  * (task x touched cell) — tasks x cells files, which at 100 TB scan
  * widths (10^4-10^5 tasks, 10^3-10^4 cells) is a 10^7+-file layout
  * (guide §6: small files hurt twice). The candidate fix is a salted
  * cell-clustered repartition before the write: files become
  * cells x filesPerCell, hot cells still spread over filesPerCell
  * tasks (no single-task pin), at the cost of one corpus shuffle.
  * This probe prices both spellings at the bench scale and counts the
  * files each produces; read-back row equality is asserted.
  *
  * `runMain graft.IvfWriteProbe [nRows]`
  */
object IvfWriteProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def min2(f: => Unit): Double = math.min(time(f), time(f))

    val big = spark.range(nRows).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i * 0.7 + i * 1.3).cast("float").cast("double"))
        .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()

    var model: SomModel = null
    val tFit = min2 {
      model = new Som(SomConfig(4, 4, seed = 7)).fit(big, "embedding", numEpochs = 2)
    }

    def countFiles(dir: String): Long = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.count(f =>
        f.getFileName.toString.endsWith(".parquet")).toLong
      finally walk.close()
    }

    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfw_a_").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfw_b_").toString
    val assigned = model.withBmu(big, "embedding")
    val tPlain = min2 {
      assigned.write.mode("overwrite").partitionBy("bmu_id").parquet(s"$dirA/idx")
    }
    val filesPerCell = 2
    val tClustered = min2 {
      assigned
        .repartition(col("bmu_id"),
          pmod(xxhash64(col("id")), lit(filesPerCell)))
        .write.mode("overwrite").partitionBy("bmu_id").parquet(s"$dirB/idx")
    }
    val na = spark.read.parquet(s"$dirA/idx").count()
    val nb = spark.read.parquet(s"$dirB/idx").count()
    require(na == nb && na == nRows, s"row mismatch: $na vs $nb vs $nRows")
    // serve leg on both layouts (bucket pruning is directory-based,
    // identical; file count changes the scan's open cost)
    val qvecs = big.where(col("id") < 5).collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray)
    }.toSeq
    val servedA = spark.read.parquet(s"$dirA/idx")
    val servedB = spark.read.parquet(s"$dirB/idx")
    graft.operators.Similarity.somTopKAssigned(servedA, model, "embedding",
      "id", qvecs, k = 10, nProbe = 4).count()
    val tServeA = min2 {
      graft.operators.Similarity.somTopKAssigned(servedA, model, "embedding",
        "id", qvecs, k = 10, nProbe = 4).count(); ()
    }
    val tServeB = min2 {
      graft.operators.Similarity.somTopKAssigned(servedB, model, "embedding",
        "id", qvecs, k = 10, nProbe = 4).count(); ()
    }
    println(f"[ivfwprobe] n=$nRows fit=$tFit%.3f s  " +
      f"write plain=$tPlain%.3f s (${countFiles(s"$dirA/idx")} files)  " +
      f"clustered=$tClustered%.3f s (${countFiles(s"$dirB/idx")} files)  " +
      f"serve plain=$tServeA%.3f s clustered=$tServeB%.3f s")
    BenchData.deleteRecursively(dirA)
    BenchData.deleteRecursively(dirB)
    spark.stop()
  }
}
