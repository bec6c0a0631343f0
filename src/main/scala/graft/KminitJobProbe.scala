package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-job duration trace of one initScalableCentroids call per arm
  * (loop-session rebase off / on) in one JVM — attributes the wall
  * delta the interleaved A/B sees to specific jobs.
  */
object KminitJobProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.get(je.jobId)
        log.add(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
        ()
      }
    })
    val big = spark.range(200000).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i * 0.7 + i * 1.3).cast("float").cast("double"))
        .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()
    operators.Kmeans.initScalableCentroids(big, "embedding", "id", k = 256) // warm
    import scala.jdk.CollectionConverters._
    def setArm(arm: String): Unit = {
      sys.props.remove("graft.loopsession.off")
      sys.props.remove("graft.loopsession.parts")
      sys.props.remove("graft.loopsession.keepaqe")
      arm match {
        case "off"        => sys.props("graft.loopsession.off") = "1"
        case "noaqe_p1"   => ()
        case "noaqe_p32"  => sys.props("graft.loopsession.parts") = "32"
        case "aqe_p1"     => sys.props("graft.loopsession.keepaqe") = "1"
        case "aqe_p32"    => sys.props("graft.loopsession.keepaqe") = "1"
                             sys.props("graft.loopsession.parts") = "32"
      }
    }
    val arms = Seq("off", "noaqe_p1")
    val best = scala.collection.mutable.Map[String, Double]()
    for (rep <- 1 to 6; arm <- arms) {
      setArm(arm)
      Thread.sleep(200); log.clear()
      val t0 = System.nanoTime()
      operators.Kmeans.initScalableCentroids(big, "embedding", "id", k = 256)
      val sec = (System.nanoTime() - t0) / 1e9
      best(arm) = math.min(best.getOrElse(arm, Double.MaxValue), sec)
      println(s"=== arm $arm rep $rep total ${f"$sec%.3f"} s jobs ${log.size} ===")
    }
    best.toSeq.sortBy(_._1).foreach { case (a, s) =>
      println(f"=== BEST $a ${s}%.3f s ===") }
    spark.stop()
  }
}
