package graft

/** ANSI-mode leg: every driver query must produce IDENTICAL results with
  * `spark.sql.ansi.enabled` on and off (Spark 4 defaults to on, so the
  * driver's oracle gate already runs ANSI — this pins the other mode
  * too). A divergence means some expression silently wraps, truncates,
  * or null-outs in legacy mode where ANSI would throw (or vice versa) —
  * the overflow bug class the decimal convergence-sum fix closed.
  */
class AnsiModeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all driver queries agree between ANSI and legacy mode") {
    val before = spark.conf.get("spark.sql.ansi.enabled")
    def leg(): Map[String, Seq[String]] = {
      // drop cached plan fragments so the second leg cannot be served
      // values computed under the first leg's mode
      spark.sharedState.cacheManager.clearCache()
      SparkEntry.queries.map { case (name, fn) =>
        val rows =
          try fn(spark, dir).collect().map(_.toString).sorted.toSeq
          catch {
            case e: Throwable =>
              fail(s"query $name threw under ansi=${spark.conf.get("spark.sql.ansi.enabled")}: $e")
          }
        name -> rows
      }
    }
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val ansi = leg()
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val legacy = leg()
      assert(ansi.keySet == legacy.keySet)
      for (name <- ansi.keySet) {
        assert(ansi(name) == legacy(name),
          s"query $name diverges between ANSI and legacy mode")
      }
      assert(ansi.values.map(_.size).sum > 0)
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", before)
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
