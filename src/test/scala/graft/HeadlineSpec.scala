package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-facing bench headline contract: BENCH_r06 and
  * BENCH_r07 both came back `parsed: null` because the final stdout
  * line outgrew the driver's 2000-char tail window and was cut
  * mid-JSON. The headline must stay far enough under the window that
  * routine growth (a few new bench entries per round) cannot overflow
  * it again, and must round-trip a strict JSON parse.
  */
class HeadlineSpec extends AnyFunSuite {

  // the r7 bench section had 39 entries; pad to 60 so the length bound
  // holds with ~20 rounds of headroom, with realistically long names
  private val fakeResults: collection.Map[String, Double] = {
    val m = scala.collection.mutable.LinkedHashMap[String, Double]()
    // deliberately inserted in NON-sorted order (mirrors real insertion
    // order: distance benches land before bloom benches)
    for (i <- 60 to 1 by -1) m(f"bench_some_long_workload_name_$i%02d_200k") = i * 123.4567
    m("bench_train_200k") = 0.4734
    m("bench_bmu_200k") = 0.3682
    m("bench_minhash_200k") = 43.2093
    m("bench_resolve_hybrid_200k") = 7.6768
    m("bench_bucketed_join_200k") = 0.258
    m("bench_plain_join_200k") = 0.8163
    m
  }

  test("headline is short enough for the driver's 2000-char stdout tail") {
    val line = BenchData.headline(12345.6789, fakeResults, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1500,
      s"headline is ${line.length} chars; the driver tail keeps ~1900 usable")
  }

  test("headline parses as strict JSON with the contract fields") {
    val line = BenchData.headline(12345.6789, fakeResults, "/root/testdata/sf0.1")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line) // throws on malformed JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() == 12345.6789)
    assert(node.get("unit").asText() == "sec")
    val qs = node.get("queries")
    for (k <- Seq("bench_train_200k", "bench_bmu_200k", "bench_minhash_200k",
                  "bench_resolve_hybrid_200k", "bench_bucketed_join_200k",
                  "bench_plain_join_200k"))
      assert(qs.has(k), s"contract entry $k missing from headline queries")
    assert(qs.get("bench_minhash_200k").asDouble() == 43.2093)
    // bench_ms must follow sorted-name order, as the order label claims
    val ms = node.get("bench_ms")
    assert(ms.size() == fakeResults.size)
    val sortedNames = fakeResults.toSeq.sortBy(_._1)
    assert(ms.get(sortedNames.indexWhere(_._1 == "bench_bmu_200k")).asLong() == 368L)
    assert(ms.get(sortedNames.indexWhere(_._1 == "bench_minhash_200k")).asLong() == 43209L)
    assert(node.get("order").asText().contains("sorted"))
  }

  test("headline omits suite_ms (the r7 overflow source)") {
    val line = BenchData.headline(1.0, fakeResults, "/tmp/x")
    assert(!line.contains("suite_ms"))
  }

  test("headline carries the bandwidth stamp when one was measured") {
    val line = BenchData.headline(1.0, fakeResults, "/tmp/x", bwGbps = 9.71)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("bw_gbps").asDouble() == 9.71)
    // and omits it cleanly (still valid JSON) when no stamp exists
    val bare = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(BenchData.headline(1.0, fakeResults, "/tmp/x"))
    assert(!bare.has("bw_gbps"))
  }

  /** Replays the driver's extraction: it keeps the last ~2000 chars of
    * stdout and parses the LAST line as JSON. BENCH_r08 proved a
    * complete headline merely *inside* the tail is not enough — sbt's
    * "[info] " prefix and "[success]" trailer kept it from being the
    * last line, and `parsed` came back null three rounds running.
    * build.sbt now sets StdoutOutput + showSuccess := false and Bench
    * prints the headline after spark.stop(), so the headline IS the
    * final line; this test pins that the extraction recovers it from a
    * realistic stdout (chunk lines before it, trailing newline).
    */
  test("driver tail extraction: last line of the last 2000 chars parses") {
    val headline = BenchData.headline(126.37, fakeResults,
      "/root/testdata/sf0.1", bwGbps = 9.7)
    val chunkNoise = (1 to 8).map(i =>
      s"""{"metric":"bench_${i}of8","unit":"sec","queries":{"bench_x_$i":1.0}}""")
    val stdout = chunkNoise.mkString("\n") + "\n" + headline + "\n"
    val tail = stdout.takeRight(2000)
    val lastLine = tail.linesIterator.filter(_.nonEmpty)
      .foldLeft("")((_, l) => l)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lastLine) // throws on malformed JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("queries").has("bench_train_200k"))
  }
}
