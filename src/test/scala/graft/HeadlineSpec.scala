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
}
