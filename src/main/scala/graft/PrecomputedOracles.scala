package graft

/** Loader for the precomputed expected-row oracles.
  *
  * `src/main/resources/graft/precomputed_oracles.json` maps query name
  * -> DuckDB SQL whose body is literal VALUES rows branched on the
  * corpus identity (`count(*)` of documents and embeddings), generated
  * by `tools/gen_precomputed_oracles.py` from the FULL replay oracles
  * (`Queries.liveOracles` under GRAFT_FULL_REPLAY=1). Each SQL carries
  * a leading `--` comment recording its provenance, so the driver's
  * oracle_sql.json artifact is self-documenting.
  *
  * On a corpus whose row counts match no embedded branch (e.g. the
  * adversarial edge corpus) every branch filter is false and the oracle
  * returns 0 rows — the gate then FAILS loudly on a row-count mismatch
  * instead of silently passing; the edge harness lists these queries in
  * ORACLE_SKIP.json for that reason.
  *
  * Keys starting with "_" are metadata, not oracles.
  */
object PrecomputedOracles {
  lazy val sql: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/precomputed_oracles.json")
    if (in == null) Map.empty
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = try mapper.readTree(in) finally in.close()
      val b = Map.newBuilder[String, String]
      val it = node.fieldNames()
      while (it.hasNext) {
        val k = it.next()
        if (!k.startsWith("_")) b += k -> node.get(k).asText()
      }
      b.result()
    }
  }
}
