package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the precomputed-oracle wiring: the resource must load, cover
  * exactly the queries the generator claims (tools/
  * gen_precomputed_oracles.py EXPENSIVE list), and substitute into the
  * default oracle map while the full-replay SQL stays available for
  * re-derivation.
  */
class PrecomputedOracleSpec extends AnyFunSuite {

  private val expected = Set(
    "dedup_semantic", "dedup_drop_near", "dedup_resolve_minhash",
    "dedup_minhash", "dedup_edit_verify", "ann_lsh_topk", "ann_recall",
    "dedup_keep_best", "dedup_resolve_clusters", "dedup_simhash")

  test("resource loads and covers the expensive replay set") {
    assert(PrecomputedOracles.sql.keySet == expected,
      s"resource keys ${PrecomputedOracles.sql.keySet} != $expected — " +
        "re-run tools/gen_precomputed_oracles.py after changing the set")
  }

  test("every precomputed oracle shadows a live replay oracle of the same name") {
    val live = Queries.liveOracles
    val orphans = PrecomputedOracles.sql.keySet.filterNot(live.contains)
    assert(orphans.isEmpty, s"precomputed entries with no live source: $orphans")
  }

  test("precomputed SQL is VALUES-literal (no signature replay) and self-documenting") {
    PrecomputedOracles.sql.foreach { case (name, sql) =>
      assert(sql.startsWith("-- PRECOMPUTED oracle"), s"$name lacks provenance header")
      assert(sql.contains("FROM (VALUES"), s"$name is not a VALUES oracle")
      assert(sql.contains("md5(text)") && sql.contains("count(*) ="),
        s"$name lacks the corpus-signature branch guard")
      // the expensive chains must be gone from the cheap form
      assert(!sql.contains("HUGEINT"), s"$name still carries the replay chain")
    }
  }

  test("default oracle map substitutes the precomputed form (unless FULL_REPLAY)") {
    val oracles = Queries.oracles
    if (sys.env.contains("GRAFT_FULL_REPLAY")) {
      expected.foreach { n =>
        assert(!oracles(n).startsWith("-- PRECOMPUTED"), s"$n should be live replay")
      }
    } else {
      expected.foreach { n =>
        assert(oracles(n).startsWith("-- PRECOMPUTED"), s"$n should be precomputed")
      }
    }
    // non-expensive oracles are identical in both modes (the
    // INDEPENDENT-implementation oracles have no live form at all;
    // kmeans_train_distributed is the forced-distributed twin that
    // shares kmeans_centroids' independent oracle — also no live form)
    val live = Queries.liveOracles
    (oracles.keySet -- expected -- IndependentOracles.sql.keySet
        - "kmeans_train_distributed"
        - "kmeans_scalable_init_distributed").foreach { n =>
      assert(oracles(n) == live(n), s"$n unexpectedly differs from live form")
    }
    assert(oracles("kmeans_train_distributed") == oracles("kmeans_centroids"),
      "the forced-distributed twin must share kmeans_centroids' oracle")
    assert(oracles("kmeans_scalable_init_distributed") ==
        oracles("kmeans_scalable_init"),
      "the forced-distributed init twin must share kmeans_scalable_init's oracle")
  }

  test("independent oracles cover exactly the no-live-form queries, fail-loud") {
    assert(IndependentOracles.sql.keySet ==
      Set("bpe_merges", "bpe_encode_stats", "kmeans_centroids",
        "kmeans_assign", "kmeans_quality", "kmeans_farthest",
        "kmeans_scalable_init",
        "kmeans_balanced_sample", "dedup_semantic_kmeans",
        "ann_ivf_kmeans", "quality_train_weights",
        "quality_train_score", "quality_train_eval",
        "quality_train_holdout", "uncertainty_sample"))
    IndependentOracles.sql.foreach { case (name, sql) =>
      assert(sql.startsWith("-- INDEPENDENT oracle"), s"$name lacks provenance header")
      assert(sql.contains("FROM (VALUES"), s"$name is not a VALUES oracle")
      // BPE guards hash the documents table; k-means guards hash the
      // embeddings table; logit-training guards hash text:n_chars
      // (each query's ONLY inputs)
      assert((sql.contains("md5(text)") ||
          sql.contains("md5(text || ':' || coalesce(n_chars") ||
          sql.contains("md5(vec_id::VARCHAR")) && sql.contains("count(*) ="),
        s"$name lacks the corpus-signature branch guard")
      // all-numeric schemas (k-means) carry the numeric sentinel values
      // instead of the GRAFT_UNKNOWN_CORPUS string (gen tool sval())
      assert(sql.contains("GRAFT_UNKNOWN_CORPUS") ||
          sql.contains("-314159265358979"),
        s"$name lacks the sentinel branch")
      // no live counterpart — these must NOT shadow a replay oracle
      assert(!Queries.liveOracles.contains(name),
        s"$name has a live oracle; it belongs in the precomputed set instead")
    }
  }
}
