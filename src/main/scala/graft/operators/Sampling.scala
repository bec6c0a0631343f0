package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for training-data pipelines.
  *
  * `df.sample()` draws from per-partition RNG streams: the selected set
  * changes with partitioning, executor count, and retries — at pipeline
  * scale that silently changes datasets between runs. Hash sampling
  * decides per ROW from a content key: reproducible across runs,
  * engines, cluster sizes and retries, stable as the corpus grows
  * (a document's fate never depends on its neighbors), and joins
  * against any earlier/later run of the same pipeline.
  *
  * Mechanics: the first 8 hex chars of md5(salt || key) are compared
  * lexicographically against a threshold — hex digits are ASCII-ordered,
  * so this is a uniform draw over 2^32 buckets with no integer parsing,
  * and the same predicate is expressible in any engine with md5().
  */
object Sampling {

  // null keys get one deterministic bucket — silently dropping them
  // (null predicate) in sample but funnelling them all into the last
  // split would corrupt train/test separation. The sentinel is a NUL
  // char, which no numeric id stringifies to, so null-keyed rows are not
  // conflated with a legitimate empty-string key.
  private def bucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), coalesce(key.cast("string"), lit("\u0000")))), 1, 8)

  private def hexThreshold(p: Double): String =
    f"${math.round(p.max(0.0).min(1.0) * 4294967296.0).min(4294967295L)}%08x"

  /** Keep ~`rate` of rows, decided by md5(salt || key). */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double,
                   salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    // rate 1.0 is the identity — the threshold is capped at 0xffffffff
    // and the comparison is strict, so filtering would lose the ~1-in-4B
    // rows hashing to the top bucket
    if (rate >= 1.0) df
    else df.where(bucket(col(keyCol), salt) < lit(hexThreshold(rate)))
  }

  // rate >= 1.0 must keep EVERY row: the hex threshold caps at "ffffffff"
  // and the comparison is strict, which would lose rows hashing to the
  // top bucket — "g" sorts after every hex digit, so `bucket < "g"` is
  // identically true.
  private def hexThresholdOrAll(rate: Double): String =
    if (rate >= 1.0) "g" else hexThreshold(rate)

  /** Stratified hash sampling: keep ~`rates(stratum)` of each stratum's
    * rows (e.g. language- or domain-balanced corpus downsampling),
    * decided per row from md5(salt || key) exactly like `sampleByHash` —
    * deterministic across runs, engines, partitionings and retries, and
    * a row's fate never changes when other strata grow. Strata absent
    * from `rates` keep `defaultRate`; rows with a NULL stratum also fall
    * to `defaultRate` (mirroring the null-handling notes on `bucket` /
    * `sampleByHash`) — with the default `defaultRate = 0.0` they are
    * dropped. The stratum column participates only in threshold
    * selection — one scan, no shuffle, no per-stratum passes.
    *
    * The per-row threshold is ONE map-literal lookup, so the stratum
    * expression is referenced exactly once: when the stratum is a
    * computed alias (e.g. a language-ID over the text), Catalyst's alias
    * substitution inlines it per reference, and the previous
    * one-`when`-per-stratum predicate re-evaluated it once per stratum
    * (measured ~9x slower on a 2-strata language split).
    */
  def sampleByHashStratified(df: DataFrame, keyCol: String, strataCol: String,
                             rates: Map[String, Double],
                             defaultRate: Double = 0.0,
                             salt: String = ""): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1]: $rates default=$defaultRate")
    val default = lit(hexThresholdOrAll(defaultRate))
    // no strata -> everything samples at defaultRate (a zero-entry map()
    // literal would be untyped)
    val thr =
      if (rates.isEmpty) default
      else {
        val thresholds = map(rates.toSeq.sortBy(_._1).flatMap {
          case (stratum, rate) => Seq(lit(stratum), lit(hexThresholdOrAll(rate)))
        }: _*)
        // try_element_at on a missing or NULL key yields NULL -> default
        // rate. (Plain element_at only guarantees null-on-missing-key
        // since Spark 3.4 / SPARK-40066 — under earlier ANSI modes it
        // threw; the try_ form pins the contract version-proof.)
        coalesce(try_element_at(thresholds, col(strataCol)), default)
      }
    df.where(bucket(col(keyCol), salt) < thr)
  }

  /** Columnar form of `hexThresholdOrAll` for rates computed IN the
    * plan: same 2^32-bucket draw (HALF_UP round, 0xffffffff cap), same
    * rate>=1 keep-all sentinel ("g" sorts after every hex digit).
    */
  private def thresholdCol(rate: Column): Column =
    when(rate >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex(
        least(round(rate * 4294967296.0, 0), lit(4294967295.0)).cast("long"))),
        8, "0"))

  /** Resample the corpus to a TARGET stratum mixture (domain/language
    * reweighting): keep the LARGEST subcorpus whose strata follow
    * `targetShares` proportions, deciding each row by the same
    * content-keyed md5 draw as `sampleByHash`. The achievable total is
    * bound by the scarcest stratum relative to its target share —
    * N = min_s(count_s / share_s) — so that stratum keeps everything
    * (rate 1) and every other stratum downsamples to share_s * N rows
    * in expectation. Shares need not sum to 1: N scales inversely with
    * any common factor and the per-stratum rates are invariant under it.
    *
    * Everything happens IN one plan — stratum counts aggregate to a few
    * rows, the binding constant is a one-row aggregate of that, and the
    * per-stratum rates broadcast-join back onto the corpus — so there is
    * no eager count job at call time and no snapshot skew between the
    * counts and the filtered scan (AQE sees both sides of the same
    * query). At scale the corpus is scanned twice (once to count, once
    * to filter); callers holding the input cached pay one scan.
    *
    * Rows whose stratum is absent from `targetShares` (including NULL
    * strata) are dropped — the mixture defines the population. A target
    * stratum with NO rows in the corpus is ignored (best effort): exact
    * mixture would force N = 0 and an empty result. Returns the input
    * columns plus the stratum's `rate`.
    */
  def sampleToMixture(df: DataFrame, keyCol: String, strataCol: String,
                      targetShares: Map[String, Double],
                      salt: String = ""): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must be non-empty")
    require(targetShares.values.forall(_ > 0.0),
      s"target shares must be positive: $targetShares")
    val shareMap = map(targetShares.toSeq.sortBy(_._1).flatMap {
      case (stratum, w) => Seq(lit(stratum), lit(w))
    }: _*)
    // internal names prefixed so they cannot collide with caller
    // columns; only the documented `rate` output survives
    val cnts = df.where(col(strataCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(col(strataCol).as("__mix_stratum"))
      .agg(count(lit(1)).cast("double").as("__mix_cnt"))
      .withColumn("__mix_share", element_at(shareMap, col("__mix_stratum")))
    val binding = cnts
      .agg(min(col("__mix_cnt") / col("__mix_share")).as("__mix_n"))
    val rates = cnts.crossJoin(broadcast(binding))
      .select(col("__mix_stratum"),
        ((col("__mix_share") * col("__mix_n")) / col("__mix_cnt")).as("rate"))
    df.join(broadcast(rates), col(strataCol) === col("__mix_stratum"))
      .where(bucket(col(keyCol), salt) < thresholdCol(col("rate")))
      .drop("__mix_stratum")
  }

  /** Deterministic FIXED-SIZE sample per stratum: exactly
    * `min(n, |stratum|)` rows of each stratum, selected by the same
    * content-keyed md5 order as `sampleByHash` (the n smallest
    * `(bucket, id)` pairs per stratum) — balanced eval-set construction,
    * where rate-based sampling cannot promise per-stratum counts.
    *
    * Scale shape: the declarative spelling — `row_number() over
    * (partition by stratum order by bucket)` — shuffles the whole table
    * and pins each stratum in ONE task (structural skew AQE cannot
    * split: 5 language strata over 100 TB = 5 tasks). Here selection is
    * a bounded-state AGGREGATE (`graft.plans.TopNSmallestByKey`): every
    * map task reduces its slice to ≤ n ids per stratum before anything
    * shuffles, the exchange carries `strata x n` pairs per task, and
    * the winners broadcast back as a semi-join — the full table is
    * scanned twice but never shuffled.
    *
    * `idCol` must be integral and unique (it is the tiebreak and the
    * semi-join key); a NULL stratum forms its own stratum (null-safe
    * join), mirroring `bucket`'s null sentinel; NULL ids are ignored by
    * the aggregate and therefore never selected.
    */
  def sampleFixedPerStratum(df: DataFrame, idCol: String, strataCol: String,
                            n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val sel = df.groupBy(col(strataCol).as("__fs_stratum"))
      .agg(graft.plans.TopNFunctions.topn_smallest(
        bucket(col(idCol), salt), col(idCol).cast("long"), n).as("__fs_sel"))
      .select(col("__fs_stratum"),
        explode(col("__fs_sel.id")).as("__fs_id"))
    df.join(broadcast(sel),
      col(strataCol) <=> col("__fs_stratum") &&
        col(idCol).cast("long") === col("__fs_id"),
      "left_semi")
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis exponential race): each row draws
    * `r = -ln(u) / w` with `u` uniform from md5(salt || key), and the k
    * smallest r win — inclusion probability proportional to weight,
    * exactly the A-ES reservoir result, but with u content-keyed so the
    * selection is reproducible across runs, engines, partitionings and
    * retries (a true random reservoir is none of these).
    *
    * u is built from the first 13 md5 hex digits — a 52-bit uniform
    * integer, exact in a double — shifted by +0.5 so u ∈ (0,1) strictly
    * (ln(0) can never fire). The draw is rounded to 9 decimals IN the
    * sort key (same cross-engine convention as the CE/tfidf oracles) so
    * an oracle replaying ln/division in another engine ranks identical
    * values; ties break on the key column. Rows with NULL or
    * non-positive weight are dropped (zero weight = never sampled, and
    * the race value would be infinite).
    *
    * Scale shape: `orderBy(draw).limit(k)` plans as
    * TakeOrderedAndProject — per-partition bounded top-k then a driver
    * merge of `partitions x k` rows; the table is never globally
    * sorted and never shuffled.
    */
  def sampleByWeight(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // fused md5-prefix kernel: same bits as
    // conv(substring(md5(..),1,13),16,10)::long (spec-pinned), no
    // per-row hex-string/conv allocations
    val u = (graft.plans.GraftFunctions.md5_prefix_long(concat(lit(salt),
        coalesce(col(keyCol).cast("string"), lit("\u0000"))), 13)
        .cast("double") + 0.5) /
      lit(4503599627370496.0) // 2^52
    df.where(col(weightCol).isNotNull && col(weightCol) > 0.0)
      .withColumn("draw", round(-log(u) / col(weightCol), 9))
      .orderBy(col("draw").asc, col(keyCol).asc)
      .limit(k)
  }

  /** Assign every row to a named split with the given weights (need not
    * sum to 1 — they are normalized). Returns the input plus a `split`
    * column; the same (key, salt, weights) always yields the same
    * assignment.
    */
  def splitByHash(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val b = bucket(col(keyCol), salt)
    // last split takes everything below threshold 1.0 (covers rounding)
    val assigned = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cum), rest) =>
      when(b < lit(hexThreshold(cum)), lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }
}
