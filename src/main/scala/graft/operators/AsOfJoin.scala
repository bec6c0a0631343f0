package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the LATEST right row with
  * the same key and `right.ts <= left.ts` — the attribution/enrichment
  * join (each purchase gets its most recent preceding click; each trade
  * gets the prevailing quote) that stock Spark has no operator for.
  *
  * Spelled as a UNION + running `last(ignoreNulls)` window rather than
  * an inequality join: a range θ-join materializes every (left, right)
  * pair within the time bound before picking the max (quadratic in the
  * per-key event rate), while the union form is one shuffle on the key,
  * one in-partition sort, and a single linear pass — the same
  * merge-scan an ASOF-native engine runs. Right rows sort BEFORE left
  * rows at equal timestamps, so the match is inclusive (`<=`).
  *
  * Determinism contract: several right rows on the SAME (key, ts) are
  * ordered by their full column struct, and the match takes the
  * greatest — with an id-led right schema that means "max id wins",
  * replayable in any engine. NULL keys form their own partition (null
  * left rows match null right rows), mirroring window semantics, and
  * NULL timestamps sort first, i.e. a null-ts left row matches only
  * null-ts right rows.
  *
  * Scale shape: the window partitions by key — splittable across the
  * key space, hot ONLY if a single key carries an unsplittable share of
  * events; for that regime pre-bucket the time axis and run this
  * per (key, bucket) with a carry-in, same as any merge-scan engine
  * shards its streams.
  */
object AsOfJoin {

  /** Left columns plus an `asof` struct of the matched right row
    * (NULL when no right row precedes). `keyCol`/`tsCol` must exist on
    * both sides with compatible types.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lTagged = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rType).as("__r"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"),
      lit(null).cast(lType).as("__l"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionAll(lTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col("__match").as("asof"))
  }

  /** Interval (range) join: every (left, right) pair sharing `keyCol`
    * with `right.ts` in `[left.ts + lo, left.ts + hi]`, both bounds
    * inclusive — the attribution-candidate / within-window correlation
    * join (all purchases within an hour of each click; all sensor
    * readings within Δ of each fault).
    *
    * The naive spelling — equi-join on the key with the range as a
    * θ-predicate — makes Spark materialize EVERY same-key pair before
    * filtering: per-key quadratic, and a hot key (one appliance id, one
    * anonymous user) pins an executor at 100 TB. This operator instead
    * buckets the time axis at width `hi - lo`: a right row lands in
    * bucket floor(ts / W); a left row's window spans AT MOST TWO
    * adjacent buckets, so the left side explodes into ≤ 2 (key, bucket)
    * probes and the join becomes a plain equi-join on (key, bucket) —
    * per-task pair work is bounded by window occupancy, not key
    * cardinality, and AQE can split residual skew because the join is
    * equi-shaped. The exact range predicate filters the bucket
    * candidates afterward. (Same trick as Databricks' binned range-join
    * optimization; spelled here with public operators only.)
    *
    * The bucket key is the aligned bucket START, `ts - pmod(ts, W)` —
    * pure long arithmetic (pmod is the non-negative remainder, so this
    * is exact floor alignment for every sign of ts). No division at
    * all: Spark's `/` on longs is DOUBLE division, which silently loses
    * exactness past 2^53, within range of epoch-nanos values.
    *
    * Contract: inner-join semantics (NULL keys and NULL timestamps drop,
    * as in any SQL equi-join); `tsCol` must be an integral type on both
    * sides (normalize timestamps to epoch nanos first, cf.
    * `Queries.eventsNs`); `hi >= lo`, window may be a single instant
    * (`lo == hi`). Output: left columns prefixed `l_`, right columns
    * prefixed `r_`.
    *
    * `mode` picks the physical strategy — both produce IDENTICAL rows
    * (spec-pinned), only the plan differs:
    *  - `"bucket"`: the aligned-bucket equi-join above — wins whenever
    *    any key is dense (the regime the operator exists for);
    *  - `"naive"`: plain equi-join on the key with the range as a
    *    θ-filter — at UNIFORM low density (~100 events/key measured,
    *    see Bench's head-to-head) the per-key cross product is smaller
    *    than the explode + wider-key shuffle, so naive is ~1.3x faster
    *    there; but its work grows QUADRATICALLY with per-key density
    *    and a single hot key pins one executor (AQE cannot split a
    *    θ-join);
    *  - `"auto"` (default): runs one bounded planning aggregate over
    *    EACH side — per-key counts reduce map-side, the exchange
    *    carries one row per distinct key, the answer is one MAX — and
    *    picks naive iff the BUSIEST key across both sides holds <=
    *    `autoNaiveMaxPerKey` rows (max, not mean: skew is exactly what
    *    kills naive, and a mean would hide the one hot key; both
    *    sides, because a hot left key against a sparse right is just
    *    as quadratic as the reverse). The estimate costs one narrow
    *    pass per side over (key); callers re-joining in a tight loop
    *    should measure once and pin the mode explicitly.
    */
  def joinRange(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, lo: Long, hi: Long,
                mode: String = "auto"): DataFrame = {
    require(hi >= lo, s"empty window: lo=$lo > hi=$hi")
    require(Set("auto", "bucket", "naive").contains(mode),
      s"mode must be auto|bucket|naive, got '$mode'")
    val chosen =
      if (mode == "auto") autoRangeMode(left, right, keyCol, tsCol) else mode
    if (chosen == "naive") joinRangeNaive(left, right, keyCol, tsCol, lo, hi)
    else joinRangeBucketed(left, right, keyCol, tsCol, lo, hi)
  }

  /** Naive-vs-bucketed crossover: measured head-to-head in Bench at
    * uniform 100 events/key (naive 0.22 s vs bucketed 0.30 s) and at
    * 2,000 events/key dense (bucketed ~0.78 s vs naive ~0.95 s and
    * diverging quadratically); 256 sits past the measured crossover
    * with margin on the side that degrades gracefully (a wrongly-
    * chosen bucketed join costs a constant factor; a wrongly-chosen
    * naive join costs a quadratic blowup).
    */
  val autoNaiveMaxPerKey = 256L

  /** The `mode="auto"` decision, exposed for tests and for callers who
    * want to estimate once and pin the mode across repeated joins.
    * Takes the busiest key over BOTH sides: the naive θ-join's per-key
    * work is |left rows| x |right rows| for that key, so a hot LEFT key
    * against a sparse right is just as quadratic as the reverse — a
    * right-only estimate would steer exactly that shape onto the naive
    * plan. Two bounded planning aggregates (map-side-reduced per-key
    * counts, one row per distinct key on the exchange, answer is one
    * MAX each).
    */
  def autoRangeMode(left: DataFrame, right: DataFrame, keyCol: String,
                    tsCol: String): String = {
    val busiest = math.max(maxRowsPerKey(left, keyCol, tsCol),
      maxRowsPerKey(right, keyCol, tsCol))
    if (busiest <= autoNaiveMaxPerKey) "naive" else "bucket"
  }

  /** Rows held by the busiest non-null (key, ts)-valid key of `df` —
    * the planning statistic `mode="auto"` compares against
    * [[autoNaiveMaxPerKey]].
    */
  def maxRowsPerKey(df: DataFrame, keyCol: String, tsCol: String): Long = {
    val row = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__rj_n"))
      .agg(max("__rj_n")).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** The θ-spelling (see `mode="naive"` above): same rows, same output
    * schema, one equi-join on the key with the range as a filter.
    *
    * The range predicate is spelled as a DIFFERENCE (`r_ts - l_ts`
    * between lo and hi) rather than `r_ts >= l_ts + lo`: for same-sign
    * timestamps (every epoch-based domain) the difference cannot
    * overflow Long, whereas the addition wraps silently under non-ANSI
    * sessions when `l_ts` sits within `hi` of Long.MaxValue. Mixed-sign
    * inputs beyond +-2^62 remain the caller's documented domain
    * assumption (under the default ANSI mode any genuine overflow
    * throws loudly rather than wrapping).
    */
  private def joinRangeNaive(left: DataFrame, right: DataFrame,
                             keyCol: String, tsCol: String,
                             lo: Long, hi: Long): DataFrame = {
    val lPref = left.columns.map(c => col(c).as(s"l_$c"))
    val rPref = right.columns.map(c => col(c).as(s"r_$c"))
    val l = left.select(lPref.toIndexedSeq: _*)
    val r = right.select(rPref.toIndexedSeq: _*)
    val diff = col(s"r_$tsCol") - col(s"l_$tsCol")
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
      diff >= lit(lo) && diff <= lit(hi))
  }

  private def joinRangeBucketed(left: DataFrame, right: DataFrame,
                                keyCol: String, tsCol: String,
                                lo: Long, hi: Long): DataFrame = {
    // subtractExact: a window wider than Long.MaxValue must fail loudly,
    // not silently wrap into wrong bucket widths
    val w = math.max(math.subtractExact(hi, lo), 1L)
    // aligned bucket start: exact long floor alignment, no division
    def bucketOf(c: Column): Column = c - pmod(c, lit(w))
    val lPref = left.columns.map(c => col(c).as(s"l_$c"))
    val rPref = right.columns.map(c => col(c).as(s"r_$c"))
    // left probes the bucket of each window endpoint; array_distinct
    // collapses the degenerate same-bucket case so no pair duplicates
    val lExpl = left.select(lPref.toIndexedSeq: _*)
      .withColumn("__rj_b", explode(array_distinct(array(
        bucketOf(col(s"l_$tsCol") + lit(lo)),
        bucketOf(col(s"l_$tsCol") + lit(hi))))))
    val rBuck = right.select(rPref.toIndexedSeq: _*)
      .withColumn("__rj_b", bucketOf(col(s"r_$tsCol")))
    // difference-form range check, as in joinRangeNaive (same-sign ts
    // cannot overflow; the bucket-probe additions above stay covered by
    // the documented ts-domain assumption + ANSI's loud overflow)
    val diff = col(s"r_$tsCol") - col(s"l_$tsCol")
    lExpl.join(rBuck,
        lExpl("__rj_b") === rBuck("__rj_b") &&
        col(s"l_$keyCol") === col(s"r_$keyCol") &&
        diff >= lit(lo) && diff <= lit(hi))
      .drop("__rj_b")
  }
}
