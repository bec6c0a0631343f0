package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Sequence packing for LLM training: lay the corpus out as one long
  * token stream (documents concatenated in id order) cut into
  * fixed-budget training sequences, and report for every document the
  * global token offset it starts at and which sequences it lands in
  * (`seq_first..seq_last`). This is the standard concat-then-chunk
  * layout (a document may straddle a sequence boundary); downstream a
  * trainer reads sequence `s` as tokens `[s*budget, (s+1)*budget)`.
  *
  * The only global ingredient is a PREFIX SUM of token counts in id
  * order. The naive Spark spelling — `sum(n_tok) over (order by id)`
  * with no partition key — moves the whole corpus through ONE task and
  * is the canonical 100 TB scale-killer. Instead this runs the textbook
  * distributed scan:
  *
  *   1. range-partition the slim `(doc_id, n_tok)` projection by id and
  *      sort within partitions (contiguous id ranges per partition);
  *   2. one small aggregation computes each PARTITION's token total —
  *      the driver sees #partitions rows, never documents — and a
  *      `scanLeft` turns them into per-partition start offsets;
  *   3. a narrow `mapPartitionsWithIndex` streams each partition once,
  *      adding its broadcast start offset to a running local sum.
  *
  * The result is independent of the partition count and of where the
  * range boundaries fall (any contiguous split of the same id order
  * yields the same offsets — spec-pinned by a partitioning-invariance
  * test), and both heavy passes are narrow over a 16-byte-per-doc
  * projection, never the text.
  *
  * Cache contract: the slim projection is persisted so that pass 2 and
  * the per-partition totals read the SAME snapshot (a source that
  * changed between passes would silently corrupt offsets, and a
  * recomputed range shuffle could re-draw its boundary sample, making
  * the broadcast partition offsets lie about the new partitioning). The
  * result is returned as an EAGER LOCAL CHECKPOINT — lineage truncated,
  * so no code path can ever recompute it against mismatched offsets
  * (the same reasoning as the resolver's checkpointed labels; a merely
  * persisted result would go silently wrong if released and re-executed).
  * Release its blocks with `GraftBridge.freeCheckpoint` when done in a
  * long-lived session; `.unpersist()` on it is a harmless no-op.
  *
  * Semantics notes: documents with NULL text or zero tokens occupy no
  * space in the stream and are dropped (mirroring
  * `Corpus.chunkByTokens`'s `n_tok > 0` population); tokenization is
  * the engine-wide `tokens_of` kernel (lower + whitespace runs).
  */
object Packing {

  /** Pack documents into `budget`-token training sequences.
    *
    * Returns `(doc_id, n_tok, tok_offset, seq_first, seq_last)` where
    * `tok_offset` is the document's start position in the concatenated
    * id-ordered token stream and `seq_first/seq_last` the first/last
    * sequence index it occupies (`floor(tok_offset / budget)` and
    * `floor((tok_offset + n_tok - 1) / budget)`).
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession

    val slim = df.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        size(graft.plans.GraftFunctions.tokens_of(col(textCol)))
          .cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition token totals — #partitions rows on the
    // driver, bounded by the shuffle-partition setting, never data-sized
    val totals = slim.groupBy(spark_partition_id().as("pid"))
      .agg(sum("n_tok").as("toks"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = slim.rdd.getNumPartitions
    val starts = (0 until nParts)
      .scanLeft(0L)((acc, pid) => acc + totals.getOrElse(pid, 0L))
    val bStarts = spark.sparkContext.broadcast(starts.toArray)

    // pass 2: narrow streaming scan adds the partition's start offset to
    // a running local prefix — no shuffle, one pass over the cached slim
    // projection
    val packedRdd = slim.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var off = bStarts.value(pid)
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val o = off
        off += n
        Row(id, n, o)
      }
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tok", LongType, nullable = false),
      StructField("tok_offset", LongType, nullable = false)))
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, which
    // silently loses exactness past 2^53 — a 100 TB token stream's
    // offsets live within ~400x of that, so the sequence ids must come
    // from integral division
    val packed = spark.createDataFrame(packedRdd, schema)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        expr(s"tok_offset div $budget").as("seq_first"),
        expr(s"(tok_offset + n_tok - 1) div $budget").as("seq_last"))
      .localCheckpoint(true) // eager: materialized AND lineage-truncated
    slim.unpersist(blocking = false)
    packed
  }

  /** Dense global rank of every row under a total order — the engine
    * for DETERMINISTIC CORPUS SHUFFLING: order by a content-keyed hash
    * (`md5(salt || id)`, the `Sampling.bucket` draw) and the corpus is
    * "randomly" shuffled the same way on every run, engine, partition
    * count, and retry, which is what a reproducible training-data
    * freeze needs (`df.orderBy(rand())` re-rolls per run and
    * `zipWithIndex` depends on partitioning). Same distributed shape as
    * [[packSequences]]: range partition + in-partition sort, one small
    * per-partition COUNT aggregate, broadcast start offsets, narrow
    * streaming scan — never a single-partition `row_number() over
    * (order by ...)` window.
    *
    * `orderCol` ties are broken by `idCol` (the composite is the real
    * sort key); without a unique tiebreaker, ranks among equal keys
    * would depend on where the range boundaries fell. The order column
    * keeps its NATIVE type (a numeric key ranks numerically — casting
    * to string would rank "10" before "2"); NULL keys sort first, as in
    * `orderBy`. Returns (id, okey, rank) with rank 0-based and dense.
    * Cache contract as [[packSequences]]: eager local checkpoint —
    * recompute-proof; release with `GraftBridge.freeCheckpoint`.
    */
  def globalRank(df: DataFrame, orderCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val keyType = df.schema(orderCol).dataType
    val slim = df
      .select(col(idCol).cast("long").as("id"), col(orderCol).as("okey"))
      .repartitionByRange(col("okey"), col("id"))
      .sortWithinPartitions("okey", "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = slim.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = slim.rdd.getNumPartitions
    val starts = (0 until nParts)
      .scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
    val bStarts = spark.sparkContext.broadcast(starts.toArray)
    val rankedRdd = slim.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var r = bStarts.value(pid)
      rows.map { row =>
        val out = Row(row.getLong(0), row.get(1), r)
        r += 1
        out
      }
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("okey", keyType, nullable = true),
      StructField("rank", LongType, nullable = false)))
    val ranked = spark.createDataFrame(rankedRdd, schema)
      .localCheckpoint(true) // eager: materialized AND lineage-truncated
    slim.unpersist(blocking = false)
    ranked
  }

  /** TOKEN-BUDGET SELECTION: keep the best-scoring documents whose
    * cumulative token count fits a training budget — the data-selection
    * step of "train on the top-quality N-token subset" recipes. The
    * selected set is the PREFIX of the (score desc, id asc) order whose
    * running token total stays <= `budget`: a pure prefix (the first
    * overflowing document ends the selection) is deterministic,
    * engine-replayable, and independent of partitioning — unlike
    * greedy skip-and-continue filling, whose result depends on
    * sequential state that no declarative engine can replay.
    *
    * Same distributed prefix-sum shape as [[packSequences]] (range
    * partition on the order key + in-partition sort, one #partitions-row
    * totals aggregate, broadcast starts, narrow streaming pass) — never
    * a single-task `sum() over (order by score)` window. Two
    * scale-extras fall out of the broadcast offsets: partitions whose
    * START offset already exceeds the budget are skipped without
    * reading a row, and the boundary partition stops streaming at the
    * first overflow — at 100 TB with a 1% budget, ~99% of the slim
    * projection is never touched after the totals pass.
    *
    * Rows with NULL text or zero tokens occupy no budget and are
    * dropped (the [[packSequences]] population). Returns
    * `(doc_id, score, n_tok, cum_tok)` with `cum_tok` the inclusive
    * running total (max(cum_tok) <= budget). Result is an eager local
    * checkpoint — same cache contract as [[packSequences]].
    */
  def selectByTokenBudget(df: DataFrame, textCol: String, idCol: String,
                          scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val slim = df.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        col(scoreCol).cast("double").as("score"),
        size(graft.plans.GraftFunctions.tokens_of(col(textCol)))
          .cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
      .repartitionByRange(col("score").desc, col("doc_id"))
      .sortWithinPartitions(col("score").desc, col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = slim.groupBy(spark_partition_id().as("pid"))
      .agg(sum("n_tok").as("toks"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = slim.rdd.getNumPartitions
    val starts = (0 until nParts)
      .scanLeft(0L)((acc, pid) => acc + totals.getOrElse(pid, 0L))
    val bStarts = spark.sparkContext.broadcast(starts.toArray)
    val selectedRdd = slim.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val start = bStarts.value(pid)
      if (start >= budget) Iterator.empty // whole partition past the cut
      else new Iterator[Row] {
        private var off = start
        private var done = false
        private var nextRow: Row = null
        // n_tok > 0 makes the running total strictly monotone, so the
        // FIRST overflow ends the prefix — no later row can fit
        private def advance(): Unit =
          while (nextRow == null && !done && rows.hasNext) {
            val r = rows.next()
            val n = r.getLong(2)
            if (off + n <= budget) {
              off += n
              nextRow = Row(r.getLong(0), r.getDouble(1), n, off)
            } else done = true
          }
        override def hasNext: Boolean = { advance(); nextRow != null }
        override def next(): Row = {
          advance(); val out = nextRow; nextRow = null; out
        }
      }
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("score", org.apache.spark.sql.types.DoubleType, nullable = false),
      StructField("n_tok", LongType, nullable = false),
      StructField("cum_tok", LongType, nullable = false)))
    val selected = spark.createDataFrame(selectedRdd, schema)
      .localCheckpoint(true)
    slim.unpersist(blocking = false)
    selected
  }

  /** Per-sequence fill summary over a packing: how many documents touch
    * each training sequence and how many of its `budget` token slots the
    * id-ordered stream fills. Every sequence except the last is exactly
    * full by construction — this is the invariant a trainer relies on,
    * and the query form makes it oracle-checkable. The explode is
    * bounded: a document emits one row per sequence it touches, i.e.
    * ceil(n_tok / budget) + 1 rows at most, so the exploded size is
    * O(total_tokens / budget + n_docs), not O(n_docs * n_seqs).
    */
  def sequenceFill(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    packed
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        // tokens this doc contributes to this sequence: overlap of
        // [tok_offset, tok_offset + n_tok) with [seq*budget, (seq+1)*budget)
        sum(least(col("tok_offset") + col("n_tok"),
              (col("seq_id") + 1) * budget)
          - greatest(col("tok_offset"), col("seq_id") * budget))
          .as("n_tokens"))
  }
}
