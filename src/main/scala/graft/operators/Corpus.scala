package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level operators for training-data preparation: global token
  * statistics (vocabulary building) and context-window chunking. Both
  * are pure `org.apache.spark.sql.functions` compositions — fully
  * codegen'd, no UDFs — and keep their heavy stages scale-shaped:
  * token frequency is one explode + partial-aggregated groupBy with a
  * per-partition top-k (`TakeOrderedAndProject`, no global sort), and
  * chunking is a narrow per-row posexplode that never shuffles.
  */
object Corpus {

  /** Top-k most frequent whitespace tokens across the corpus with a
    * total (count desc, token asc) order, so the cut is deterministic
    * under ties. The plan is the canonical vocabulary-build shape: the
    * exploded tokens combine map-side, the groupBy shuffles only
    * (token, partial-count) pairs, and the limit is a per-partition
    * top-k merged on the driver — no global sort of the vocabulary.
    */
  def tokenFrequencies(df: DataFrame, textCol: String, k: Int): DataFrame =
    // token_tf kernel pairs: the rows entering the aggregation are
    // per-doc DISTINCT terms with their in-doc counts, not raw token
    // instances — the partial aggregate streams ~10x fewer rows on
    // natural text (r7)
    df.select(explode(graft.plans.GraftFunctions.token_tf(col(textCol))).as("kv"))
      .groupBy(col("kv.token").as("token"))
      .agg(sum(col("kv.tf")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Per-document out-of-vocabulary rate against a caller-supplied
    * vocabulary frame (one `token` column — typically
    * [[tokenFrequencies]]' top-k): the tokenizer-fit signal for sizing
    * a subword vocabulary or routing documents a fixed vocab can't
    * cover. Token instances outside the vocabulary, as a fraction of
    * the document's instances.
    *
    * Scale shape: the document side joins as per-doc DISTINCT (token,
    * tf) kernel pairs — the join and shuffle see vocabulary-shaped
    * rows, never the 10× larger token-instance stream — and the
    * vocabulary side broadcasts (it is top-k by construction). Docs
    * with zero tokens have no defined rate and are absent, mirroring
    * the CE queries' convention.
    */
  def oovRate(df: DataFrame, vocab: DataFrame, textCol: String,
              idCol: String): DataFrame = {
    require(vocab.columns.contains("token"), "vocab needs a `token` column")
    val pairs = df.select(col(idCol).cast("long").as("id"),
        explode(graft.plans.GraftFunctions.token_tf(col(textCol))).as("kv"))
      .select(col("id"), col("kv.token").as("token"), col("kv.tf").as("tf"))
    pairs.join(broadcast(vocab.select(col("token")).withColumn("__in_vocab", lit(1))),
        Seq("token"), "left")
      .groupBy("id")
      .agg(sum(col("tf")).cast("long").as("n_tok"),
           round(sum(when(col("__in_vocab").isNull, col("tf")).otherwise(lit(0)))
                   .cast("double") / sum(col("tf")).cast("double"), 6)
             .as("oov_rate"))
  }

  /** Document frequencies and inverse document frequency per token:
    * how many documents contain each token at least once, plus
    * idf = ln(nDocs / df) for TF-IDF-style weighting. Same scale shape
    * as `tokenFrequencies` (per-doc distinct explode, map-side-combined
    * groupBy on (token, count)).
    *
    * nDocs is computed INSIDE the plan from the same scan as the token
    * counts: every document emits one NULL sentinel alongside its
    * distinct tokens, so the aggregation's NULL group is exactly the
    * document count — no separate count() job (an extra full corpus
    * scan at 100 TB), no eager job at plan-construction time, and no
    * snapshot skew (the old eager count froze nDocs at call time, so a
    * source that changed before execution yielded idf inconsistent with
    * the df column). The two consumers of the aggregation (token rows,
    * sentinel row) share one shuffle via exchange reuse — `explain`
    * shows a single `Scan parquet` under `ReusedExchange`.
    *
    * Population semantics (spec-pinned): nDocs counts documents with
    * non-null text — null-text rows contribute no tokens, so counting
    * them would inflate idf; empty-but-non-null docs count (real
    * documents that happen to contain no token).
    */
  def documentFrequencies(df: DataFrame, textCol: String): DataFrame = {
    val grouped = df.where(col(textCol).isNotNull)
      .select(explode(concat(
        array(lit(null).cast("string")),
        array_distinct(TextFunctions.tokens(col(textCol))))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    // Both consumers filter through ONE predicate that references the
    // AGGREGATED df column: a pure group-key predicate would be pushed
    // below the aggregation (an AND's key conjunct gets split off and
    // pushed too), making the two subtrees non-identical and defeating
    // exchange reuse (two full corpus scans — verified via explain).
    // CASE WHEN <key test> THEN df ELSE -1 END > 0 is equivalent to the
    // key test (df is a count >= 1) but can't be split or folded
    // without value-range analysis, so it stays above the shared
    // Exchange.
    def keyGate(keyTest: Column): Column =
      when(keyTest, col("df")).otherwise(lit(-1L)) > 0
    val nDocs = grouped.where(keyGate(col("token").isNull))
      .select(col("df").cast("double").as("__ndocs"))
    grouped.where(keyGate(col("token").isNotNull))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", round(log(col("__ndocs") / col("df")), 6))
      .drop("__ndocs")
  }

  /** Per-document TF-IDF terms: (id, token, tf, df, tfidf) with
    * tf = in-document occurrences and tfidf = tf * ln(nDocs / df).
    * Both sides are token-keyed aggregations of the same scan; the join
    * is an equi-join on the token — at small vocabularies AQE
    * broadcasts the df side, at web-corpus vocabularies it degrades
    * gracefully to a hash join that shuffles only (token, counts)
    * pairs, never documents. Since round 6 the driver query hash-checks
    * the tfidf column too (like `documentFrequencies`' idf): the
    * oracle reproduces `round(tf * ln(nDocs/df), 6)` bit-for-bit, so
    * the transcendental column is exact cross-engine, not API-only.
    */
  /** Per-document (id, token, tf) from the `token_tf` kernel: the pairs
    * come pre-counted per document (the document IS the group, so no
    * corpus-wide `groupBy(id, token)` is ever needed) and the explode
    * volume is per-doc DISTINCT terms, not total token instances — at
    * 1B token instances that is the difference between a 1B-row hash
    * aggregate and a ~100M-row narrow explode (r7: unigram_ce at 20M
    * docs 583 → ~210 s).
    */
  private def termFrequencies(df: DataFrame, textCol: String,
                              idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(graft.plans.GraftFunctions.token_tf(col(textCol))).as("kv"))
      .select(col("id"), col("kv.token").as("token"), col("kv.tf").as("tf"))

  def tfidfTerms(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = termFrequencies(df, textCol, idCol)
    val dfs = documentFrequencies(df, textCol)
    tf.join(dfs, "token")
      .select(col("id"), col("token"), col("tf"), col("df"),
        round(col("tf") * col("idf"), 6).as("tfidf"))
  }

  /** Benchmark decontamination: per-document overlap of distinct word
    * n-grams against an evaluation set's n-gram vocabulary. The eval
    * set is tiny next to the corpus (benchmarks are KBs, corpora are
    * TBs), so its distinct shingles broadcast and the corpus side stays
    * a single scan + narrow explode — no shuffle touches corpus text.
    * Returns (id, n_shingles, n_contaminated, ratio); documents with
    * fewer than n tokens have no shingles and are omitted (nothing to
    * test for contamination).
    */
  def contamination(df: DataFrame, textCol: String, idCol: String,
                    evalDf: DataFrame, evalTextCol: String,
                    n: Int): DataFrame = {
    // materialize the token arrays in a child projection: shingling over
    // the attribute keeps the regex tokenizer at one evaluation per row
    // (see TextFunctions.wordShinglesOfTokens)
    val evalSh = evalDf
      .select(TextFunctions.tokens(col(evalTextCol)).as("__t"))
      .select(explode(TextFunctions.wordShinglesOfTokens(col("__t"), n)).as("sh"))
      .distinct()
      .select(col("sh"), col("sh").as("__hit"))
    df.select(col(idCol).cast("long").as("id"),
        TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        explode(TextFunctions.wordShinglesOfTokens(col("__t"), n)).as("sh"))
      .join(broadcast(evalSh), Seq("sh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
           count(col("__hit")).as("n_contaminated"))
      .withColumn("ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** Context-window chunking: split each document into windows of
    * `chunkSize` whitespace tokens advancing by `chunkSize - overlap`
    * tokens, re-joined with single spaces (token-normalized, like
    * `docFingerprint`). Every document with at least one token yields at
    * least one chunk (the whole document when shorter than a window);
    * token-less documents are omitted. The last window is allowed to be
    * short rather than re-reading earlier tokens, so chunk count =
    * max(1, ceil((n_tokens - overlap) / step)).
    * Output: (id, chunk_id, n_tok, chunk_text), one row per window —
    * a narrow per-row explode, embarrassingly parallel at any scale.
    */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap ($overlap) < chunkSize ($chunkSize)")
    val step = chunkSize - overlap
    val ts: Column = TextFunctions.tokens(col(textCol))
    val n = size(ts)
    val nChunks = greatest(lit(1L),
      floor((n - lit(overlap) + lit(step - 1)).cast("double") / step).cast("long"))
    df.where(n > 0)
      .select(col(idCol).cast("long").as("id"), ts.as("__ts"),
              explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col("id"), col("chunk_id"),
        least(lit(chunkSize).cast("long"),
          size(col("__ts")) - col("chunk_id") * step).as("n_tok"),
        concat_ws(" ",
          slice(col("__ts"), (col("chunk_id") * step + 1).cast("int"),
                lit(chunkSize))).as("chunk_text"))
  }

  /** Corpus-unigram cross-entropy per document (the CCNet-style
    * perplexity filtering signal, self-scored): ce = mean over the
    * document's tokens of -ln(count(token) / total_tokens) under the
    * corpus's own unigram distribution, ppl = exp(ce). Low-entropy docs
    * are templated/repetitive, high-entropy docs are rare-token noise;
    * curation keeps the middle band. Self-scoring means every token is
    * in-vocabulary — no smoothing parameter to pick. Documents with no
    * tokens (or NULL text) are omitted. Returns (id, n_tok, ce, ppl).
    *
    * Scale shape: same as `tfidfTerms` — per-(doc, token) counts and
    * global token counts are two aggregations of one scan joined on the
    * token (AQE broadcasts small vocabularies); the total-token count
    * aggregates the ALREADY-reduced vocabulary, not the corpus. The
    * STATIC plan prints the tf subtree once per reference; execution
    * collapses them via AQE stage reuse on the canonicalized exchange
    * (one corpus scan — spec-pinned in `PipelineSpec`). The
    * per-document sum of transcendental terms is order-independent by
    * construction: each term rounds to 9 decimals and sums in DECIMAL
    * (exact, associative), so hash-agg accumulation order — which
    * differs between engines and across partitionings — cannot move the
    * result (same convention as the revenue aggregates).
    */
  def unigramCrossEntropy(df: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    // token_tf kernel pairs, repartitioned ONCE on the token: both the
    // vocabulary-count branch and the join branch consume this exchange
    // (ReusedExchange/AQE stage reuse — spec-pinned), so the corpus is
    // scanned once, the join is co-located, and there is no corpus-wide
    // (id, token) aggregation anywhere. Without the explicit
    // repartition, AQE would broadcast the small counts side and each
    // branch would re-execute the scan subtree.
    val tf = termFrequencies(df, textCol, idCol).repartition(col("token"))
    val counts = tf.groupBy("token").agg(sum(col("tf")).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__n"))
    val term = round(col("tf") * -log(col("__c").cast("double") /
        col("__n").cast("double")), 9)
      .cast(org.apache.spark.sql.types.DecimalType(28, 9))
    tf.join(counts, "token")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum(col("tf")).as("n_tok"), sum(term).as("__s"))
      .select(col("id"), col("n_tok"),
        round(col("__s").cast("double") / col("n_tok"), 6).as("ce"))
      .withColumn("ppl", round(exp(col("ce")), 6))
  }

  /** Top-k most frequent tokens PER GROUP (e.g. per language/source) —
    * the group-wise vocabulary view. Shape: the exploded tokens
    * partial-aggregate on (group, token) BEFORE any ranking (map-side
    * combine collapses the heavy stream), and the rank window runs over
    * the aggregated counts — a few thousand rows per group, not the
    * token stream — partitioned by group, so it splits across groups
    * and no partition sees raw token volume. Total (n desc, token asc)
    * order makes the cut deterministic under ties.
    */
  def tokenFrequenciesByGroup(df: DataFrame, textCol: String,
                              groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df
      .select(col(groupCol).as("grp"),
        explode(graft.plans.GraftFunctions.token_tf(col(textCol))).as("kv"))
      .groupBy(col("grp"), col("kv.token").as("token"))
      .agg(sum(col("kv.tf")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("n").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("grp"), col("rank").cast("long").as("rank"),
        col("token"), col("n"))
  }

  /** Zipf-fit slope of the corpus frequency distribution over the
    * top-`k` tokens: ordinary-least-squares slope of
    * log(freq) ~ log(rank). Natural text sits near -1; a slope far from
    * it flags templated/synthetic corpora. Computed from explicit sums
    * (n, Σx, Σy, Σxy, Σx²) over k points so the arithmetic is the same
    * closed form in any engine.
    */
  def zipfFit(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val top = tokenFrequencies(df, textCol, k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token").asc)))
    // the window input is k rows (top-k already bounded) — the
    // single-partition rank is over a k-row relation, not the corpus
    val pts = top.select(log(col("rank").cast("double")).as("x"),
      log(col("n").cast("double")).as("y"))
    pts.agg(count(lit(1)).cast("double").as("cnt"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("cnt").cast("long").as("n_points"),
        round((col("cnt") * col("sxy") - col("sx") * col("sy")) /
          (col("cnt") * col("sxx") - col("sx") * col("sx")), 6)
          .as("zipf_slope"))
  }

  /** Interpolated BIGRAM cross-entropy per document — the depth-2
    * companion of [[unigramCrossEntropy]] (CCNet scores documents with
    * an n-gram LM; the interpolation `p = lam*p2(w|v) + (1-lam)*p1(w)`
    * is the classic Jelinek-Mercer smoothing that keeps unseen-context
    * events finite). Conditional contexts are derived from the bigram
    * counts themselves (`c(v,*) = sum_w c(v,w)`), so probabilities are
    * properly normalized per context; documents need >= 2 tokens to
    * emit events.
    *
    * Cross-engine determinism follows the unigram convention: each
    * event term rounds to 9 decimals and sums in DECIMAL (exact,
    * associative — aggregation order cannot move the result), and the
    * interpolation constants are embedded with their EXACT double
    * values on both sides (1.0 - 0.7 is not the literal 0.3).
    *
    * Scale shape: per-doc bigram TYPE counts (not raw events) ride the
    * joins; corpus bigram/context/unigram tables are map-side-combined
    * aggregations of the same exploded streams; the final per-doc
    * reduction is a hash aggregate on id. The (id, bigram) aggregation
    * keys ~n_tok rows per doc — heavier than the unigram path's
    * kernel-fused term pairs, priced in the bench entry.
    */
  def bigramCrossEntropy(df: DataFrame, textCol: String, idCol: String,
                         lam: Double = 0.7): DataFrame = {
    require(lam > 0.0 && lam < 1.0, s"lam must be in (0,1), got $lam")
    val base = Materialize.once(
        df.where(col(textCol).isNotNull)
          .select(col(idCol).cast("long").as("id"), col(textCol).as("__text")),
        "__ts", graft.plans.GraftFunctions.tokens_of(col("__text")))
      .where(size(col("__ts")) >= 2)
    // adjacent-pair stream: sequence is safe (size>=2 -> ascending) and
    // element_at is O(1) on the once-computed token array
    val bg = base.select(col("id"),
        explode(transform(sequence(lit(1), size(col("__ts")) - 1),
          i => concat(element_at(col("__ts"), i), lit(" "),
            element_at(col("__ts"), i + 1)))).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("btf"))
      .repartition(col("bg"))
    val bgCnt = bg.groupBy("bg").agg(sum(col("btf")).as("__cb"))
    val ctxCnt = bgCnt
      .groupBy(substring_index(col("bg"), " ", 1).as("__ctx"))
      .agg(sum(col("__cb")).as("__cv"))
    val uni = termFrequencies(df, textCol, idCol)
      .groupBy("token").agg(sum(col("tf")).as("__c"))
    val total = uni.agg(sum(col("__c")).as("__n"))
    val p = lit(lam) * (col("__cb").cast("double") / col("__cv").cast("double")) +
      lit(1.0 - lam) * (col("__c").cast("double") / col("__n").cast("double"))
    val term = round(col("btf") * -log(p), 9)
      .cast(org.apache.spark.sql.types.DecimalType(28, 9))
    bg.join(bgCnt, "bg")
      .join(ctxCnt, substring_index(col("bg"), " ", 1) === col("__ctx"))
      .join(uni, substring_index(col("bg"), " ", -1) === col("token"))
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum(col("btf")).as("n_big"), sum(term).as("__s"))
      .select(col("id"), col("n_big"),
        round(col("__s").cast("double") / col("n_big"), 6).as("ce2"))
      .withColumn("ppl2", round(exp(col("ce2")), 6))
  }

  /** CCNet-style perplexity filtering: keep the `keepFraction` of
    * documents with the LOWEST unigram cross-entropy (the most
    * in-distribution text). The quantile cut is EXACT and
    * deterministic — documents rank by (ce, id) through
    * [[Packing.globalRank]]'s distributed prefix-sum (never a
    * single-partition rank window, and never `approxQuantile`, whose
    * thresholds drift across engines and samplings) — so the kept set
    * is reproducible run-over-run and engine-over-engine, which is
    * what a corpus freeze requires. Returns (id, ce, rank) for the
    * kept documents.
    */
  def perplexityFilter(df: DataFrame, textCol: String, idCol: String,
                       keepFraction: Double = 0.5): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0,1], got $keepFraction")
    val ce = unigramCrossEntropy(df, textCol, idCol)
      .select(col("id"), col("ce"))
    val ranked = Packing.globalRank(ce, "ce", "id")
    val total = ranked.agg(count(lit(1)).as("__n"))
    // materialize the kept set, then release the rank cache the caller
    // has no handle to — otherwise every call would leak one
    // corpus-row-sized cache into a long-lived session
    val out = ranked.crossJoin(broadcast(total))
      .where(col("rank").cast("double") <
        lit(keepFraction) * col("__n").cast("double"))
      .select(col("id"), col("okey").as("ce"), col("rank"))
      .localCheckpoint(true)
    org.apache.spark.sql.GraftBridge.freeCheckpoint(ranked)
    out
  }

  /** Intra-corpus duplicate-span statistics: chunk each document into
    * disjoint `spanTokens`-token windows (`chunkByTokens` with overlap
    * 0, so the same normalization and trailing-window rules apply) and
    * count, per document, how many of its spans occur at least twice
    * corpus-wide — the C4/Dolma-style span-dedup signal: boilerplate
    * and templated text surface as cross-document span collisions even
    * when no two whole documents match. Within-document repeats count
    * too (intra-doc boilerplate is duplication; both occurrences are
    * flagged). Token-less documents are omitted, like `chunkByTokens`.
    * Returns (id, n_spans, n_dup_spans, dup_ratio).
    *
    * Scale shape: spans ride the shuffles as md5(span_text) — 32 opaque
    * hex chars instead of span text. Occurrence counts come from a
    * partial-aggregated groupBy (map-side combine collapses hot spans
    * BEFORE the shuffle) re-attached by an equi-join on the hash, NOT
    * from a `count over (partition by fp)` window: a window partition
    * cannot be split when one span is pathologically hot (boilerplate
    * repeated across millions of docs), while the join form gives AQE
    * a skew-splittable join and the aggregation a combiner. The span
    * volume is ~1/spanTokens of the exploded-token volume.
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     spanTokens: Int = 16): DataFrame = {
    val spans = chunkByTokens(df, textCol, idCol, spanTokens, 0)
      .select(col("id"), md5(col("chunk_text")).as("__fp"))
    val counts = spans.groupBy("__fp").agg(count(lit(1)).as("__cnt"))
    spans.join(counts, "__fp")
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("__cnt") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_ratio",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
  }

  /** Span-level duplicate REMOVAL (the C4 rule at span granularity):
    * chunk each document into disjoint `spanTokens`-token windows,
    * keep the globally-first occurrence of every span (ordered by
    * (id, chunk_id) — deterministic under any partitioning), drop the
    * rest, and reassemble each document from its surviving spans in
    * order. Documents reassemble token-normalized (single spaces, like
    * `chunkByTokens`); a document whose every span was seen earlier
    * comes back as an empty string — callers typically filter those.
    * Returns (id, n_spans, n_kept, clean_text).
    *
    * Scale shape: the first occurrence per span is `min(struct(id,
    * chunk_id))` from a partial-aggregated groupBy on md5(span) —
    * map-side combine collapses hot spans before the shuffle, and the
    * re-attach equi-join is AQE-skew-splittable, neither of which a
    * `row_number over (partition by fp)` window allows (a hot
    * boilerplate span would pin one unsplittable window partition).
    * Reassembly shuffles once on id; span order is restored by sorting
    * the (chunk_id, span) structs inside each document's collected
    * array — bounded by document size, never a global sort.
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                           spanTokens: Int = 16): DataFrame = {
    val spans = chunkByTokens(df, textCol, idCol, spanTokens, 0)
      .select(col("id"), col("chunk_id"), col("chunk_text"),
              md5(col("chunk_text")).as("__fp"))
    val firsts = spans.groupBy("__fp")
      .agg(min(struct(col("id"), col("chunk_id"))).as("__first"))
    spans.join(firsts, "__fp")
      .withColumn("__keep",
        struct(col("id"), col("chunk_id")) === col("__first"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
           concat_ws(" ", transform(
             array_sort(collect_list(when(col("__keep"),
               struct(col("chunk_id"), col("chunk_text"))))),
             s => s.getField("chunk_text"))).as("clean_text"))
  }

  /** Per-group corpus report card: document/token/character volumes by
    * the given metadata columns (e.g. source x language) — the standard
    * curation dashboard for weighting and mixing decisions. One scan,
    * one map-side-combined aggregation on the (small) group keys; NULL
    * group keys form their own group, exactly as SQL GROUP BY does.
    *
    * Token/char sums cover documents with non-null text (a NULL text
    * contributes no tokens); `n_docs` counts every row, `n_with_text`
    * the non-null ones. Averages are exact integer sums divided in
    * double precision (never an incremental mean — those are
    * association-order-dependent and break cross-engine equality),
    * over the non-null-text population, 0 when it is empty.
    */
  def corpusStats(df: DataFrame, textCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "corpusStats needs at least one group column")
    val nTok = size(TextFunctions.tokens(col(textCol)))
    val withText = count(col(textCol))
    def ratio(sum: Column): Column =
      when(withText === 0, 0.0)
        .otherwise(sum.cast("double") / withText.cast("double"))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
           withText.as("n_with_text"),
           coalesce(sum(nTok), lit(0L)).as("n_tokens"),
           coalesce(sum(length(col(textCol))), lit(0L)).as("n_chars"),
           round(ratio(coalesce(sum(nTok), lit(0L))), 6).as("avg_tokens"),
           round(ratio(coalesce(sum(length(col(textCol))), lit(0L))), 6)
             .as("avg_chars"))
  }

  /** Gopher-style composite document filter (Rae et al. 2021, table A1
    * — re-derived thresholds, not a reproduction): token count within
    * [minTok, maxTok], mean token length within [minMeanLen,
    * maxMeanLen], at least `minAlphaRatio` of tokens containing an
    * ASCII letter, and at least `minStopHits` stop-word occurrences.
    * Returns every signal plus the composite verdict — curation
    * pipelines log WHY a document fails, so the signals are first-class
    * output, not internals: (id, n_tok, mean_tok_len, alpha_ratio,
    * n_stop, pass).
    *
    * Documents with NULL text are omitted (no signals to compute);
    * empty docs yield zero signals and fail. Single scan, one fused
    * tokenize+score kernel pass per row (r7: `graft.plans.GopherStats`
    * codegen expression — the prior higher-order `aggregate` form was
    * interpreted per token), embarrassingly parallel. Agreement between
    * the verdict-only form ([[gopherPass]]) and the signal columns here
    * is spec-pinned.
    */
  /** Verdict from a `GopherStats` signal array `[n, len, alpha, stop]`.
    * The stats value is BOUND once via `Materialize.bind1`, so the four
    * references below are variable reads, not re-evaluations of the
    * kernel. Thresholds apply to the ROUNDED ratios, with token-less
    * docs scoring 0.0 — EXACTLY like the gopherFilter columns (and the
    * DuckDB oracle), so the two forms agree under every threshold
    * choice, including degenerate all-zero ones (a `when(n === 0,
    * false)` shortcut would diverge there). The when-guards also keep
    * 0/0 NaN out of the comparisons — Spark orders NaN larger than
    * every number, so NaN >= minAlphaRatio would PASS.
    */
  private def gopherVerdictOfStats(stats: Column,
                                   minTok: Int, maxTok: Int,
                                   minMeanLen: Double, maxMeanLen: Double,
                                   minAlphaRatio: Double, minStopHits: Int): Column =
    Materialize.bind1(stats) { a =>
      val n = a.getItem(0)
      val meanLen = when(n === 0, 0.0)
        .otherwise(round(a.getItem(1).cast("double") / n, 6))
      val alphaRatio = when(n === 0, 0.0)
        .otherwise(round(a.getItem(2).cast("double") / n, 6))
      n.between(minTok, maxTok) &&
        meanLen.between(minMeanLen, maxMeanLen) &&
        alphaRatio >= minAlphaRatio &&
        a.getItem(3) >= minStopHits
    }

  def gopherPassOfTokens(ts: Column,
                         minTok: Int = 50, maxTok: Int = 100000,
                         minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                         minAlphaRatio: Double = 0.8, minStopHits: Int = 2,
                         stopWords: Seq[String] =
                           TextFunctions.langMarkers.toMap.apply("en")): Column =
    gopherVerdictOfStats(
      graft.plans.GraftFunctions.gopher_stats(ts, stopWords),
      minTok, maxTok, minMeanLen, maxMeanLen, minAlphaRatio, minStopHits)

  /** The raw-text form of [[gopherPassOfTokens]]: tokenization happens
    * INSIDE the codegen'd `gopher_stats` kernel (one fused pass — no
    * intermediate token array is ever materialized).
    */
  def gopherPass(text: Column,
                 minTok: Int = 50, maxTok: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minAlphaRatio: Double = 0.8, minStopHits: Int = 2,
                 stopWords: Seq[String] =
                   TextFunctions.langMarkers.toMap.apply("en")): Column =
    gopherVerdictOfStats(
      graft.plans.GraftFunctions.gopher_stats(text, stopWords),
      minTok, maxTok, minMeanLen, maxMeanLen, minAlphaRatio, minStopHits)

  /** The filtering form of [[gopherFilter]]: returns the input rows
    * (ALL original columns) that pass the Gopher rules, for pipeline
    * composition — one scan, one tokenization per row (see
    * [[gopherPassOfTokens]]). NULL-text rows fail (no signals).
    */
  def gopherKeep(df: DataFrame, textCol: String,
                 minTok: Int = 50, maxTok: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minAlphaRatio: Double = 0.8, minStopHits: Int = 2,
                 stopWords: Seq[String] =
                   TextFunctions.langMarkers.toMap.apply("en")): DataFrame = {
    require(minTok >= 0 && minTok <= maxTok && minMeanLen <= maxMeanLen,
      s"inconsistent gopher thresholds: tok [$minTok,$maxTok] len [$minMeanLen,$maxMeanLen]")
    df.where(col(textCol).isNotNull &&
      gopherPass(col(textCol),
        minTok, maxTok, minMeanLen, maxMeanLen, minAlphaRatio,
        minStopHits, stopWords))
  }

  def gopherFilter(df: DataFrame, textCol: String, idCol: String,
                   minTok: Int = 50, maxTok: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   minAlphaRatio: Double = 0.8, minStopHits: Int = 2,
                   stopWords: Seq[String] =
                     TextFunctions.langMarkers.toMap.apply("en")): DataFrame = {
    require(minTok >= 0 && minTok <= maxTok && minMeanLen <= maxMeanLen,
      s"inconsistent gopher thresholds: tok [$minTok,$maxTok] len [$minMeanLen,$maxMeanLen]")
    // one kernel pass per row; Materialize.once pins single evaluation
    // (the signal projection below references the stats attribute four
    // times — as a plain alias, CollapseProject would inline the kernel
    // once per reference). n_stop counts occurrences, not distinct
    // hits: a doc saying "the the the" has 3.
    val st = col("__st")
    val n = st.getItem(0)
    Materialize.once(
        df.where(col(textCol).isNotNull)
          .select(col(idCol).cast("long").as("id"), col(textCol)),
        "__st", graft.plans.GraftFunctions.gopher_stats(col(textCol), stopWords))
      .select(col("id"), n.cast("long").as("n_tok"),
              when(n === 0, 0.0)
                .otherwise(round(st.getItem(1).cast("double") / n, 6))
                .as("mean_tok_len"),
              when(n === 0, 0.0)
                .otherwise(round(st.getItem(2).cast("double") / n, 6))
                .as("alpha_ratio"),
              st.getItem(3).cast("long").as("n_stop"))
      .withColumn("pass",
        col("n_tok").between(minTok, maxTok) &&
        col("mean_tok_len").between(minMeanLen, maxMeanLen) &&
        col("alpha_ratio") >= minAlphaRatio &&
        col("n_stop") >= minStopHits)
  }

  /** fastText-style linear quality classifier — INFERENCE ONLY: a
    * logistic score over the interpretable Gopher signals,
    * `sigmoid(b + w·f)` with features `(ln(1+n_tok), mean_tok_len,
    * alpha_ratio, stop_ratio)`. Weights come from the caller (trained
    * offline on labeled quality data); the defaults are a hand-tuned
    * prior that rewards prose-shaped text. This is the standard shape of
    * CCNet/fastText quality gates: training happens out-of-band, the
    * 100 TB pass is one embarrassingly-parallel scoring scan.
    *
    * Determinism: every feature is rounded to 6 decimals BEFORE the
    * dot product and the score to 6 after the sigmoid, so an oracle
    * replaying ln/exp in another engine agrees despite ulp differences
    * (the CE/tfidf convention). One `gopher_stats` kernel pass per row
    * via `Materialize.once` — the four feature references share a
    * single evaluation.
    */
  /** The round-6 quality-signal grid shared by INFERENCE
    * ([[qualityLogit]]) and TRAINING
    * ([[graft.operators.LogitTrain.features]]) — ONE spelling so the
    * two surfaces can never drift:
    * `[1, round6(ln(1+n)), min(round6(meanLen), 100), round6(alpha),
    * round6(stop)]` over a `gopher_stats` array column. `mean_tok_len`
    * is clamped at 100 (whitespace-free blobs — minified JS, base64 —
    * have meanLen = document length; unbounded it would blow the
    * training sums' long-overflow headroom and saturate any sane
    * weight anyway): with the clamp, a scale-9 gradient contribution
    * is ≤ 1e11 per row, so the exact-long accumulator holds ≥ 9e7
    * worst-case rows per partition-tree — and ~1e10 in practice, since
    * residuals shrink and real meanLen ≈ 5. The clamp is value-neutral
    * on every test corpus (max observed meanLen: 15).
    */
  def qualitySignalArray(st: Column): Column = {
    val n = st.getItem(0)
    def ratio(item: Int) =
      when(n === 0, 0.0).otherwise(round(st.getItem(item).cast("double") / n, 6))
    array(lit(1.0), round(log(lit(1.0) + n), 6),
      least(ratio(1), lit(100.0)), ratio(2), ratio(3))
  }

  def qualityLogit(df: DataFrame, textCol: String, idCol: String,
                   stopWords: Seq[String] = TextFunctions.englishStopwords,
                   bias: Double = -2.0, wLogTok: Double = 0.4,
                   wMeanLen: Double = 0.1, wAlphaRatio: Double = 1.5,
                   wStopRatio: Double = 2.0,
                   threshold: Double = 0.5): DataFrame = {
    val score = Materialize.bind1(qualitySignalArray(col("__ql"))) { x =>
      val z = lit(bias) + lit(wLogTok) * x.getItem(1) +
        lit(wMeanLen) * x.getItem(2) + lit(wAlphaRatio) * x.getItem(3) +
        lit(wStopRatio) * x.getItem(4)
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    }
    Materialize.once(
        df.where(col(textCol).isNotNull)
          .select(col(idCol).cast("long").as("id"), col(textCol)),
        "__ql", graft.plans.GraftFunctions.gopher_stats(col(textCol), stopWords))
      .select(col("id"), score.as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Corpus vocabulary size and token-instance count. Distinct-token
    * counting defaults to an HLL sketch (`approx_count_distinct`): one
    * pass, mergeable partials, no shuffle of the full vocabulary —
    * at 100 TB the exact distinct is a vocabulary-sized shuffle that
    * buys ~2% precision nobody needs for mixture planning. `exact =
    * true` opts in for oracle-grade runs. Rows stream through the
    * `token_tf` kernel (per-doc distinct terms + in-doc counts), so
    * the aggregate sees ~10x fewer rows than a raw token explode.
    */
  def vocabStats(df: DataFrame, textCol: String,
                 exact: Boolean = false): DataFrame =
    df.select(explode(graft.plans.GraftFunctions.token_tf(col(textCol))).as("kv"))
      .agg((if (exact) count_distinct(col("kv.token"))
            else approx_count_distinct(col("kv.token"))).as("n_vocab"),
        sum(col("kv.tf")).cast("long").as("n_instances"))

  /** Per-group quantiles of a numeric column. Defaults to
    * `approx_percentile` (a mergeable KLL-style sketch: one pass,
    * partial-combinable, bounded state per group) because EXACT
    * percentiles buffer every value of a group in one aggregation
    * buffer — at 100 TB that is an executor OOM, not a slow query.
    * `exact = true` opts into the exact buffer for oracle-grade runs
    * at small scale (Spark's `percentile` and DuckDB's `quantile_cont`
    * share the same linear-interpolation definition, index
    * p*(n-1) on the sorted values). Returns one row per (group, p).
    */
  def groupQuantiles(df: DataFrame, valCol: String, grpCol: String,
                     ps: Seq[Double], exact: Boolean = false,
                     accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    val parr = array(ps.map(lit): _*)
    val agg0 =
      if (exact) percentile(col(valCol), parr)
      else percentile_approx(col(valCol), parr, lit(accuracy))
    df.groupBy(col(grpCol).as("grp"))
      .agg(agg0.as("__gq"))
      .select(col("grp"), posexplode(col("__gq")).as(Seq("__i", "q")))
      .select(col("grp"),
        element_at(parr, col("__i") + 1).as("p"),
        round(col("q").cast("double"), 6).as("q"))
  }

  /** Fixed-width histogram of a numeric column: aligned bucket starts
    * via exact long arithmetic (`v - pmod(v, width)` — floor alignment
    * for every sign, no double division), one map-side-combined count
    * per bucket. The profiling companion to `groupQuantiles`: quantiles
    * answer "where is the mass", the histogram shows the shape.
    */
  def histogram(df: DataFrame, valCol: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.where(col(valCol).isNotNull)
      .select((col(valCol).cast("long") -
        pmod(col(valCol).cast("long"), lit(width))).as("bucket_start"))
      .groupBy("bucket_start")
      .agg(count(lit(1)).as("n"))
  }

  /** Per-column data profile — the schema health check run before any
    * pipeline stage trusts a new corpus drop: row count, null count,
    * distinct count, lexicographic min/max (values cast to string so
    * one report covers heterogeneous columns).
    *
    * Scale shape: ONE aggregation pass computes every measure for every
    * column (map-side combined), then a narrow inline-table explode
    * reshapes the single result row to (column, measures) — the table
    * is scanned once and nothing wide shuffles. Distinct counts default
    * to `approx_count_distinct` (HLL sketches: one pass, mergeable,
    * ~2% error) because EXACT multi-column distincts force Spark to
    * Expand the scan |cols| times — at 100 TB that is the difference
    * between one pass and eleven. `exact = true` opts into the Expand
    * for oracle-grade runs at small scale.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val measures = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__cp_rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__cp_nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__cp_dist_$c"),
        min(col(c).cast("string")).as(s"__cp_min_$c"),
        max(col(c).cast("string")).as(s"__cp_max_$c"))
    }
    val one = df.agg(measures.head, measures.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__cp_rows_$c").as("n_rows"),
        col(s"__cp_nulls_$c").as("n_nulls"),
        col(s"__cp_dist_$c").as("n_distinct"),
        col(s"__cp_min_$c").as("min_s"),
        col(s"__cp_max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Snapshot diff between two corpus releases: per-document status
    * (`added` / `removed` / `changed`) keyed on `idCol`, with the
    * content fingerprint from each side. `unchanged` rows are dropped
    * in-plan — at a realistic release cadence they are ~99% of the
    * corpus, and filtering them before the caller materializes
    * anything keeps the diff output proportional to the CHANGE volume,
    * not the corpus.
    *
    * Scale shape: one full-outer equi-join on the id — both sides
    * shuffle once on `idCol`, carrying only (id, fingerprint) pairs,
    * never document text (callers pass pre-fingerprinted frames, or
    * frames whose other columns Catalyst prunes away). For a pipeline
    * that diffs every release, write both snapshots bucketed by the id
    * (`graft.sources.Bucketed`) and even that shuffle disappears.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
                   fpCol: String): DataFrame = {
    // presence is tracked by explicit flags, NOT by fingerprint
    // nullability: a row whose fp is legitimately NULL (fingerprints
    // over nullable text) must not masquerade as absent — 'changed'
    // compares with the null-safe <=> so (null, 'abc') is changed and
    // (null, null) is unchanged, never 'added'
    val l = a.select(col(idCol).cast("long").as("id"), col(fpCol).as("fp_a"))
      .withColumn("__in_a", lit(true))
    val r = b.select(col(idCol).cast("long").as("id"), col(fpCol).as("fp_b"))
      .withColumn("__in_b", lit(true))
    l.join(r, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(!(col("fp_a") <=> col("fp_b")), lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .drop("__in_a", "__in_b")
  }
}
