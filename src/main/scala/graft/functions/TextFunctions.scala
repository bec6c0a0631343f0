package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines. Everything here is built from `org.apache.spark.sql
  * .functions` higher-order/regexp expressions — no UDFs — so the whole
  * pipeline stays inside whole-stage codegen and pushes down through
  * Catalyst untouched.
  */
object TextFunctions {

  /** Whitespace tokens of lower-cased text (empty string -> empty
    * array). One codegen'd kernel pass (`graft.plans.TokensOf`) — the
    * Column form `filter(split(lower(trim(text)), "\\s+"), length > 0)`
    * leaves the `filter` interpreted per element; the kernel's parity
    * with it is differential-tested in `ExpressionsSpec` and pinned by
    * every tokenizing oracle.
    */
  def tokens(text: Column): Column =
    graft.plans.GraftFunctions.tokens_of(text)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * other non-space characters each count as one token — a cheap,
    * deterministic stand-in for subword tokenizers.
    */
  def tokenCountBpeish(text: Column): Column =
    graft.plans.GraftFunctions.regex_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  /** Character n-gram shingles (distinct), 1-based sliding window over
    * code points — one codegen'd kernel pass
    * (`graft.plans.CharShinglesOf`; parity with the Column-land
    * `array_distinct(transform(sequence, substr))` form spec-pinned).
    */
  def charShingles(text: Column, n: Int): Column =
    graft.plans.GraftFunctions.char_shingles(text, n)

  /** Word n-gram shingles (distinct) over whitespace tokens — one
    * codegen'd kernel pass (`graft.plans.WordShinglesOf`). Accepts a
    * pre-tokenized attribute via [[wordShinglesOfTokens]] or raw text
    * via [[wordShingles]] (which tokenizes INSIDE the kernel — the old
    * O(tokens²) re-tokenize-per-shingle trap of the interpreted
    * transform form is gone by construction).
    */
  def wordShinglesOfTokens(ts: Column, n: Int): Column =
    graft.plans.GraftFunctions.word_shingles(ts, n)

  def wordShingles(text: Column, n: Int): Column =
    graft.plans.GraftFunctions.word_shingles(text, n)

  /** Punctuation character count / ratio over total characters. */
  def punctCount(text: Column): Column =
    graft.plans.GraftFunctions.regex_count(text, "[.,!?;:'\"()\\[\\]{}-]")
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text))

  /** Digit / alpha character ratios. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(graft.plans.GraftFunctions.regex_count(text, "[0-9]").cast("double") / length(text))
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(graft.plans.GraftFunctions.regex_count(text, "[A-Za-z]").cast("double") / length(text))

  /** Mean token length (0 for empty docs) — reuses the `GopherStats`
    * kernel ([n, len, alpha, stop] with an empty stop set), bound once.
    */
  def meanTokenLen(text: Column): Column =
    graft.operators.Materialize.bind1(
      graft.plans.GraftFunctions.gopher_stats(text, Nil)) { s =>
      when(s.getItem(0) === 0, 0.0)
        .otherwise(s.getItem(1).cast("double") / s.getItem(0))
    }

  /** Membership test as a set probe. `array_contains` over a literal
    * array is a linear scan — O(|words|) string comparisons per token,
    * fine at 8 marker words but quadratic pain at real stopword lists
    * (hundreds of entries). `isInCollection` becomes Catalyst `In`,
    * which the optimizer rewrites to `InSet` — a real driver-built
    * HashSet probed once per token, O(1) regardless of list size —
    * when the list exceeds `spark.sql.optimizer.inSetConversionThreshold`
    * (default 10). NOTE: a literal `map(...)` + `element_at` is NOT a
    * hash lookup in Spark — `CreateMap`/`GetMapValue` build
    * `ArrayBasedMapData` and do a LINEAR key scan per probe (measured
    * 2.4x slower than this form on lang_id even at 37 keys).
    */
  private[graft] def memberOf(words: Seq[String]): Column => Column =
    t => t.isInCollection(words.distinct.sorted)

  /** Share of tokens found in `words` (e.g. a stopword list) — the
    * `GopherStats` kernel's stop-hit count over its token count.
    */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    if (words.isEmpty) lit(0.0)
    else graft.operators.Materialize.bind1(
      graft.plans.GraftFunctions.gopher_stats(text, words)) { s =>
      when(s.getItem(0) === 0, 0.0)
        .otherwise(s.getItem(3).cast("double") / s.getItem(0))
    }
  }

  /** Count of tokens found in `words` (occurrences, not distinct). */
  def wordSetCount(text: Column, words: Seq[String]): Column =
    if (words.isEmpty) lit(0)
    else graft.plans.GraftFunctions.gopher_stats(text, words)
      .getItem(3).cast("int")

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic and mirrored 1:1 in the DuckDB oracle.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "los", "que", "de", "la", "es", "por", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai", "you", "he"))

  /** Predicted language: argmax of marker-word hits, ties broken by
    * alphabetical language code.
    *
    * One codegen'd kernel call (`graft.plans.LangIdOf` →
    * `TextKernels.langIdText`): tokenize + marker scoring + argmax fused
    * in a single JVM pass. The Column-only predecessor — a higher-order
    * `aggregate` over `tokens(text)` — was interpreted per token
    * (HigherOrderFunction is CodegenFallback); the kernel's semantics
    * are pinned to it by an `ExpressionsSpec` differential test on
    * adversarial inputs and by the DuckDB oracle cross-engine.
    */
  def langId(text: Column): Column =
    graft.plans.GraftFunctions.lang_id_of(text, langMarkers)

  /** `langId` over an already-tokenized column — the composable
    * array-input form, and the Column-land REFERENCE SEMANTICS the
    * `LangIdOf` kernel is differential-tested against (single `aggregate`
    * pass; argmax in the finish lambda where the score struct is a bound
    * variable, not a re-inlined expression).
    */
  def langIdOfTokens(ts: Column): Column = {
    // Per-language membership stays the |words|=8 sequential `In`
    // compare — at 8 entries a linear probe beats any hash-construct
    // overhead, and a bitmask via a literal-map lookup was measured
    // 2.4x SLOWER (GetMapValue linear-scans ArrayBasedMapData; see
    // memberOf). memberOf upgrades to InSet automatically if a marker
    // list ever grows past the 10-entry threshold.
    val zero = struct(langMarkers.map { case (lang, _) =>
      lit(0).as(s"s_$lang") }: _*)
    val step = (acc: Column, t: Column) => struct(langMarkers.map {
      case (lang, words) =>
        (acc.getField(s"s_$lang") +
          when(memberOf(words)(t), 1).otherwise(0))
          .as(s"s_$lang")
    }: _*)
    // struct ordering compares fields in order: (score, tie) — langMarkers
    // is alphabetical, so a DESCENDING tie value makes the
    // alphabetically-first language win equal scores.
    val finish = (acc: Column) => greatest(
      langMarkers.zipWithIndex.map { case ((lang, _), idx) =>
        struct(acc.getField(s"s_$lang").as("score"),
               lit(langMarkers.length - idx).as("tie"),
               lit(lang).as("lang"))
      }: _*).getField("lang")
    aggregate(ts, zero, step, finish)
  }

  /** A real-scale English stopword list (~200 entries) for Gopher-style
    * curation rules — the standard frequent-function-word inventory
    * (articles, pronouns, prepositions, auxiliaries, common adverbs).
    * Apostrophe forms are deliberately absent: `tokens` splits on
    * whitespace only, and keeping the list plain keeps the DuckDB oracle
    * literal trivially quotable. Marker words from `langMarkers("en")`
    * are all members, so thresholds tuned on the 8-marker default only
    * get easier to meet under this list.
    */
  val englishStopwords: Seq[String] = Seq(
    "a", "about", "above", "across", "after", "again", "against", "all",
    "almost", "alone", "along", "already", "also", "although", "always",
    "am", "among", "an", "and", "another", "any", "anyone", "anything",
    "anywhere", "are", "around", "as", "at", "back", "be", "became",
    "because", "become", "becomes", "been", "before", "behind", "being",
    "below", "between", "both", "but", "by", "came", "can", "cannot",
    "come", "could", "did", "do", "does", "done", "down", "during",
    "each", "either", "enough", "even", "ever", "every", "everyone",
    "everything", "everywhere", "few", "find", "first", "for", "four",
    "from", "full", "further", "get", "give", "go", "had", "has", "have",
    "he", "her", "here", "hers", "herself", "him", "himself", "his",
    "how", "however", "i", "if", "in", "indeed", "instead", "into", "is",
    "it", "its", "itself", "just", "keep", "last", "least", "less",
    "like", "likely", "made", "make", "many", "may", "me", "might",
    "mine", "more", "most", "mostly", "much", "must", "my", "myself",
    "neither", "never", "nevertheless", "next", "no", "nobody", "none",
    "nor", "not", "nothing", "now", "nowhere", "of", "off", "often",
    "on", "once", "one", "only", "onto", "or", "other", "others", "our",
    "ours", "ourselves", "out", "over", "own", "per", "perhaps",
    "rather", "same", "seem", "seemed", "seeming", "seems", "several",
    "she", "should", "since", "so", "some", "somehow", "someone",
    "something", "sometime", "sometimes", "somewhere", "still", "such",
    "take", "than", "that", "the", "their", "theirs", "them",
    "themselves", "then", "there", "therefore", "these", "they", "this",
    "those", "though", "three", "through", "throughout", "thus", "to",
    "together", "too", "toward", "towards", "two", "under", "until",
    "up", "upon", "us", "very", "was", "we", "well", "were", "what",
    "whatever", "when", "whenever", "where", "whereas", "wherever",
    "whether", "which", "while", "who", "whoever", "whole", "whom",
    "whose", "why", "will", "with", "within", "without", "would", "yet",
    "you", "your", "yours", "yourself", "yourselves")

  /** Marker-hit score for one language (exposed for oracle parity). */
  def langScore(text: Column, lang: String): Column =
    wordSetCount(text, langMarkers.toMap.apply(lang))

  /** Composite quality score in [0,1]: rewards mid-length docs, low
    * punctuation/digit noise, and presence of common words.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthTerm = least(nTok / 20.0, lit(1.0))
    val punctTerm = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val digitTerm = greatest(lit(0.0), lit(1.0) - digitRatio(text) * 5.0)
    val stopTerm = least(wordSetRatio(text, langMarkers.flatMap(_._2).distinct) * 4.0, lit(1.0))
    round((lengthTerm * 0.4 + punctTerm * 0.2 + digitTerm * 0.2 + stopTerm * 0.2), 6)
  }

  /** Intra-document repetition: the fraction of word n-grams that are
    * repeats of an earlier n-gram in the same document
    * (`1 - distinct/total`; 0 for docs shorter than n tokens). The
    * duplicate-n-gram fraction is the standard boilerplate/looping-text
    * quality signal in large-corpus curation (Gopher/C4-style rules);
    * n=1 gives the repeated-token fraction.
    */
  def repetitionRatio(text: Column, n: Int): Column =
    repetitionRatioOfTokens(tokens(text), n)

  /** `repetitionRatio` over an already-tokenized column. Prefer this with
    * a MATERIALIZED token-array attribute when computing several ratios
    * per row (see the performance note on `wordShinglesOfTokens`): the
    * text-based form inlines the regex tokenizer into both the shingle
    * lambda and the denominator, once per ratio.
    */
  def repetitionRatioOfTokens(ts: Column, n: Int): Column = {
    val total = (size(ts) - (n - 1)).cast("double")
    when(total <= 0, 0.0).otherwise(
      round(lit(1.0) - size(wordShinglesOfTokens(ts, n)).cast("double") / total, 6))
  }

  /** Email-address-shaped substring count — the redaction/quality signal
    * a curation pipeline keys PII rules off.
    */
  def emailCount(text: Column): Column =
    graft.plans.GraftFunctions.regex_count(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")

  /** URL-shaped substring count. */
  def urlCount(text: Column): Column =
    graft.plans.GraftFunctions.regex_count(text, "https?://[^\\s]+")

  /** Long (>= 7 digits) digit-run count — phone/account-number-shaped
    * content.
    */
  def longDigitRunCount(text: Column): Column =
    graft.plans.GraftFunctions.regex_count(text, "[0-9]{7,}")

  /** PII-shaped span REDACTION (the release-time counterpart of the
    * counting signals above): emails, URLs, then long digit runs are
    * replaced by typed placeholder tokens, in that fixed order — URLs
    * are redacted after emails so an address inside a URL is claimed by
    * the email pass, and digit runs go last so runs inside either are
    * already gone. Three codegen `regexp_replace` passes (same
    * RE2-compatible patterns as the counters, so the DuckDB replay
    * matches byte-for-byte); narrow per-row work, no shuffle.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val noUrl = regexp_replace(noEmail, "https?://[^\\s]+", "<URL>")
    regexp_replace(noUrl, "[0-9]{7,}", "<NUM>")
  }

  /** Deterministic document fingerprint: md5 of the token-normalized
    * text (cross-engine checkable, unlike xxhash64).
    */
  def docFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Unicode NFC canonical composition (codegen kernel; zero-copy on
    * already-normalized rows). Normalize BEFORE hashing/dedup/shingling
    * so visually identical strings are byte-identical.
    */
  def nfcNormalize(text: Column): Column =
    graft.plans.GraftFunctions.nfc_normalize(text)

  /** Per-script character counts (Unicode Script property, counted by
    * the `regex_count` kernel — one compiled-pattern pass per script).
    * The multilingual routing signal: script mix catches mislabeled and
    * mixed-script documents that word-marker language ID misses. Java
    * spells the class `\p{IsHan}`, RE2 `\p{Han}` — same property, so
    * the DuckDB oracle counts the identical characters.
    */
  def scriptCount(text: Column, script: String): Column =
    graft.plans.GraftFunctions.regex_count(text, s"\\p{Is$script}")

  /** Whitespace/control cleanup: every run of whitespace and C0 control
    * characters collapses to one space, leading/trailing runs drop.
    * The character class is written as `[\s\x00-\x1F]` so the Java
    * (Spark) and RE2 (DuckDB) engines agree exactly: Java `\s` alone
    * includes VT (0x0B) where RE2's does not, but the union with the
    * explicit C0 range is identical in both.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(text, "[\\s\\x00-\\x1F]+", " "))

  /** Strip HTML/XML markup from web-scraped text: tags (incl. script/
    * style BLOCKS, whose inner text is code, not prose) drop to a
    * space, the six ubiquitous character entities decode, whitespace
    * collapses. Deliberately regex-light — a full HTML5 parser is not
    * expressible as a column and belongs upstream; this is the
    * extraction-already-happened cleanup pass every web corpus still
    * needs. Entity decode runs AFTER tag removal, so `&lt;b&gt;` stays
    * literal text (it was escaped in the source, i.e. not markup) —
    * same contract as the usual boilerplate-removal tools. The class
    * patterns are shared Java/RE2 syntax, so any engine replays them.
    */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // `&amp;` decodes LAST: `&amp;lt;` must yield the literal text
    // `&lt;` (it was escaped in the source), never `<`
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    cleanText(decoded)
  }
}
