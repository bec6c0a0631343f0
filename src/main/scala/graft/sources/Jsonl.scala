package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus ingest — the interchange format
  * most raw web corpora ship in (one JSON object per line; CommonCrawl
  * derivatives, chat logs, instruction datasets).
  *
  * Spark's native `json` source is distributed and splittable: each task
  * parses its own byte range of each file, so a 100 TB JSONL corpus
  * ingests with no single-parser bottleneck and no shuffle. Two contracts
  * matter at that scale and both are enforced here:
  *
  *  - '''Schema is caller-supplied, never inferred.''' Inference is a
  *    full extra pass over the data (Spark samples EVERY file), and a
  *    drifting inferred type (one file where every `score` happens to be
  *    integral) silently changes the schema of the whole read. At 100 TB
  *    the inference pass alone costs more than most queries.
  *  - '''Malformed lines must not kill the job.''' One truncated record
  *    at hour 3 of a 1000-executor ingest must quarantine, not fail the
  *    stage. [[readPermissive]] routes unparseable lines to a corrupt
  *    column for counting/quarantine; [[readStrict]] is the opt-in
  *    fail-fast for corpora with a delivery guarantee.
  *
  * Writing ([[write]]) is the inverse trip: Spark escapes newlines,
  * quotes, and non-BMP unicode inside JSON strings, so arbitrary
  * document text round-trips losslessly (oracle-pinned by the
  * `docs_jsonl_source` driver query; edge cases spec-pinned in
  * `JsonlSpec`).
  */
object Jsonl {

  /** Reserved column PERMISSIVE mode parks unparseable lines in. */
  val corruptCol = "_corrupt_record"

  /** The canonical documents-table schema (TESTDATA.md): callers ingest
    * real corpora with their own `StructType`; this one drives the
    * driver query and specs.
    */
  val documentsSchema: StructType = new StructType()
    .add("doc_id", "long").add("text", "string").add("lang", "string")
    .add("source", "string").add("n_chars", "long")

  /** Write one JSON object per line. Partition-parallel (one file per
    * task, no shuffle); text columns are JSON-escaped so embedded
    * newlines cannot split a record.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** PERMISSIVE read: rows that parse get their columns, rows that do
    * not arrive with every data column NULL and the raw line in
    * `_corrupt_record`. The corrupt column must be part of the declared
    * schema for Spark to populate it (SPARK-26243: it cannot be
    * selected from a bare schema), and a query must not project ONLY
    * the corrupt column — always read it alongside a data column, as
    * [[corruptStats]] does.
    */
  def readPermissive(spark: SparkSession, path: String,
                     schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains reserved column '$corruptCol'")
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** FAILFAST read: any malformed line fails the task (and job). For
    * corpora with a delivery guarantee, where a parse error means the
    * pipeline upstream is broken and silent row loss would be worse
    * than a rerun.
    */
  def readStrict(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** (parsed, corrupt) row counts in one pass — the ingest health
    * check. A single map-side-combined aggregate; no shuffle of data
    * rows.
    *
    * Spark refuses a JSON scan whose ONLY referenced column is the
    * internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    * such a scan could skip real parsing and report nothing corrupt).
    * The documented workaround is `.cache()` — wrong at corpus scale.
    * Instead the aggregate references one data column alongside the
    * corrupt column, which keeps the scan's required schema honest at
    * the cost of materializing that single column.
    */
  def corruptStats(permissiveDf: DataFrame): (Long, Long) = {
    val dataCol = permissiveDf.schema.fieldNames.find(_ != corruptCol)
      .getOrElse(throw new IllegalArgumentException(
        "permissive dataframe has no data columns"))
    val r = permissiveDf.agg(
      count(when(col(corruptCol).isNull, 1)).as("ok"),
      count(col(corruptCol)).as("bad"),
      count(col(dataCol)).as("touched")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The parsed rows only, corrupt column dropped — what downstream
    * operators consume after [[corruptStats]] clears the batch. The
    * corrupt-only-scan restriction above applies here too: downstream
    * must read at least one data column (every real consumer does;
    * a bare `parsed(df).count()` does not — use [[corruptStats]] for
    * counting).
    */
  def parsed(permissiveDf: DataFrame): DataFrame =
    permissiveDf.where(col(corruptCol).isNull).drop(corruptCol)
}
