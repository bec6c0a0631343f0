package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL ingest contracts the driver-gate corpus (all-wellformed by
  * construction) cannot exercise: corrupt-line quarantine, fail-fast,
  * and hostile-content round trips.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_jsonl_$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def writeLines(dir: String, lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, "part-00000.jsonl")
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  test("permissive read quarantines malformed lines, parses the rest") {
    val dir = tmpDir("corrupt")
    writeLines(dir, Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
      """{"doc_id": 2, "text": "truncated""",                    // unterminated string
      """{"doc_id": 3, "text": "ok", "lang": "de", "source": "web", "n_chars": 2}""",
      """not json at all"""))
    val df = Jsonl.readPermissive(spark, dir, Jsonl.documentsSchema)
    val (ok, bad) = Jsonl.corruptStats(df)
    assert(ok === 2)
    assert(bad === 2)
    // parsed() drops the quarantined rows and the bookkeeping column
    val good = Jsonl.parsed(df)
    assert(!good.columns.contains(Jsonl.corruptCol))
    assert(good.select("doc_id").as[Long].collect().sorted === Seq(1L, 3L))
    // quarantined rows keep their raw line for forensics (reading a
    // data column alongside — a corrupt-only projection is refused by
    // Spark, see Jsonl.corruptStats scaladoc)
    val raw = df.where(col(Jsonl.corruptCol).isNotNull)
      .select(col("doc_id"), col(Jsonl.corruptCol))
      .collect().map(_.getString(1))
    assert(raw.exists(_.contains("not json at all")))
  }

  test("strict read fails the job on a malformed line") {
    val dir = tmpDir("strict")
    writeLines(dir, Seq(
      """{"doc_id": 1, "text": "fine", "lang": "en", "source": "web", "n_chars": 4}""",
      """{"broken"""))
    val thrown = intercept[org.apache.spark.SparkException] {
      Jsonl.readStrict(spark, dir, Jsonl.documentsSchema).count()
    }
    assert(thrown.getMessage != null)
  }

  test("readPermissive rejects a schema that claims the corrupt column") {
    val bad = Jsonl.documentsSchema.add(Jsonl.corruptCol, "string")
    val e = intercept[IllegalArgumentException] {
      Jsonl.readPermissive(spark, "/nonexistent", bad)
    }
    assert(e.getMessage.contains(Jsonl.corruptCol))
  }

  test("hostile text round-trips losslessly (newlines, quotes, unicode)") {
    val texts = Seq(
      "line one\nline two\r\nline three",    // embedded newlines
      "tab\there \"quoted\" back\\slash",    // quotes + backslash
      "emoji 😀 CJK 漢字 combining é", // non-BMP + combining
      "",                                     // empty string
      "{\"looks\": \"like json\"}")           // JSON-in-JSON
    val in = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("roundtrip")
    Jsonl.write(in, dir)
    val back = Jsonl.readStrict(spark, dir, Jsonl.documentsSchema)
    val got = back.orderBy("doc_id").select("text").as[String].collect()
    assert(got.toSeq === texts)
    // null text survives as JSON null -> null (write drops null fields;
    // the declared schema restores the column as NULL)
    val withNull = Seq((9L, null: String, "xx", "spec", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir2 = tmpDir("nulltrip")
    Jsonl.write(withNull, dir2)
    val back2 = Jsonl.readStrict(spark, dir2, Jsonl.documentsSchema)
    assert(back2.where(col("text").isNull).count() === 1)
  }
}
