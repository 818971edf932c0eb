package graft

import graft.sources.JsonlDocs
import org.apache.spark.sql.functions._

class JsonlDocsSpec extends SparkSuite {
  import spark.implicits._

  private def lines(ls: String*) = ls.toDF("line")

  test("valid lines parse; defaults fill; schema matches the documents table") {
    val r = JsonlDocs.fromLines(lines(
      """{"id": 7, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"text": "no id or metadata"}"""))
    val rows = r.good.orderBy("doc_id").collect()
    assert(r.good.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(rows.length == 2)
    val withId = rows.find(_.getLong(0) == 7L).get
    assert(withId.getString(1) == "hello world" && withId.getString(2) == "en")
    val defaulted = rows.find(_.getLong(0) != 7L).get
    assert(defaulted.getString(2) == "unk" && defaulted.getString(3) == "unk")
    assert(defaulted.getLong(4) == "no id or metadata".length.toLong)
    assert(r.bad.count() == 0)
  }

  test("malformed JSON and empty text quarantine as data, not exceptions") {
    val r = JsonlDocs.fromLines(lines(
      """{"text": "ok"}""",
      """{broken json""",
      """{"text": ""}""",
      """{"id": 1, "lang": "en"}""")) // no text at all
    assert(r.good.count() == 1)
    assert(r.bad.count() == 3)
    // the raw malformed line survives for inspection
    assert(r.bad.as[String].collect().exists(_.contains("broken json")))
  }

  test("content-derived ids: re-ingest of the same batch is idempotent") {
    val batch = lines("""{"text": "same doc"}""", """{"text": "same doc"}""",
      """{"text": "other doc"}""")
    val a = JsonlDocs.fromLines(batch).good.select("doc_id", "text").collect().toSet
    val b = JsonlDocs.fromLines(batch).good.select("doc_id", "text").collect().toSet
    assert(a == b && a.size == 3) // duplicates get distinct ids, stably
  }

  test("fallback ids are stable when explicit-id and varied-metadata rows mix") {
    // r4 advisor regression: explicit-id rows must not occupy fallback
    // ranks, and same-text rows with different lang/source must order
    // deterministically (not by partition luck)
    val batch = lines(
      """{"id": 42, "text": "same doc", "lang": "en", "source": "web"}""",
      """{"text": "same doc", "lang": "de", "source": "web"}""",
      """{"text": "same doc", "lang": "en", "source": "book"}""",
      """{"text": "same doc"}""")
    val runs = (1 to 4).map { _ =>
      JsonlDocs.fromLines(batch).good
        .select("doc_id", "lang", "source").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    }
    assert(runs.distinct.size == 1, "doc_id assignment varied run-to-run")
    assert(runs.head.size == 4)
    assert(runs.head.exists(_._1 == 42L))
    // and the id-less subset alone gets the SAME ids (explicit-id rows
    // never shift fallback ranks)
    val without = JsonlDocs.fromLines(lines(
      """{"text": "same doc", "lang": "de", "source": "web"}""",
      """{"text": "same doc", "lang": "en", "source": "book"}""",
      """{"text": "same doc"}""")).good
      .select("doc_id").as[Long].collect().toSet
    assert(without == runs.head.collect { case (id, _, _) if id != 42L => id })
  }

  test("round-trips into the text operators") {
    val r = JsonlDocs.fromLines(lines(
      """{"text": "the quick brown fox"}""",
      """{"text": "der hund und die katze"}"""))
    val q = graft.operators.TextOps.qualityScore(r.good)
    assert(q.count() == 2)
    assert(q.filter(col("quality") <= 0 || col("quality") > 1).count() == 0)
  }
}
