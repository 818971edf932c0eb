package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def nfc1(s: String): String = {
    val out = Seq(Option(s)).toDF("t").select(TextOps.nfc(col("t"))).collect().head
    if (out.isNullAt(0)) null else out.getString(0)
  }

  test("NFC composes, NFKC additionally folds compatibility forms") {
    // e + combining acute (U+0301) composes to U+00E9
    assert(nfc1("café") == "café")
    // ANGSTROM SIGN -> LATIN CAPITAL A WITH RING ABOVE
    assert(nfc1("Å") == "Å")
    // canonical reordering + compose: a + ogonek + acute -> U+0105 U+0301
    assert(nfc1("ą́") == "ą́")
    // NFC leaves the fi ligature (U+FB01); NFKC folds it to "fi"
    val fi = Seq("ﬁn").toDF("t")
      .select(TextOps.nfc(col("t")).as("c"), TextOps.nfkc(col("t")).as("k"))
      .as[(String, String)].collect().head
    assert(fi._1 == "ﬁn" && fi._2 == "fin")
  }

  test("ASCII fast path returns the input unchanged; null stays null") {
    val df = Seq("plain ascii stays", "").toDF("t")
    assert(df.select(TextOps.nfc(col("t")) === col("t")).as[Boolean].collect().forall(identity))
    assert(nfc1(null) == null)
  }

  test("the expression stays inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextOps.normalizeText(docs).queryExecution.executedPlan
    // the "*(n)" star prefix is the WholeStageCodegen marker: the Project
    // carrying unicode_nfc must sit inside a codegen stage, not fall back
    assert(plan.toString.startsWith("*("), plan.toString.take(400))
    // and codegen agrees with java.text.Normalizer on non-trivial input
    val s = "mixed café and Å text"
    assert(nfc1(s) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  test("normalizeText: cleanup chain strips controls, canonicalizes newlines, audits") {
    val df = Seq((1L, "ab\r\nc\rd\te\u0007f")).toDF("doc_id", "text")
    val r = TextOps.normalizeText(df).collect().head
    assert(r.getAs[String]("text") == "ab\nc\nd\tef")
    assert(r.getAs[Int]("n_chars_in") == 11 && r.getAs[Int]("n_chars_out") == 9)
    assert(r.getAs[Boolean]("changed"))
    val clean = TextOps.normalizeText(Seq((2L, "already clean")).toDF("doc_id", "text"))
      .collect().head
    assert(!clean.getAs[Boolean]("changed"))
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.UnicodeExpressions.unicode_normalize(col("t"), "NFX")
    }
  }
}
