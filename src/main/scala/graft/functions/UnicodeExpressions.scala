package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — Spark has no
  * built-in normalizer (SPARK-based pipelines usually reach for a Scala
  * UDF here, which breaks whole-stage codegen and serializes every row
  * through a lambda). Normalization (UAX #15) is the first cleanup stage
  * of any multilingual corpus: visually-identical strings with different
  * codepoint sequences (é vs e+U+0301) must hash/dedup/tokenize the same.
  *
  * Two fast paths keep the 100 TB scan honest: an ASCII byte scan (ASCII
  * is closed under every normalization form — zero-copy return), and
  * `Normalizer.isNormalized` (quick-check table walk, no allocation) for
  * already-normalized non-ASCII, so the expensive decompose/compose only
  * runs on rows that actually need it — in a typical crawl corpus a small
  * minority.
  */
object UnicodeExpressions {

  def normalizeData(u: UTF8String, form: Normalizer.Form): UTF8String = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return u
    val s = u.toString
    if (Normalizer.isNormalized(s, form)) u
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  /** `form` is the UAX #15 name: NFC, NFD, NFKC, NFKD. */
  case class UnicodeNormalize(child: Expression, formName: String) extends UnaryExpression {
    require(Set("NFC", "NFD", "NFKC", "NFKD")(formName),
      s"unknown normalization form '$formName' (want NFC/NFD/NFKC/NFKD)")
    override def dataType: DataType = StringType
    override def prettyName: String = s"unicode_${formName.toLowerCase}"

    @transient private lazy val form: Normalizer.Form = Normalizer.Form.valueOf(formName)

    override def nullSafeEval(input: Any): Any =
      normalizeData(input.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val formRef = ctx.addReferenceObj("graftNormForm", form, "java.text.Normalizer.Form")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.UnicodeExpressions.normalizeData($c, $formRef)")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))
}
