package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-signal expressions — the scan-stage statistics
  * every quality/language filter needs, as codegen'd byte scans instead of
  * `split` + interpreted higher-order `filter` chains. A quality pass over
  * 100 TB is scan-bound: the old formulation materialized two token
  * arrays per row (text and lowered text) and ran a per-token interpreted
  * lambda for every stopword/lexicon test; these run zero-allocation byte
  * loops (token lookups allocate only the candidate token).
  *
  * Tokenization is byte-exact with `TextOps.tokens` (RE2 \s class — see
  * SketchExpressions.hashedShinglesData for why byte scanning splits
  * UTF-8 identically).
  */
object TextSignalExpressions {

  // RE2 \s: space, tab, LF, FF, CR — NOT vertical tab (0x0B)
  @inline private def isWs(b: Byte): Boolean =
    b == 32 || b == 9 || b == 10 || b == 12 || b == 13

  /** Whitespace-token count == `size(filter(split(text, ws+), _ != ""))`. */
  def tokenCountData(u: UTF8String): Int = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    var n = 0
    var in = false
    var i = 0
    while (i < len) {
      val ws = isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (!ws && !in) { n += 1; in = true } else if (ws) in = false
      i += 1
    }
    n
  }

  /** Count of whitespace BYTES — the ws class is pure ASCII, so this
    * equals the whitespace CHAR count and `length(text) - wsCount` is
    * exactly `length(regexp_replace(text, ws+, ''))`.
    */
  def wsCountData(u: UTF8String): Int = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    var n = 0
    var i = 0
    while (i < len) {
      if (isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) n += 1
      i += 1
    }
    n
  }

  /** Count of [.,!?;:] bytes — ASCII, never inside a UTF-8 continuation,
    * so equal to the regex char count of the same class.
    */
  def punctCountData(u: UTF8String): Int = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    var n = 0
    var i = 0
    while (i < len) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':') n += 1
      i += 1
    }
    n
  }

  /** BPE-ish proxy token count == `Σ max(1, ceil(chars(tok)/4))` over
    * whitespace tokens. Token length counts CHARS, not bytes (UTF-8
    * continuation bytes `10xxxxxx` are skipped), matching `length()` in
    * Spark and DuckDB on multibyte text.
    */
  def bpeishCountData(u: UTF8String): Int = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    var total = 0
    var chars = 0
    var in = false
    var i = 0
    while (i <= len) {
      val b = if (i == len) 32.toByte
              else org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val ws = i == len || isWs(b)
      if (ws) {
        if (in) { total += math.max(1, (chars + 3) / 4); chars = 0; in = false }
      } else {
        in = true
        if ((b & 0xC0) != 0x80) chars += 1 // count only lead bytes
      }
      i += 1
    }
    total
  }

  /** Tokens whose LOWERCASE form is in `set` == the
    * `size(filter(tokens(lower(text)), _.isin(words)))` chain:
    * lowercasing never creates or removes RE2-\s whitespace, so
    * lower-then-tokenize and tokenize-then-lower yield the same token
    * multiset (property-fuzzed, unicode included). Full UTF8String
    * lowercase per token — NOT a byte-wise ASCII fold, which would
    * diverge on e.g. the Kelvin sign K (U+212A lowercases to 'k').
    */
  def tokenHitCountData(u: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    var n = 0
    var ts = -1
    var i = 0
    while (i <= len) {
      val ws = i == len ||
        isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (!ws && ts < 0) ts = i
      if (ws && ts >= 0) {
        val b = new Array[Byte](i - ts)
        org.apache.spark.unsafe.Platform.copyMemory(
          base, off + ts, b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, i - ts)
        if (set.contains(UTF8String.fromBytes(b).toLowerCase)) n += 1
        ts = -1
      }
      i += 1
    }
    n
  }

  sealed abstract class ByteScan extends UnaryExpression {
    override def dataType: DataType = IntegerType
    protected def staticCall: String
    override def nullSafeEval(input: Any): Any =
      evalOne(input.asInstanceOf[UTF8String])
    protected def evalOne(u: UTF8String): Int
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextSignalExpressions.$staticCall($c)")
  }

  case class TokenCnt(child: Expression) extends ByteScan {
    override def prettyName: String = "token_cnt"
    protected def staticCall: String = "tokenCountData"
    protected def evalOne(u: UTF8String): Int = tokenCountData(u)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WsCnt(child: Expression) extends ByteScan {
    override def prettyName: String = "ws_cnt"
    protected def staticCall: String = "wsCountData"
    protected def evalOne(u: UTF8String): Int = wsCountData(u)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class PunctCnt(child: Expression) extends ByteScan {
    override def prettyName: String = "punct_cnt"
    protected def staticCall: String = "punctCountData"
    protected def evalOne(u: UTF8String): Int = punctCountData(u)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class BpeishCnt(child: Expression) extends ByteScan {
    override def prettyName: String = "bpeish_cnt"
    protected def staticCall: String = "bpeishCountData"
    protected def evalOne(u: UTF8String): Int = bpeishCountData(u)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `words` are lowercased into the lookup set at construction. */
  case class TokenHitCount(child: Expression, words: Seq[String]) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "token_hit_cnt"

    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](math.max(16, words.size * 2))
      words.foreach(w => s.add(UTF8String.fromString(w).toLowerCase))
      s
    }

    override def nullSafeEval(input: Any): Any =
      tokenHitCountData(input.asInstanceOf[UTF8String], set)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("graftWordSet", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextSignalExpressions.tokenHitCountData($c, $setRef)")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def token_cnt(text: Column): Column =
    ColumnBridge.column(TokenCnt(ColumnBridge.expression(text)))
  def ws_cnt(text: Column): Column =
    ColumnBridge.column(WsCnt(ColumnBridge.expression(text)))
  def punct_cnt(text: Column): Column =
    ColumnBridge.column(PunctCnt(ColumnBridge.expression(text)))
  def bpeish_cnt(text: Column): Column =
    ColumnBridge.column(BpeishCnt(ColumnBridge.expression(text)))
  def token_hit_cnt(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenHitCount(ColumnBridge.expression(text), words))
}
