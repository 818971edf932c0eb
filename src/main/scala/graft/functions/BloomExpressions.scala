package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType}

/** Bloom-filter primitives for set-membership at corpus scale.
  *
  * The filter is split across the engine the way a 100 TB pipeline needs
  * it: the BUILD side is a plain mergeable aggregation (each gram sets k
  * bits; partial aggregation combines words map-side, so the full eval
  * set reduces to `m/64` longs no matter how many rows feed it), and the
  * PROBE side is a scalar predicate over a driver-collected `Array[Long]`
  * — a scan-local filter that needs NO join, NO broadcast hash table and
  * NO shuffle on the (huge) probe side.
  *
  * Bit positions are a pure function of the gram hash (splitmix64 mix of
  * `g + seed_i`, masked to the power-of-two table), so build and probe
  * agree by construction and the whole structure is deterministic across
  * runs, partitionings and cluster sizes — false-positive SETS, not just
  * rates, are reproducible.
  */
object BloomExpressions {

  /** Golden-gamma seed stride, same constant the MinHash family uses. */
  private val GG = 0x9e3779b97f4a7c15L

  /** Bit positions for one gram: k masked splitmix64 views. `logM` is the
    * log2 table size in BITS (m = 1 << logM).
    */
  def positionsData(g: Long, logM: Int, k: Int): ArrayData = {
    val mask = (1L << logM) - 1L
    val out = new Array[Int](k)
    var s = 0
    while (s < k) {
      out(s) = (SketchExpressions.mix64(g + s * GG) & mask).toInt
      s += 1
    }
    new GenericArrayData(out)
  }

  /** True iff ANY gram in the hash array has all k bits set in `words` —
    * the "possibly contains at least one member" probe, with early exit on
    * the first hit and on the first clear bit per gram.
    */
  def containsAnyData(hashes: ArrayData, words: Array[Long], logM: Int, k: Int): Boolean = {
    val mask = (1L << logM) - 1L
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val g = hashes.getLong(i)
      var s = 0
      var all = true
      while (all && s < k) {
        val pos = (SketchExpressions.mix64(g + s * GG) & mask).toInt
        if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) all = false
        s += 1
      }
      if (all) return true
      i += 1
    }
    false
  }

  /** `bloom_positions(g)` — build-side fan-out, codegen'd. */
  case class BloomPositions(child: Expression, logM: Int, k: Int)
      extends UnaryExpression {
    require(logM >= 6 && logM <= 30, s"logM must be in [6,30], got $logM")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bloom_positions"

    override def nullSafeEval(input: Any): Any =
      positionsData(input.asInstanceOf[Long], logM, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BloomExpressions.positionsData($c, $logM, $k)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `bloom_contains_any(hashes)` — probe-side predicate. The bit table
    * rides the expression as a reference object (the closure-serialized
    * model-parameter pattern used by the PQ codebooks and BM25 stats).
    */
  case class BloomContainsAny(child: Expression, words: Array[Long], logM: Int, k: Int)
      extends UnaryExpression {
    require(words.length == (1 << logM) / 64,
      s"words must hold 2^$logM bits, got ${words.length} longs")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_contains_any"

    override def nullSafeEval(input: Any): Any =
      containsAnyData(input.asInstanceOf[ArrayData], words, logM, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloomWords", words, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BloomExpressions.containsAnyData($c, $ref, $logM, $k)")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def bloom_positions(g: Column, logM: Int, k: Int): Column =
    ColumnBridge.column(BloomPositions(ColumnBridge.expression(g), logM, k))

  def bloom_contains_any(hashes: Column, words: Array[Long], logM: Int, k: Int): Column =
    ColumnBridge.column(BloomContainsAny(ColumnBridge.expression(hashes), words, logM, k))
}
