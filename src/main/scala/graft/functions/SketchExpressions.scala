package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch expressions over a MATERIALIZED array of 64-bit element
  * hashes (produce it once with `transform(tokens, xxhash64)`).
  *
  * Both replace k-wide fans of interpreted higher-order functions with ONE
  * codegen'd pass over the hash array:
  *  - MinHashSig: k minima of k seed-mixed views of each hash (splitmix64
  *    finalizer per seed) — one O(n·k) primitive loop instead of k
  *    interpreted array traversals;
  *  - SimHash64: 64 majority-vote bits — one O(n·64) bit loop instead of
  *    64 interpreted `filter(...)` scans.
  */
object SketchExpressions {

  /** splitmix64 finalizer — the standard public-domain 64-bit mixer. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val MIX_JAVA =
    """private static long graftMix64(long z) {
      |  z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L;
      |  z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL;
      |  return z ^ (z >>> 31);
      |}""".stripMargin

  /** MinHash signature: sig[i] = min over hashes h of mix64(h + seed_i),
    * seed_i = golden-gamma stride (splitmix64's increment). Empty input →
    * Long.MaxValue per slot (an empty set minhash).
    */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val out = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var s = 0
        while (s < k) {
          val v = mix64(h + s * 0x9e3779b97f4a7c15L)
          if (v < out(s)) out(s) = v
          s += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      ctx.addNewFunction("graftMix64", MIX_JAVA)
      nullSafeCodeGen(ctx, ev, c => {
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        val n = ctx.freshName("n")
        s"""
           |long[] $out = new long[$k];
           |java.util.Arrays.fill($out, Long.MAX_VALUE);
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $c.getLong($i);
           |  for (int $s = 0; $s < $k; $s++) {
           |    long $v = graftMix64($h + $s * 0x9e3779b97f4a7c15L);
           |    if ($v < $out[$s]) $out[$s] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash: bit b set iff strictly more than half of the hashes
    * have bit b set. Empty input → 0.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) counts(b) += 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) * 2 > n) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val counts = ctx.freshName("counts")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val n = ctx.freshName("n")
        val sig = ctx.freshName("sig")
        s"""
           |int[] $counts = new int[64];
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $c.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    if ((($h >>> $b) & 1L) != 0L) $counts[$b]++;
           |  }
           |}
           |long $sig = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($counts[$b] * 2 > $n) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    * every char k-gram of the input string (xxhash-style mix of the
    * k-byte window via a rolling accumulation), keep the minimum of each
    * sliding window of w gram-hashes (monotonic-deque, O(n)), distinct.
    *
    * A single per-row pass. The composable formulation (transform over
    * sequence + slice + array_min) re-evaluates its argument subtree per
    * window position when CollapseProject inlines it — measured to turn a
    * 500-doc corpus into a multi-minute regex storm. This expression is
    * the reliable shape for per-row sliding-window computations.
    */
  /** Shared implementation for [[Winnowing]] — called from both the
    * interpreted eval and generated code (see [[hashedShinglesData]] for
    * why a static call keeps us inside whole-stage codegen).
    */
  def winnowingData(u: org.apache.spark.unsafe.types.UTF8String,
                    k: Int, w: Int): ArrayData = {
    val s = u.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = mix64(h ^ s.charAt(i + j).toLong); j += 1 }
      grams(i) = h
      i += 1
    }
    if (m <= w) {
      var mn = Long.MaxValue
      var t = 0
      while (t < m) { if (grams(t) < mn) mn = grams(t); t += 1 }
      return new GenericArrayData(Array(mn))
    }
    // monotonic deque of indices → O(m) sliding minima
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    var p = 0
    while (p < m) {
      while (tail > head && grams(deque(tail - 1)) >= grams(p)) tail -= 1
      deque(tail) = p; tail += 1
      if (deque(head) <= p - w) head += 1
      if (p >= w - 1) out += grams(deque(head))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class Winnowing(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnowing"

    override def nullSafeEval(input: Any): Any =
      winnowingData(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchExpressions.winnowingData($c, $k, $w)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Shared implementation for [[HashedShingles]] — called from both the
    * interpreted eval and the generated code (Scala top-level objects get
    * static forwarders, so janino can call this directly; the body is
    * JIT-compiled, equivalent to inlining the loop).
    *
    * Tokenization is byte-exact with `TextOps.tokens` (split on
    * `TextOps.wsClass`): the class is RE2's \s — tab/LF/FF/CR/space,
    * deliberately EXCLUDING vertical tab (0x0B), which Java's \s includes
    * but RE2-based engines (the DuckDB oracle) do not. These bytes never
    * occur inside multi-byte UTF-8 sequences, so a byte scan splits
    * identically.
    * Each token is hashed in place (no substring allocation), each n-gram
    * is an order-sensitive splitmix64 fold of its token hashes, and the
    * result is the SORTED DISTINCT hash set — drop-in for the
    * tokenize→shingle-string→xxhash64→array_distinct→array_sort chain that
    * was allocating every shingle as a string. Downstream consumers only
    * use hash identity and set counts, so the hash-identity change is
    * invisible (collision odds ~2⁻⁶⁴ per pair-union, as before).
    */
  def hashedShinglesData(u: org.apache.spark.unsafe.types.UTF8String,
                         n: Int, seed: Long): ArrayData = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes
    // RE2 \s: space, tab, LF, FF, CR — NOT vertical tab (11); see scaladoc
    def isWs(b: Byte): Boolean =
      b == 32 || b == 9 || b == 10 || b == 12 || b == 13
    // pass 1: count tokens
    var nTok = 0
    var in = false
    var i = 0
    while (i < len) {
      val ws = isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (!ws && !in) { nTok += 1; in = true } else if (ws) in = false
      i += 1
    }
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    // pass 2: hash each token's byte range
    val th = new Array[Long](nTok)
    var t = 0
    var ts = -1
    i = 0
    while (i <= len) {
      val ws = i == len ||
        isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (!ws && ts < 0) ts = i
      if (ws && ts >= 0) {
        th(t) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + ts, i - ts, seed)
        t += 1
        ts = -1
      }
      i += 1
    }
    // n-gram fold, then sort + dedupe in place
    val sh = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = seed
      var j = 0
      while (j < n) { h = mix64(h ^ th(i + j)); j += 1 }
      sh(i) = h
      i += 1
    }
    java.util.Arrays.sort(sh)
    var u2 = 0
    i = 0
    while (i < m) {
      if (i == 0 || sh(i) != sh(i - 1)) { sh(u2) = sh(i); u2 += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, u2))
  }

  /** Sorted distinct 64-bit hashes of a document's word n-grams — the
    * whole tokenize→shingle→hash→distinct→sort pipeline as ONE native
    * per-row pass. Replaces a five-deep HOF chain whose alias-substituted
    * copies (Catalyst pushes inferred filters through projections by
    * substitution) were re-tokenizing every document several times per
    * scan.
    */
  case class HashedShingles(child: Expression, n: Int, seed: Long = 42L)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hashed_shingles"

    override def nullSafeEval(input: Any): Any =
      hashedShinglesData(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchExpressions.hashedShinglesData($c, $n, ${seed}L)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def hashed_shingles(text: Column, n: Int, seed: Long = 42L): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(text), n, seed))

  def minhash_sig(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), k))

  def winnowing(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(Winnowing(ColumnBridge.expression(text), k, w))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
}
