package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native typed aggregate.
  *
  * The 100 TB shape for "top terms": a FIXED-SIZE summary (≤ `capacity`
  * counters) that partial aggregation reduces map-side — each task ships
  * at most `capacity` (term, count) pairs regardless of how many billions
  * of tokens it scanned, and the reduce side merges #partitions such
  * summaries. An exact term count at that scale would shuffle the full
  * term universe; this shuffles a constant.
  *
  * Guarantees (classic Misra-Gries + the mergeable-summaries merge of
  * Agarwal et al., PODS'12): with n total tokens, every term with true
  * count > n/capacity is IN the summary, and every reported estimate is
  * an undercount by at most n/capacity. When the stream's distinct-term
  * count never exceeds `capacity`, no decrement ever fires and the
  * summary IS the exact count table (merges included) — the regime the
  * exact SQL oracle pins; the lossy regime is property-tested.
  */
object FreqExpressions {

  type MG = mutable.HashMap[UTF8String, Long]

  case class FreqSketchAgg(child: Expression, capacity: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MG] with UnaryLike[Expression] {
    require(capacity >= 1, s"capacity must be positive, got $capacity")

    override def prettyName: String = "freq_sketch"
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("term", StringType, nullable = false),
        StructField("est", LongType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): MG = new MG

    override def update(buf: MG, input: InternalRow): MG = {
      val v = child.eval(input)
      if (v != null) {
        val t = v.asInstanceOf[UTF8String]
        buf.get(t) match {
          case Some(c) => buf(t) = c + 1L
          // clone: the UTF8String points into a reused row buffer
          case None if buf.size < capacity => buf(t.clone()) = 1L
          case None => // decrement-all, the MG eviction step
            buf.mapValuesInPlace((_, c) => c - 1L)
            buf.filterInPlace((_, c) => c > 0L)
        }
      }
      buf
    }

    /** Sum counters, then restore the size bound by subtracting the
      * (capacity+1)-th largest combined count from every counter — a
      * values-only threshold, so the result is independent of map
      * iteration order (deterministic across merge schedules).
      */
    override def merge(buf: MG, other: MG): MG = {
      other.foreach { case (t, c) =>
        buf(t) = buf.getOrElse(t, 0L) + c
      }
      if (buf.size > capacity) {
        val vs = buf.values.toArray
        java.util.Arrays.sort(vs)
        val cut = vs(vs.length - capacity - 1) // (capacity+1)-th largest
        buf.mapValuesInPlace((_, c) => c - cut)
        buf.filterInPlace((_, c) => c > 0L)
      }
      buf
    }

    override def eval(buf: MG): Any = {
      val entries = buf.toArray
      // est desc, then binary term asc — Spark's own string ordering
      java.util.Arrays.sort(entries, (a: (UTF8String, Long), b: (UTF8String, Long)) =>
        if (a._2 != b._2) java.lang.Long.compare(b._2, a._2) else a._1.compareTo(b._1))
      new GenericArrayData(entries.map(e => InternalRow(e._1, e._2)))
    }

    override def serialize(buf: MG): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (t, c) =>
        val b = t.getBytes
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): MG = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new MG
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b)
        buf(UTF8String.fromBytes(b)) = in.readLong()
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
      copy(child = c)
  }

  def freq_sketch(term: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(term), capacity).toAggregateExpression())
}
