package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zvalue: textbook interleave on known bit patterns") {
    // u=0b101, t=0b011, bits=3 -> positions: u0->0, t0->1, u1->2, t1->3,
    // u2->4, t2->5 -> set {0,1,3,4} = 27
    val r = Seq((5L, 3L)).toDF("u", "t")
      .select(Layout.zvalue(Seq(col("u"), col("t")), 3).as("z"))
      .head().getLong(0)
    assert(r == 27L)
    // single dim degenerates to identity on the low bits
    val one = Seq(13L).toDF("u")
      .select(Layout.zvalue(Seq(col("u")), 4).as("z")).head().getLong(0)
    assert(one == 13L)
    // budget guard
    intercept[IllegalArgumentException] {
      Layout.zvalue(Seq(col("u"), col("t")), 32)
    }
  }

  test("normShift: signed bitLength arithmetic incl. power-of-two boundaries") {
    assert(Layout.normShift(0, 0, 12) == -12)        // degenerate range: all-zero
    assert(Layout.normShift(0, 4095, 12) == 0)       // fits exactly
    assert(Layout.normShift(0, 4096, 12) == 1)       // one past: 13 bits
    assert(Layout.normShift(100, 100 + (1L << 40) - 1, 12) == 28)
    assert(Layout.normShift(-50, 49, 6) == 1)        // negative min ok: range 99
    assert(Layout.normShift(0, 149, 12) == -4)       // narrow dim STRETCHES
    intercept[IllegalArgumentException] { Layout.normShift(1, 0, 12) }
    // stretched normalization stays inside [0, 2^bits)
    val n = Seq(0L, 75L, 149L).toDF("u")
      .select(Layout.normalize(col("u"), 0L, 149L, 12).as("n"))
      .collect().map(_.getLong(0))
    assert(n.forall(v => v >= 0 && v < 4096), n.mkString(","))
    assert(n(0) == 0L && n(2) == 149L << 4)
  }

  test("zorderStats on a full grid: contiguous buckets, quartered spans on BOTH dims") {
    // 64x64 grid, bits=6 per dim, 16 buckets -> top 4 z bits = (u hi 2, t hi 2):
    // every bucket holds a 16x16 tile -> each dim's span is exactly 15
    val grid = (for (u <- 0 until 64; t <- 0 until 64) yield (u.toLong, t.toLong))
      .toDF("u", "t")
    val s = Layout.zorderStats(grid, Seq("u", "t"), bits = 6, buckets = 16).collect()
    assert(s.length == 16)
    assert(s.map(_.getLong(0)).toSeq == (0L until 16L))
    s.foreach { r =>
      assert(r.getLong(1) == 256L, r.toString)                       // 16x16 tile
      assert(r.getLong(3) - r.getLong(2) == 15L, r.toString)         // u span
      assert(r.getLong(5) - r.getLong(4) == 15L, r.toString)         // t span
      assert(r.getLong(7) - r.getLong(6) == 255L, r.toString)        // z contiguous
    }
    // single-column layout comparison: bucketing the same grid by u alone
    // leaves t's span at the FULL range in every bucket — the claim z-order
    // beats, stated as data
    val naive = grid.groupBy((col("u") / 4).cast("long").as("b"))
      .agg(min("t").as("tmin"), max("t").as("tmax")).collect()
    naive.foreach(r => assert(r.getLong(2) - r.getLong(1) == 63L))
  }

  test("zorderStats: offset/scaled domains normalize before interleaving") {
    // u in [1000, 1063], t in [-32, 31]: same grid shape after normalization
    val grid = (for (u <- 0 until 64; t <- 0 until 64)
      yield (1000L + u, -32L + t)).toDF("u", "t")
    val s = Layout.zorderStats(grid, Seq("u", "t"), bits = 6, buckets = 16).collect()
    assert(s.length == 16)
    s.foreach { r =>
      assert(r.getLong(1) == 256L)
      assert(r.getLong(3) - r.getLong(2) == 15L)
      assert(r.getLong(5) - r.getLong(4) == 15L)
    }
    assert(s.map(_.getLong(2)).min == 1000L && s.map(_.getLong(3)).max == 1063L)
  }

  test("zorderStats: a narrow dimension stretches, so buckets still tile it") {
    // u in [0,16), t in [0,64): without the stretch u's top interleave bits
    // are constant zero and the 16 coarse buckets would discriminate on t
    // only; with it every bucket is a 4x16 tile
    val grid = (for (u <- 0 until 16; t <- 0 until 64) yield (u.toLong, t.toLong))
      .toDF("u", "t")
    val s = Layout.zorderStats(grid, Seq("u", "t"), bits = 6, buckets = 16).collect()
    assert(s.length == 16)
    s.foreach { r =>
      assert(r.getLong(1) == 64L, r.toString)
      assert(r.getLong(3) - r.getLong(2) == 3L, r.toString)   // u span: 4 values
      assert(r.getLong(5) - r.getLong(4) == 15L, r.toString)  // t span: 16 values
    }
  }

  test("zorderStats: empty input yields typed empty frame, no NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "t")
    val s = Layout.zorderStats(empty, Seq("u", "t"))
    assert(s.columns.toSeq == Seq("bucket", "n_rows", "u_min", "u_max",
      "t_min", "t_max", "z_min", "z_max"))
    assert(s.count() == 0)
  }

  test("zorderStats: reserved-name and duplicate-column guards") {
    val df = Seq((1L, 2L)).toDF("bucket", "t")
    intercept[IllegalArgumentException] {
      Layout.zorderStats(df, Seq("bucket", "t"))
    }
    val df2 = Seq((1L, 2L)).toDF("u", "t")
    intercept[IllegalArgumentException] {
      Layout.zorderStats(df2, Seq("u", "u"))
    }
    intercept[IllegalArgumentException] { // buckets must be a power of two
      Layout.zorderStats(df2, Seq("u", "t"), bits = 6, buckets = 48)
    }
  }

  test("zorderBy: files hold contiguous z runs; both dims' per-partition spans shrink") {
    val grid = (for (u <- 0 until 64; t <- 0 until 64) yield (u.toLong, t.toLong))
      .toDF("u", "t")
    val laid = Layout.zorderBy(grid, Seq("u", "t"), bits = 6, numPartitions = 16)
    assert(laid.columns.contains("z"))
    // per-partition z-sortedness and span stats via partition id
    val parts = laid
      .select(spark_partition_id().as("pid"), col("u"), col("t"), col("z"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n"), min("u").as("umin"), max("u").as("umax"),
        min("t").as("tmin"), max("t").as("tmax"))
      .collect()
    // range exchange: every partition non-empty-ish and spans bounded well
    // under the full 0-63 range on BOTH dims (a single-column sort cannot
    // do this for the second dim)
    val occupied = parts.filter(_.getLong(1) > 0)
    assert(occupied.length >= 8, parts.mkString(","))
    val uSpans = occupied.map(r => r.getLong(3) - r.getLong(2))
    val tSpans = occupied.map(r => r.getLong(5) - r.getLong(4))
    assert(uSpans.sum.toDouble / uSpans.length <= 32.0, uSpans.mkString(","))
    assert(tSpans.sum.toDouble / tSpans.length <= 32.0, tSpans.mkString(","))
    // empty input passes through with a z column
    val e = Layout.zorderBy(Seq.empty[(Long, Long)].toDF("u", "t"), Seq("u", "t"))
    assert(e.columns.contains("z") && e.count() == 0)
  }
}
