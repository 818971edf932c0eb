package graft

import graft.operators.Windowing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Distributed sliding-frame aggregation vs the per-key window it
  * replaces: same exact sums/counts on every row, including rows whose
  * frame crosses a range-partition boundary (forced with tiny partition
  * counts so most frames straddle partitions) and heavily skewed keys.
  */
class WindowingSpec extends SparkSuite {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def reference(df: org.apache.spark.sql.DataFrame, frame: Int) = {
    val w = Window.partitionBy("k").orderBy(col("t").asc, col("id").asc)
      .rowsBetween(-(frame - 1), 0)
    df.withColumn("fs", sum(col("v")).over(w))
      .withColumn("fc", count(lit(1)).over(w))
      .select("id", "fs", "fc")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
  }

  private def distributed(df: org.apache.spark.sql.DataFrame, frame: Int, parts: Int) =
    Windowing.movingSumCount(df, Seq("k"), Seq(col("t").asc, col("id").asc),
        col("v"), frame, "fs", "fc", numPartitions = parts)
      .select("id", "fs", "fc")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  test("matches the per-key window across frame sizes and partition counts") {
    val data = (1L to 300L).map(i => (s"k${i % 3}", i * 7 % 97, i, (i * 31 % 11) - 5))
    val df = data.toDF("k", "t", "id", "v")
    for (frame <- Seq(1, 2, 5, 50); parts <- Seq(2, 7, 32)) {
      assert(distributed(df, frame, parts) === reference(df, frame),
        s"frame=$frame parts=$parts")
    }
  }

  test("one hot key carrying nearly all rows still matches (skew)") {
    // 9/10 of rows in one key — the shape that serializes a per-key window
    val data = (1L to 500L).map { i =>
      (if (i % 10 == 0) s"cold${i % 40}" else "hot", i, i, i % 13)
    }
    val df = data.toDF("k", "t", "id", "v")
    assert(distributed(df, 5, 8) === reference(df, 5))
  }

  test("property: random multisets with duplicate timestamps match") {
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        t <- Gen.chooseNum(0L, 20L) // heavy ts collisions; id breaks ties
        v <- Gen.chooseNum(-100L, 100L)
      } yield (k, t, v))
    } yield rows
    samples(gen, 6).foreach { rows =>
      val data = rows.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val df = data.toDF("k", "t", "id", "v")
      assert(distributed(df, 4, 5) === reference(df, 4))
    }
  }

  test("empty key set = a corpus-GLOBAL sliding frame (no key column at all)") {
    val df = (1L to 200L).map(i => ("x", i * 3 % 101, i, i % 7)).toDF("k", "t", "id", "v")
    val got = Windowing.movingSumCount(df, Nil, Seq(col("t").asc, col("id").asc),
        col("v"), 5, "fs", "fc", numPartitions = 6)
      .select("id", "fs", "fc")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val w = Window.orderBy(col("t").asc, col("id").asc).rowsBetween(-4, 0)
    val want = df.withColumn("fs", sum(col("v")).over(w))
      .withColumn("fc", count(lit(1)).over(w))
      .select("id", "fs", "fc")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("repeated runs are bit-identical under AQE (pid stability regression)") {
    // r5 regression: spark_partition_id above a SHARED exchange read by
    // two branches is not stable under AQE (coalescing / local reads per
    // consumer) — caught as run-to-run pack-count drift. The persist in
    // withRankAndRunningSum pins it; this spec guards the guarantee.
    val df = (1L to 2000L).map(i => (s"k${i % 2}", i * 17 % 401, i, i % 23))
      .toDF("k", "t", "id", "v")
    val runs = (1 to 3).map { _ =>
      Windowing.movingSumCount(df, Seq("k"), Seq(col("t").asc, col("id").asc),
          col("v"), 7, "fs", "fc")
        .orderBy("k", "t", "id").collect().map(_.toString).toSeq
    }
    assert(runs.distinct.size == 1, "two-pass results varied across runs")
  }

  test("input columns named like the internal stems survive") {
    val df = (1L to 50L).map(i => ("k", i, i, i))
      .toDF("k", "t", "id", "v").withColumn("__graft_rn0", lit(9))
    val out = Windowing.movingSumCount(df, Seq("k"), Seq(col("t").asc, col("id").asc),
      col("v"), 3, "fs", "fc", numPartitions = 3)
    assert(out.columns.contains("__graft_rn0"))
    assert(out.select("__graft_rn0").distinct().collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("withPrevious matches the per-key lag window, boundaries + skew + ts ties") {
    def reference(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("k").orderBy(col("t").asc, col("id").asc)
      df.withColumn("prev_t", lag(col("t"), 1).over(w))
        .withColumn("prev_id", lag(col("id"), 1).over(w))
        .withColumn("prev_v", lag(col("v"), 1).over(w))
        .select("id", "prev_t", "prev_id", "prev_v")
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    }
    def distributed(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Windowing.withPrevious(df, Seq("k"), Seq("t", "id"), Seq("v"),
          numPartitions = parts)
        .select("id", "prev_t", "prev_id", "prev_v")
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // heavy ts collisions + one hot key carrying 90% of rows, with tiny
    // partition counts so most predecessors sit across a range boundary
    val data = (1L to 400L).map { i =>
      (if (i % 10 == 0) s"cold${i % 30}" else "hot", i * 3 % 40, i, i % 17)
    }
    val df = data.toDF("k", "t", "id", "v")
    for (parts <- Seq(2, 7, 32))
      assert(distributed(df, parts) === reference(df), s"parts=$parts")
  }

  test("ts deltas/gaps over the hot-key-safe lag match hand-computed values") {
    import graft.operators.{TimeSeries => TS}
    // series s: values 1.0@t0, 4.0@t2s, 2.5@t2s (rid tie), 2.5@t4h
    val rows = Seq(
      ("s", 0L, 1L, 1.0),
      ("s", 2000000L, 2L, 4.0),
      ("s", 2000000L, 3L, 2.5),
      ("s", 14402000000L, 4L, 2.5),
      ("q", 5L, 5L, 9.0))
    val df = rows.toDF("series", "ts_us", "rid", "value")
    val d = TS.deltas(df, Nil).collect()
      .map(r => r.getLong(2) -> (r.getDouble(3), r.getLong(4),
        Option(r.get(5)))).toMap
    assert(d(2L) == ((3.0, 2000000L, Some(1.5))))      // (4-1)/2s
    assert(d(3L) == ((-1.5, 0L, None)))                // ts tie: rate NULL
    assert(d(4L) == ((0.0, 14400000000L, Some(0.0))))  // flat over 4h
    assert(!d.contains(1L) && !d.contains(5L))         // first points drop
    val g = TS.gaps(df, Nil, thresholdUs = 7200000000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g.toSeq == Seq(("s", 2000000L, 14402000000L, 14400000000L)))
  }
}
