package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Distributed global ranking: the two-pass rank/ntile must be
  * bit-identical to Spark's own single-partition window formulation —
  * which is the one shape banned at scale (PlanAuditSpec's
  * SinglePartition gate), so equivalence here is what lets every
  * consumer use the distributed path unconditionally.
  */
class RankingSpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](ga: Gen[A])(body: A => Unit): Unit =
    samples(ga, 8).foreach(body)

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  import scala.jdk.CollectionConverters._

  private def df(values: Seq[(Double, Long)]) = {
    val rows = values.map { case (q, id) => org.apache.spark.sql.Row(q, id) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
  }

  test("global rank equals the unpartitioned row_number window") {
    val data = (1L to 257L).map(i => ((i * 7919 % 101).toDouble, i))
    val got = Ranking.withGlobalRank(df(data), Seq(col("q").desc, col("id").asc), "rn",
        numPartitions = 7)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df(data)
      .withColumn("rn", row_number().over(Window.orderBy(col("q").desc, col("id").asc)).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("withNtile matches Spark ntile() for every n and uneven totals") {
    // totals that are not multiples of n exercise the remainder buckets
    for (total <- Seq(1, 9, 10, 23, 100, 101); n <- Seq(1, 3, 10, 25)) {
      val data = (1L to total.toLong).map(i => ((i * 31 % 13).toDouble, i))
      val got = Ranking.withNtile(df(data), n, Seq(col("q").asc, col("id").asc), "b",
          numPartitions = 5)
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df(data)
        .withColumn("b", ntile(n).over(Window.orderBy(col("q").asc, col("id").asc)).cast("long"))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"total=$total n=$n")
    }
  }

  test("rank is dense 1..n and respects input column-name collisions") {
    // input already carries the internal stems — the free-name generator
    // must sidestep them
    val d = df((1L to 40L).map(i => (i.toDouble, i)))
      .withColumn("__graft_pid0", lit(1)).withColumn("__graft_tot0", lit(2))
    val out = Ranking.withGlobalRank(d, Seq(col("q").asc), "rn", numPartitions = 3)
    assert(out.columns.count(_ == "__graft_pid0") == 1)
    val ranks = out.select("rn").collect().map(_.getLong(0)).sorted
    assert(ranks === (1L to 40L).toArray)
  }

  test("property: arbitrary value multisets rank identically to the window") {
    val gen = Gen.listOfN(60, Gen.chooseNum(-50, 50))
    forAll(gen) { xs =>
      whenever(xs.nonEmpty) {
        val data = xs.zipWithIndex.map { case (v, i) => (v.toDouble, i.toLong) }
        val got = Ranking.withGlobalRank(df(data), Seq(col("q").asc, col("id").asc), "rn",
            numPartitions = 4)
          .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = df(data)
          .withColumn("rn", row_number().over(Window.orderBy(col("q").asc, col("id").asc)).cast("long"))
          .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want)
      }
    }
  }
}
