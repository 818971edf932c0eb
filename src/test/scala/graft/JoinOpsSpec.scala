package graft

import graft.operators.{AsofJoin, RangeJoin}

class JoinOpsSpec extends SparkSuite {
  import spark.implicits._

  lazy val trades = Seq( // (key, ts, id, qty)
    ("A", 100L, 1L, 10.0), ("A", 200L, 2L, 20.0), ("A", 350L, 3L, 30.0),
    ("B", 150L, 4L, 40.0), ("B", 90L, 5L, 50.0)
  ).toDF("sym", "ts_us", "id", "qty")

  lazy val quotes = Seq( // (key, ts, px)
    ("A", 90L, 1.0), ("A", 200L, 2.0), ("A", 300L, 3.0),
    ("B", 100L, 9.0)
  ).toDF("sym", "ts_us", "px")

  test("asof: latest right row with ts <= left ts, inclusive, per key") {
    val got = AsofJoin.asof(trades, quotes, Seq("sym"), "ts_us", "px")
      .select("id", "px_asof", "ts_us_asof")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(1.0), Some(90L))))   // A@100 -> quote@90
    assert(got(2L) == ((Some(2.0), Some(200L)))) // inclusive tie
    assert(got(3L) == ((Some(3.0), Some(300L))))
    assert(got(4L) == ((Some(9.0), Some(100L))))
    assert(got(5L) == ((None, None)))             // B@90: no prior quote
  }

  test("asof with tolerance drops stale matches") {
    val got = AsofJoin.asof(trades, quotes, Seq("sym"), "ts_us", "px",
        toleranceUs = Some(20L))
      .select("id", "px_asof").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0))  // gap 10 <= 20
    assert(got(3L).isEmpty)        // gap 50 > 20
  }

  test("asof reduceRight makes duplicate right timestamps deterministic") {
    val dup = Seq(("A", 100L, 1.0), ("A", 100L, 7.0)).toDF("sym", "ts_us", "px")
    val red = AsofJoin.reduceRight(dup, Seq("sym"), "ts_us", "px")
    assert(red.count() == 1 && red.select("px").as[Double].head() == 7.0)
  }

  test("range join: bucketized equi-join equals naive theta join") {
    val iv = Seq(("A", 80L, 220L, "w1"), ("A", 300L, 400L, "w2"), ("B", 0L, 1000L, "w3"))
      .toDF("sym", "start_us", "end_us", "win")
    val fast = RangeJoin.join(trades, iv, Seq("sym"), "ts_us", "start_us", "end_us",
        bucketUs = 50L)
      .select("id", "win").as[(Long, String)].collect().toSet
    val naive = trades.join(iv, trades("sym") === iv("sym") &&
        trades("ts_us").between(iv("start_us"), iv("end_us")))
      .select("id", "win").as[(Long, String)].collect().toSet
    assert(fast == naive)
    assert(fast == Set((1L, "w1"), (2L, "w1"), (3L, "w2"), (4L, "w3"), (5L, "w3")))
  }
}
