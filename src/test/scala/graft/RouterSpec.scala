package graft

import graft.api.{Router, Wire}
import graft.model.Canon.{Datapoint, TagEntry}

/** Route-string parity: the reference's exact URL queries, interpreted. */
class RouterSpec extends SparkSuite {
  import spark.implicits._

  private def tag(pairs: (String, String)*) = Some(pairs.map { case (n, v) => TagEntry(n, v) })

  lazy val df = Seq(
    Datapoint("s1", 100L, tag("loc" -> "1", "sci" -> "lang"), 1.0, 1),
    Datapoint("s1", 200L, tag("loc" -> "2", "sci" -> "perp"), 2.0, 2),
    Datapoint("s1", 300L, None, 4.0, 3),
    Datapoint("s2", 150L, tag("loc" -> "1"), 10.0, 4),
    Datapoint("s2", 250L, tag("loc" -> "2"), 20.0, 5)
  ).toDF()

  test("read routes") {
    assert(Router.run(df, "s1,s2/last/1").select("rid").as[Long].collect().toSet == Set(3L, 5L))
    assert(Router.run(df, "s1/first/2").select("rid").as[Long].collect().toSeq == Seq(1L, 2L))
    assert(Router.run(df, "s1,s2/since/200").count() == 3)
    assert(Router.run(df, "s2/range/100/200/count").as[Double].head() == 1.0)
    assert(Router.run(df, "names").as[String].collect().toSeq == Seq("s1", "s2"))
    assert(Router.run(df, "s1/length").as[Long].head() == 3L)
  }

  test("xargs filter + aggregate routes") {
    // multi-value OR: the name repeats per value (zip semantics, shard.re:176-180)
    assert(Router.run(df, "s1,s2/last/10/filter/loc,loc/equals/1,2/sum")
      .as[Double].head() == 33.0)
    assert(Router.run(df, "s1/last/10/filter/sci/contains/per")
      .select("rid").as[Long].collect().toSeq == Seq(2L))
    assert(Router.run(df, "s1,s2/since/0/mean").as[Double].head() == 37.0 / 5)
  }

  test("delete routes return survivors; bad routes reject") {
    assert(Router.runDelete(df, "s1/range/100/200").select("rid").as[Long]
      .collect().toSet == Set(3L, 4L, 5L))
    intercept[IllegalArgumentException] { Router.run(df, "s1/lastish/3") }
    intercept[IllegalArgumentException] { Router.run(df, "s1/last/3/p99") }
    intercept[IllegalArgumentException] { Router.run(df, "s1/last/3/filter/a/like/b") }
  }

  test("wire JSON: reference field order, tag omitted when absent") {
    val rows = Wire.toJsonRows(Router.run(df, "s1/first/3"))
      .as[String].collect()
    assert(rows(0) ==
      """{"timestamp":100,"tag":[{"loc":"1"},{"sci":"lang"}],"value":1.0}""")
    assert(rows(2) == """{"timestamp":300,"value":4.0}""") // untagged → no tag key
    val agg = Wire.aggToJson(Router.run(df, "s1/last/10/sum")).as[String].head()
    assert(agg == """{"sum":7.0}""")
  }
}
