package graft

import graft.operators.TableProfile
import org.apache.spark.sql.functions._

class TableProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: counts, nulls, exact distincts, typed min/max per column") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("a"), None),
      (3L, None, Some(9)),
      (4L, Some("c"), Some(10))
    ).toDF("id", "s", "v")
    val got = TableProfile.profile(df)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      ("id", 4L, 0L, 4L, Some("1"), Some("4")),
      ("s", 4L, 1L, 2L, Some("a"), Some("c")),
      // typed min/max: 9 < 10 numerically even though "10" < "9" as strings
      ("v", 4L, 1L, 2L, Some("9"), Some("10"))))
  }

  test("profile: non-atomic columns excluded by default, override validated") {
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    assert(TableProfile.profile(df).select("column").as[String].collect().toSeq == Seq("id"))
    intercept[IllegalArgumentException] { TableProfile.profile(df, Seq("nope")) }
    intercept[IllegalArgumentException] {
      TableProfile.profile(df.select(array(lit(1)).as("only_arr")))
    }
  }

  test("profileApprox: one-pass wide tier tracks the exact tier within HLL rsd") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TableProfile.profile(docs)
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    val approx = TableProfile.profileApprox(docs)
    assert(approx.columns.toSeq == Seq("column", "n_rows", "n_nulls",
      "n_distinct_approx", "min_val", "max_val"))
    approx.select("column", "n_distinct_approx").as[(String, Long)].collect()
      .foreach { case (c, est) =>
        val truth = exact(c).toDouble
        // default rsd 5%; allow 4 sigma
        assert(math.abs(est - truth) <= truth * 0.2 + 2, s"$c: est=$est truth=$truth")
      }
    // nulls and min/max come from the same wide aggregate — identical to exact
    val em = TableProfile.profile(docs)
      .select("column", "n_nulls", "min_val", "max_val").collect().toSeq
    val am = approx.select("column", "n_nulls", "min_val", "max_val").collect().toSeq
    assert(em == am)
  }

  test("profile: all-null column has null min/max and zero distincts") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val s = TableProfile.profile(df).filter($"column" === "s")
      .as[(String, Long, Long, Long, Option[String], Option[String])].head()
    assert(s == (("s", 2L, 2L, 0L, None, None)))
  }
}
