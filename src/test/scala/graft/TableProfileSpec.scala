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

  test("profile: all-null column has null min/max and zero distincts") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val s = TableProfile.profile(df).filter($"column" === "s")
      .as[(String, Long, Long, Long, Option[String], Option[String])].head()
    assert(s == (("s", 2L, 2L, 0L, None, None)))
  }
}
