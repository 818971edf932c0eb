package graft

import graft.functions.Tags
import graft.model.Canon.{Datapoint, TagEntry}
import graft.operators.{TimeSeries => TS}
import org.apache.spark.sql.DataFrame

/** Quirk-ledger unit tests (SURVEY.md §7.5) over a hand-built corpus. */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def tag(pairs: (String, String)*): Option[Seq[TagEntry]] =
    Some(pairs.map { case (n, v) => TagEntry(n, v) })

  // two series, 5 + 3 points, some shared timestamps, one untagged point,
  // one point with a duplicate tag name (first-match check)
  lazy val df: DataFrame = Seq(
    Datapoint("a", 100L, tag("loc" -> "1", "sci" -> "lang"), 1.0, 1),
    Datapoint("a", 200L, tag("loc" -> "1", "sci" -> "perp"), 2.0, 2),
    Datapoint("a", 300L, tag("loc" -> "2", "sci" -> "lang"), 3.0, 3),
    Datapoint("a", 400L, None, 4.0, 4),
    Datapoint("a", 500L, tag("loc" -> "2", "loc" -> "9"), 5.0, 5),
    Datapoint("b", 100L, tag("loc" -> "1"), 10.0, 6),
    Datapoint("b", 300L, tag("loc" -> "3"), 30.0, 7),
    Datapoint("b", 600L, tag("sci" -> "perp"), 60.0, 8)
  ).toDF()

  test("Q1 last-n is PER SERIES: k series return up to k*n rows") {
    val got = TS.readLast(df, Seq("a", "b"), 2)
    assert(got.count() == 4)
    // global sort desc: b@600, a@500, a@400, b@300
    assert(got.select("rid").as[Long].collect().toSeq == Seq(8L, 5L, 4L, 7L))
  }

  test("Q2/Q4 latest/earliest are last-1/first-1 per series") {
    assert(TS.latest(df, Nil).select("rid").as[Long].collect().toSet == Set(5L, 8L))
    assert(TS.earliest(df, Nil).select("rid").as[Long].collect().toSet == Set(1L, 6L))
  }

  test("Q5/Q6 since and range bounds are inclusive on both ends") {
    assert(TS.readSince(df, Seq("a"), 300L).count() == 3) // 300,400,500
    val r = TS.readRange(df, Seq("a", "b"), 200L, 300L)   // 200,300 a; 300 b
    assert(r.select("rid").as[Long].collect().toSet == Set(2L, 3L, 7L))
  }

  test("since(t) == range(t, maxTs) (property from SURVEY §5)") {
    val s = TS.readSince(df, Nil, 300L).select("rid").as[Long].collect().toSet
    val r = TS.readRange(df, Nil, 300L, 600L).select("rid").as[Long].collect().toSet
    assert(s == r)
  }

  test("F1 equals: untagged points never pass; missing name never passes") {
    val got = TS.tagFilter(df, Seq(Tags.Group("loc", Seq("1"), Tags.Eq)))
    assert(got.select("rid").as[Long].collect().toSet == Set(1L, 2L, 6L))
    // rid=4 (untagged) and rid=8 (no loc tag) excluded even for != style checks
    val none = TS.tagFilter(df, Seq(Tags.Group("nope", Seq("x"), Tags.Eq)))
    assert(none.count() == 0)
  }

  test("F1 first-match on duplicate tag names (shard.re:116-120)") {
    // rid=5 has loc->2 then loc->9; only the FIRST is observable
    assert(TS.tagFilter(df, Seq(Tags.Group("loc", Seq("2"), Tags.Eq)))
      .select("rid").as[Long].collect().toSet == Set(3L, 5L))
    assert(TS.tagFilter(df, Seq(Tags.Group("loc", Seq("9"), Tags.Eq))).count() == 0)
  }

  test("F2 contains is substring on the point's tag value") {
    // sci values: lang, perp; 'an' inside lang
    val got = TS.tagFilter(df, Seq(Tags.Group("sci", Seq("an"), Tags.Contains)))
    assert(got.select("rid").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("F3 OR within one name, AND across names, set semantics (no dup rows)") {
    val or = TS.tagFilter(df, Seq(Tags.Group("loc", Seq("1", "3"), Tags.Eq)))
    assert(or.select("rid").as[Long].collect().toSet == Set(1L, 2L, 6L, 7L))
    val and = TS.tagFilter(df, Seq(
      Tags.Group("loc", Seq("1", "2"), Tags.Eq),
      Tags.Group("sci", Seq("lang"), Tags.Eq)))
    assert(and.select("rid").as[Long].collect().toSet == Set(1L, 3L))
    // multi-value contains must NOT duplicate a doubly-matching row
    val dup = TS.tagFilter(df, Seq(Tags.Group("sci", Seq("a", "n"), Tags.Contains)))
    assert(dup.filter($"rid" === 1L).count() == 1)
  }

  test("F4 name/value count mismatch is rejected") {
    intercept[IllegalArgumentException] {
      Tags.parseGroups("a,b", "1", Tags.Eq)
    }
  }

  test("parseGroups groups repeated names into OR lists") {
    val gs = Tags.parseGroups("loc,loc,sci", "1,2,lang", Tags.Eq)
    assert(gs == Seq(Tags.Group("loc", Seq("1", "2"), Tags.Eq),
                     Tags.Group("sci", Seq("lang"), Tags.Eq)))
  }

  test("A1-A7 empty-input semantics: sum/count -> 0, others -> no row") {
    val empty = df.filter($"series" === "zzz")
    assert(TS.aggregate(empty, TS.Sum).as[Double].collect().toSeq == Seq(0.0))
    assert(TS.aggregate(empty, TS.Count).as[Double].collect().toSeq == Seq(0.0))
    assert(TS.aggregate(empty, TS.Max).count() == 0)
    assert(TS.aggregate(empty, TS.Mean).count() == 0)
    assert(TS.aggregate(empty, TS.Median).count() == 0)
  }

  test("A2 count emits double (wire fidelity: reference emits float)") {
    val c = TS.aggregate(df, TS.Count)
    assert(c.schema("count").dataType.typeName == "double")
    assert(c.as[Double].head() == 8.0)
  }

  test("A8 unknown aggregate token rejected") {
    intercept[IllegalArgumentException] { TS.aggregate(df, "p99") }
  }

  test("D1 delete range with tag pipe removes ONLY matched rows (intent, not ts-twins)") {
    // reference would delete every point sharing a timestamp with a match
    // (timeseries.re:264-272); we delete the matched rows only (SURVEY §7.5 #6)
    val surv = TS.deleteRange(df, Seq("a"), 100L, 200L,
      Seq(Tags.Group("sci", Seq("lang"), Tags.Eq)))
    // only rid=1 (a@100 sci=lang) deleted; rid=6 (b@100) survives though same ts
    assert(surv.select("rid").as[Long].collect().toSet == Set(2L, 3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("delete with no pipe deletes the whole matched range; untagged rows deletable") {
    val surv = TS.deleteRange(df, Seq("a"), 300L, 500L)
    assert(surv.select("rid").as[Long].collect().toSet == Set(1L, 2L, 6L, 7L, 8L))
  }

  test("U1 multi-series union is a bag (no dedup) and I-ops count it") {
    assert(TS.length(df, Seq("a", "b")).as[Long].head() == 8L)
    assert(TS.names(df).as[String].collect().toSeq == Seq("a", "b"))
    assert(TS.stats(df).as[(String, Long)].collect().toSeq == Seq(("a", 5L), ("b", 3L)))
    val idx = TS.indexInfo(df).collect()
    assert(idx.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 100L, 500L), ("b", 100L, 600L)))
  }
}
