package graft

import graft.operators.Events
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence operators. The load-bearing test is sessionize
  * equivalence: the hot-key-safe two-pass path must reproduce the
  * per-user window formulation exactly, including under 9:1 user skew
  * (the shape the window serializes through one task).
  */
class EventsSpec extends SparkSuite {
  import spark.implicits._

  private def windowed(e: org.apache.spark.sql.DataFrame, gapUs: Long) = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    e.withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("event_id", "sess_id")
      .as[(Long, Long)].collect().toMap
  }

  test("sessionizeScalable equals the window formulation (incl. 9:1 user skew)") {
    // one hot user with 90% of events; gaps engineered around the 100-unit
    // threshold, with ties on ts broken by event_id
    val rows = (1L to 400L).map { i =>
      val user = if (i % 10 == 0) i % 40 + 1000 else 7L
      val ts = (i / 3) * (if (i % 7 == 0) 150L else 40L) // mixed gaps, some > 100
      (i, user, ts)
    }
    val e = rows.toDF("event_id", "user_id", "ts_us")
    val got = Events.sessionizeScalable(e, gapUs = 100L, numPartitions = 8)
      .select("event_id", "sess_id").as[(Long, Long)].collect().toMap
    assert(got === windowed(e, 100L))
  }

  test("sessionizeScalable passes input columns through and starts ids at 1") {
    val e = Seq((1L, 5L, 0L, "x"), (2L, 5L, 50L, "y"), (3L, 5L, 500L, "z"))
      .toDF("event_id", "user_id", "ts_us", "payload")
    val out = Events.sessionizeScalable(e, gapUs = 100L, numPartitions = 3)
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts_us", "payload", "sess_id"))
    val m = out.select("event_id", "sess_id").as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("funnel stage counts shrink monotonically and order numerically") {
    val e = Seq(
      (1L, "view"), (1L, "click"), (1L, "purchase"),
      (2L, "view"), (2L, "click"),
      (3L, "view"),
      (4L, "click")) // click without view: not counted past stage 1
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, i.toLong * 10, t) }
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val out = Events.funnelCounts(e, Seq("view", "click", "purchase")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("1_view", "2_click", "3_purchase"))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L))
  }
}
