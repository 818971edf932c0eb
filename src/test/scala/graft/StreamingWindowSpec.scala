package graft

import graft.model.Canon
import graft.streaming.WindowedAggs
import org.apache.spark.sql.streaming.Trigger

class StreamingWindowSpec extends SparkSuite {
  import spark.implicits._

  test("windowed per-series aggregation over a real stream matches batch") {
    // stream the events table through a file source (one batch, AvailableNow);
    // the file source needs a DIRECTORY, so stage the file into one
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = tmpDir("stream_events")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = Canon.canonicalizeEvents(
      spark.readStream.schema(schema).parquet(dir))
    val agg = WindowedAggs.bySeriesWindow(stream, "1 hour", watermark = "1 minute")
    val q = agg.writeStream
      .format("memory").queryName("winagg").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)

    val streamed = spark.table("winagg")
      .select("series", "w_start", "n").as[(String, java.sql.Timestamp, Long)]
      .collect().toSet
    val batch = WindowedAggs.bySeriesWindow(Canon.events(spark, "/root/testdata/sf0.001"), "1 hour")
      .select("series", "w_start", "n").as[(String, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows == batch lag-based sessionization") {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = tmpDir("stream_sessions")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(src).schema
    val rawStream = spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), Canon.tsUsExpr(spark.read.parquet(src)).as("ts_us"),
        col("value"))
    val agg = WindowedAggs.sessionsByKey(rawStream, "user_id")
    val q = agg.writeStream
      .format("memory").queryName("sessagg").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("sessagg")
      .select("user_id", "sess_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet

    // batch truth: identical lag/cumsum logic to q_sessionize
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us").asc)
    val batch = Canon.eventsRaw(spark, "/root/testdata/sf0.001")
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts_us")).as("sess_start_us"), count(lit(1)).as("n_events"))
      .select("user_id", "sess_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("graft SQL functions are registered and codegen-evaluable via spark.sql") {
    Graft.register(spark)
    val r = spark.sql(
      """SELECT round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) c,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) d,
        |       tag_lookup(array(named_struct('name', 'k', 'value', 'v1'),
        |                        named_struct('name', 'k', 'value', 'v2')), 'k') t,
        |       simhash64(array(1L, 1L, 3L)) s
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getString(2) == "v1") // first match
    assert(r.getLong(3) == 1L)     // majority bits of {1,1,3}
  }
}
