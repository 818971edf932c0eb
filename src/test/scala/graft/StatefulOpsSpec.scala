package graft

import graft.model.Canon.Datapoint
import graft.streaming.StatefulOps
import org.apache.spark.sql.streaming.Trigger

class StatefulOpsSpec extends SparkSuite {
  import spark.implicits._

  test("per-series running stats with out-of-order tracking across micro-batches") {
    implicit val s = spark
    val in = tmpDir("stateful_in")
    // one point per series per file so within-batch iteration order can't
    // affect the disorder count; files process in modification-time order
    Seq(Datapoint("a", 100L, None, 1.0, 1), Datapoint("b", 100L, None, 10.0, 2))
      .toDF().write.parquet(s"$in/p1")
    Thread.sleep(1100)
    Seq(Datapoint("a", 200L, None, 2.0, 3), Datapoint("b", 300L, None, 20.0, 4))
      .toDF().write.parquet(s"$in/p2")
    Thread.sleep(1100)
    Seq(Datapoint("a", 150L, None, 4.0, 5)) // late for a (max was 200)
      .toDF().write.parquet(s"$in/p3")

    val schema = Seq.empty[Datapoint].toDF().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/p*").as[Datapoint]
    val out = StatefulOps.runningSeriesStats(stream)
    val q = out.writeStream.format("memory").queryName("stateful")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("stateful_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000L)

    val last = spark.table("stateful")
      .as[StatefulOps.SeriesUpdate].collect()
      .groupBy(_.series).map { case (k, v) => k -> v.maxBy(_.count) }
    assert(last("a").count == 3 && last("a").outOfOrder == 1 && last("a").sum == 7.0)
    assert(last("b").count == 2 && last("b").outOfOrder == 0 && last("b").maxTs == 300L)
  }

  test("q_stream_state final cumulative state == plain batch aggregate (sf0.001)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val streamed = SparkEntry.queries("q_stream_state")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    val batch = graft.model.Canon.events(spark, sf)
      .groupBy("series")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_v"),
        round(sum("value") / count(lit(1)), 6).as("mean_v"),
        max("ts_us").as("max_ts"))
      .orderBy("series")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(streamed == batch, s"stream:\n$streamed\nbatch:\n$batch")
  }
}
