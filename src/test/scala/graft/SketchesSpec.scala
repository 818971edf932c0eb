package graft

import graft.model.Canon
import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("HLL sketches merge associatively: split-then-union == one pass, and tracks exact") {
    val ev = Canon.eventsRaw(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("series"), col("user_id"))
    // shard the corpus into 4 disjoint splits (as 4 day-partitions would),
    // sketch each independently, merge — the 100 TB query path
    val shards = (0 until 4).map(i =>
      Sketches.hllByKey(ev.filter(pmod(col("user_id"), lit(4)) === i), "series", "user_id"))
    val merged = Sketches.hllMergeEstimate(shards.reduce(_ unionByName _))
      .as[(String, Long)].collect().toMap
    // one-pass reference on the same data
    val onePass = Sketches.hllMergeEstimate(Sketches.hllByKey(ev, "series", "user_id"))
      .as[(String, Long)].collect().toMap
    assert(merged == onePass) // the sketch algebra is exactly mergeable
    // and the estimate tracks the exact distinct count within HLL error
    val exact = ev.groupBy("series").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (s, n) =>
      val est = merged(s).toDouble
      assert(math.abs(est - n) / n <= 0.05, s"$s: est $est vs exact $n")
    }
    assert(merged.nonEmpty)
  }
}
