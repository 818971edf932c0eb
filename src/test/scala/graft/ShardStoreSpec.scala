package graft

import graft.model.Canon.{Datapoint, TagEntry}
import graft.operators.{TimeSeries => TS}
import graft.sources.ShardStore

/** Storage layout: roundtrip fidelity + pruning actually reaching the scan.
  * The pruning assertions are the scale contract: at 100 TB the query must
  * read only the partitions/row-groups its predicate names (SURVEY §4).
  */
class ShardStoreSpec extends SparkSuite {
  import spark.implicits._

  private val DAY_US = 86400000000L

  lazy val data = (0 until 1000).map { i =>
    Datapoint(if (i % 2 == 0) "alpha" else "beta",
      1704067200000000L + i * (DAY_US / 100), // 10 days of data
      Some(Seq(TagEntry("k", (i % 7).toString))),
      i.toDouble, i.toLong)
  }

  lazy val store: String = {
    val p = tmpDir("shardstore")
    ShardStore.append(data.toDF(), p)
    p
  }

  test("roundtrip preserves every row and the canonical schema") {
    val back = ShardStore.read(spark, store)
    assert(back.count() == 1000)
    assert(back.columns.toSeq == Seq("series", "ts_us", "tag", "value", "rid"))
    val row = back.filter($"rid" === 13L)
      .selectExpr("series", "ts_us", "tag[0].value", "value").head()
    assert(row.getString(0) == "beta" && row.getString(2) == "6")
  }

  test("partition layout is series=/day= (the interval-index analog)") {
    val dirs = new java.io.File(store).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("series=alpha", "series=beta"))
    val days = new java.io.File(s"$store/series=alpha").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(days.length >= 10 && days.forall(_.startsWith("day=")))
  }

  test("range read prunes partitions and pushes ts filter to the scan") {
    val q = ShardStore.readRange(spark, store, Seq("alpha"),
      1704067200000000L + 2 * DAY_US, 1704067200000000L + 3 * DAY_US)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("PushedFilters") && plan.contains("ts_us"), plan)
    // correctness of the pruned read
    val viaStore = q.select("rid").as[Long].collect().toSet
    val viaMemory = TS.readRange(data.toDF(), Seq("alpha"),
      1704067200000000L + 2 * DAY_US, 1704067200000000L + 3 * DAY_US)
      .select("rid").as[Long].collect().toSet
    assert(viaStore == viaMemory)
  }

  test("append twice = bag union (late data lands without rewrites)") {
    val p = tmpDir("shardstore2")
    ShardStore.append(data.take(10).toDF(), p)
    ShardStore.append(data.take(10).toDF(), p)
    assert(ShardStore.read(spark, p).count() == 20)
  }

  test("rewrite (delete path) drops matched rows from the store") {
    val p = tmpDir("shardstore3")
    ShardStore.append(data.take(100).toDF(), p)
    val survivors = TS.deleteRange(ShardStore.read(spark, p), Seq("alpha"),
      1704067200000000L, 1704067200000000L + DAY_US)
    ShardStore.rewrite(survivors, p + "_v2")
    val back = ShardStore.read(spark, p + "_v2")
    assert(back.filter($"series" === "alpha").count() < 50)
    assert(back.filter($"series" === "beta").count() == 50)
  }
}
