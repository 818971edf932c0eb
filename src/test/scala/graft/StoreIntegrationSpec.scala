package graft

import graft.functions.Tags
import graft.model.Canon
import graft.operators.{TimeSeries => TS}
import graft.sources.ShardStore

/** End-to-end storage integration at sf0.1: the full events corpus through
  * the partitioned store must answer every core query identically to the
  * direct parquet read — and do it through pruned scans.
  */
class StoreIntegrationSpec extends SparkSuite {
  import spark.implicits._

  private val R1 = 1704844800000000L
  private val R2 = 1705708800000000L

  lazy val direct = Canon.events(spark, "/root/testdata/sf0.1")
  lazy val store: String = {
    val p = tmpDir("store_sf01")
    ShardStore.append(direct, p)
    p
  }

  private def viaStore = ShardStore.read(spark, store)

  test("full corpus round-trips (100k rows, 5 series, 30 day partitions)") {
    assert(viaStore.count() == direct.count())
    val days = new java.io.File(s"$store/series=click").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(days >= 29, s"$days day partitions")
  }

  test("range + tag filter + aggregate identical via store and direct") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TS.aggregate(TS.tagFilter(TS.readRange(df, Seq("click", "error"), R1, R2),
        Seq(Tags.Group("u", Seq("3"), Tags.Eq))), TS.Sum).as[Double].head()
    assert(run(viaStore) == run(direct))
  }

  test("pruned store range read touches only the partitions in range") {
    val q = ShardStore.readRange(spark, store, Seq("click"), R1, R2)
    val files = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split('\n')).mkString("\n")
    assert(q.count() == TS.readRange(direct, Seq("click"), R1, R2).count())
    val scanned = q.rdd.partitions.length // post-pruning input partitions
    assert(scanned > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"), plan)
  }

  test("per-series top-n identical via store") {
    val a = TS.readLast(viaStore, Seq("click", "view"), 20).select("rid").as[Long].collect().toSeq
    val b = TS.readLast(direct, Seq("click", "view"), 20).select("rid").as[Long].collect().toSeq
    assert(a == b)
  }
}
