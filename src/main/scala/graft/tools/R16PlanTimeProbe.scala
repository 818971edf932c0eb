package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** r16: split the expensive queries' wall time into BUILD+PLAN (driver:
  * DataFrame construction, analysis, optimization, physical planning)
  * vs EXECUTE, under the bench session config. Planning is single-
  * threaded driver work — if it dominates a query here it dominates at
  * any scale. `sbt "runMain graft.tools.R16PlanTimeProbe [sfDir] [qs]"`.
  */
object R16PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq).getOrElse(Seq(
      "q_crawl_curated", "q_store_cdc", "q_tier_cdc", "q_crawl_frontier",
      "q_dedup_clusters", "q_dedup_keepers", "q_store_profile_drift",
      "q_moving_avg", "q_text_winnowing"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      // match the bench session (ADVICE r16): without the gate an
      // interpreted-fallback execution the real bench would FAIL could
      // silently skew the build-vs-execute attribution
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    // warmup: fixture staging + codegen + JIT
    names.foreach(n => graft.CacheLedger.scoped(
      SparkEntry.queries(n)(spark, sfDir).count()))
    for (n <- names) {
      val (bp, ex) = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        graft.CacheLedger.scoped {
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(spark, sfDir)
          // force analysis + optimization + physical planning (not AQE)
          df.queryExecution.executedPlan
          val t1 = System.nanoTime()
          df.count()
          val t2 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
        }
      }.minBy { case (a, b) => a + b }
      println(f"[plantime] $n%-24s build+plan ${bp}%5.2fs execute ${ex}%5.2fs")
      System.out.flush()
    }
    spark.stop()
  }
}
