package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** r16 A/B harness: run named queries N times each under the bench
  * session config (clearCache + ledger scope per rep, count sink) and
  * print every sample — for isolating one change's effect from host
  * window noise. `sbt "runMain graft.tools.R16AB <q1,q2> <reps> [sfDir]"`.
  */
object R16AB {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = args(1).toInt
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    // warmup (codegen/JIT + fixture staging)
    names.foreach { n => graft.CacheLedger.scoped {
      SparkEntry.queries(n)(spark, sfDir).count() } }
    for (n <- names) {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        graft.CacheLedger.scoped {
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
      }
      println(f"[ab] $n%-24s min ${ts.min}%.2f med ${ts.sorted.apply(reps / 2)}%.2f " +
        s"samples ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
