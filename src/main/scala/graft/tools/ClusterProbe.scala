package graft.tools

import graft.GraftSession
import graft.model.Canon
import graft.operators.Dedup

/** Times duplicateClusters end-to-end, twice, with and without AQE. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Canon.documents(spark, args.headOption.getOrElse("/root/testdata/sf0.1"))
    for (aqe <- Seq("true", "false"); run <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      val n = Dedup.duplicateClusters(docs, 3, 0.6).count()
      println(f"[cc] aqe=$aqe run $run rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // forced-distributed tier (localEdges=0): pointer-jumping loop on the
    // real pair graph — must produce the identical keep-list
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val t0 = System.nanoTime()
    val dist = Dedup.duplicateClusters(docs, 3, 0.6, localEdges = 0L)
    val local = Dedup.duplicateClusters(docs, 3, 0.6)
    val diff = dist.exceptAll(local).count() + local.exceptAll(dist).count()
    println(f"[cc] distributed tier rows=${dist.count()} diff_vs_local=$diff  ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
