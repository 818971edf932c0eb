package graft.tools

import graft.model.Canon
import graft.operators.Dedup
import graft.GraftSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Diagnose the intermittent multi-10s stalls seen in bench/scale runs:
  * run one query repeatedly and report wall vs GC vs JIT time per run.
  */
object StallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Canon.documents(spark, "/root/testdata/sf0.1")
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    for (i <- 1 to 6) {
      val (g0, j0, t0) = (gcMs, jitMs, System.nanoTime())
      val n = Dedup.minhashLshPairs(docs, tau = 0.6).count()
      println(f"[stall] run$i wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"gc=${(gcMs - g0) / 1000.0}%5.2fs jit=${(jitMs - j0) / 1000.0}%5.2fs rows=$n")
    }
    spark.stop()
  }
}
