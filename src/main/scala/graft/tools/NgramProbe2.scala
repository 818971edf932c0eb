package graft.tools

import graft.model.Canon
import graft.operators.{Dedup, TextOps}
import graft.GraftSession
import org.apache.spark.sql.functions._

/** UNCACHED cumulative timings: each stage recomputes its ancestors, so
  * stage deltas isolate true incremental cost including Catalyst's
  * inferred-filter duplication at scans.
  */
object NgramProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Canon.documents(spark, dir)
    val tau = 0.6

    def t(name: String)(f: => Long): Unit = {
      f // warm codegen
      val t0 = System.nanoTime(); val n = f
      println(f"[ngram2] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    val sets = docs.select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), Dedup.shinglesFromTokens(col("toks"), 3).as("ssh"))
      .select(col("id"), array_sort(transform(col("ssh"), s => xxhash64(s))).as("sh"))
    t("sets")(sets.count())
    t("sets.explode")(sets.select(explode(col("sh"))).count())
    val full = Dedup.ngramJaccardPairs(docs, 3, 0.6)
    t("FULL query")(full.count())
    spark.stop()
  }
}
