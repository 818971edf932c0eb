package graft.tools

import graft.GraftSession

/** Dev helper: print the executed plan of one SparkEntry query (arg 1)
  * at the given sf dir (arg 2), plus exchange-reuse statistics.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_ngram")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.count() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    println(p.take(20000))
    Seq("Exchange", "ReusedExchange", "Scan parquet", "WindowExec", "Window ").foreach { k =>
      println(s"[peek] $k -> ${k.r.findAllIn(p).size}")
    }
  }
}
