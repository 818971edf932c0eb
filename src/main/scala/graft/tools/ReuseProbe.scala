package graft.tools
import graft.GraftSession
object ReuseProbe {
  def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case c: InMemoryTableScanExec => flatten(c.relation.cachedPlan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case other                    => other.children.flatMap(flatten)
    })
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    for (n <- Seq("q_ntile_quality", "q_moving_avg")) {
      val qe = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").queryExecution
      qe.toRdd.count()
      val nodes = flatten(qe.executedPlan)
      val scans = nodes.filter(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      val unique = scans.map(System.identityHashCode).distinct
      println(s"[reuse] $n scanNodes=${scans.size} uniqueScanObjects=${unique.size}")
    }
    spark.stop()
  }
}
