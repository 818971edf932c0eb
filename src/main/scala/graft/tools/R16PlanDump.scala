package graft.tools

import java.nio.file.{Files, Paths}

/** r16 evidence dumper: `.explain("formatted")` of named queries, one
  * file per query, executed first so AQE's final choices are shown.
  * `sbt "runMain graft.tools.R16PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]"`.
  */
object R16PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    names.foreach { name =>
      graft.CacheLedger.scoped {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        df.queryExecution.toRdd.count() // finalize AQE on THIS QueryExecution
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump16] $name -> ${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
