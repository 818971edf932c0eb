package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("q_text_pack", "q_moving_avg", "q_ntile_quality", "q_sessionize_hotkey");
         i <- 1 to 3) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.coalesce(1).write.mode("overwrite").parquet("/tmp/packprobe_out")
      val n = spark.read.parquet("/tmp/packprobe_out").count()
      val h = spark.read.parquet("/tmp/packprobe_out").collect().map(_.toString).sorted.mkString.hashCode
      println(s"[pack] $q run$i rows=$n hash=$h")
    }
    spark.stop()
  }
}
