package graft.tools

import graft.model.Canon
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 helper (DIAGNOSTIC ONLY): stage a ×MULT self-multiplied copy of
  * documents/events into a directory, multi-part, for running R16AB at
  * larger effective volume (the Bench scale tier's staging, standalone).
  * `sbt "runMain graft.tools.R17ScaleStage <mult> <outDir> [sfDir]"`.
  */
object R17ScaleStage {
  def main(args: Array[String]): Unit = {
    val mult = args(0).toInt
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until mult).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionByName _).repartition(parts)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until mult).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _).repartition(parts)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"[scalestage] x$mult -> $out")
    spark.stop()
  }
}
