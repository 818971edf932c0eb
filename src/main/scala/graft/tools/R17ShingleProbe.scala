package graft.tools

import graft.model.Canon
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 dedup-kernel attribution (DIAGNOSTIC ONLY — VERDICT r16 item 7):
  * the per-doc hashed-shingle pass runs in the SCAN stage, whose
  * parallelism is the input split count — documents.parquet at sf0.1 is
  * one 584 KB file, i.e. ONE task computes every shingle set while 31
  * cores idle. This probe times the shingle projection (noop sink) and
  * a representative whole kernel (ngramJaccardPairs) over the as-is
  * scan vs an input-size-derived repartition, at ×1 and ×4 volume, to
  * decide whether a byte-volume repartition before the explode is a
  * real win or noise. `sbt "runMain graft.tools.R17ShingleProbe"`.
  */
object R17ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warmup (codegen/JIT)
      val ts = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        graft.CacheLedger.scoped { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      }
      println(f"[shingle] $label%-52s min ${ts.min}%.2f med ${ts.sorted.apply(2)}%.2f")
      System.out.flush()
    }

    val docs1 = Canon.documents(spark, sfDir)
    // ×4 copy staged as ONE file (the contract-roster arrival shape)
    val dir4 = java.nio.file.Files.createTempDirectory("r17_shingle_x4_").toString
    (0 until 4).map(i => docs1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionByName _).coalesce(1)
      .write.mode("overwrite").parquet(dir4)
    val docs4 = spark.read.parquet(dir4)

    def shingles(df: DataFrame): DataFrame = df.select(col("doc_id").as("id"),
      graft.functions.SketchExpressions.hashed_shingles(col("text"), 3).as("sh"))

    for ((label, df) <- Seq(("x1 (one 584KB file)", docs1), ("x4 (one file)", docs4))) {
      println(s"[shingle] --- $label: scan partitions = ${df.rdd.getNumPartitions}")
      time(s"$label shingle pass, as-is scan")(noop(shingles(df)))
      time(s"$label shingle pass, repartition(cores) first")(
        noop(shingles(df.repartition(spark.sparkContext.defaultParallelism))))
      time(s"$label full ngramJaccardPairs, as-is")(
        noop(graft.operators.Dedup.ngramJaccardPairs(df, n = 3, tau = 0.6)))
      time(s"$label full ngramJaccardPairs, repartitioned input")(
        noop(graft.operators.Dedup.ngramJaccardPairs(
          df.repartition(spark.sparkContext.defaultParallelism), n = 3, tau = 0.6)))
    }
    spark.stop()
  }
}
