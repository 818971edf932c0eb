package graft.tools

import graft.model.Canon
import graft.operators.UrlOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r16 streaming attribution (DIAGNOSTIC ONLY — no query uses these
  * variants): the q_stream_crawl shape run three ways at sf0.1 to split
  * its per-trigger cost into sink write, state-partition count, and
  * fixed micro-batch machinery. `sbt "runMain graft.tools.R16StreamProbe"`.
  */
object R16StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)

    // stage the two-file WARC split once (the q_stream_crawl input shape)
    val media = graft.sources.WarcIngest.syntheticWarcFromDocuments(
      UrlOps.syntheticUrls(Canon.documents(spark, sfDir)))
    val inDir = java.nio.file.Files.createTempDirectory("r16_stream_in_")
    for ((pred, name) <- Seq(
      (col("media_id") % 2 === 0, "warc_even.parquet"),
      (col("media_id") % 2 =!= 0, "warc_odd.parquet"))) {
      val tmp = java.nio.file.Files.createTempDirectory("r16_stream_split_")
      media.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, inDir.resolve(name))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }

    def runStream(label: String, stateParts: Option[String],
                  writeSink: Boolean): Unit = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      stateParts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      try {
        for (round <- 1 to 2) {
          val outDir = java.nio.file.Files.createTempDirectory("r16_sout_").toString
          val t0 = System.nanoTime()
          val raw = spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          val rollup = graft.streaming.CrawlIngest.domainRollup(
            graft.sources.WarcIngest.records(raw))
          val q = rollup.writeStream
            .outputMode("complete")
            .foreachBatch { (batch: DataFrame, _: Long) =>
              if (writeSink) batch.write.mode("overwrite").parquet(outDir)
              else { batch.write.format("noop").mode("overwrite").save(); () }
            }
            .trigger(Trigger.AvailableNow())
            .start()
          val fin = q.awaitTermination(300000L)
          q.stop()
          require(fin, s"$label: stream did not terminate")
          val s = (System.nanoTime() - t0) / 1e9
          if (round == 2) println(f"[stream] $label%-44s $s%8.2f s")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
      System.out.flush()
    }

    runStream("as-is (32 state parts, parquet sink)", None, writeSink = true)
    runStream("noop sink (32 state parts)", None, writeSink = false)
    runStream("4 state parts, parquet sink", Some("4"), writeSink = true)
    runStream("4 state parts, noop sink", Some("4"), writeSink = false)
    spark.stop()
  }
}
