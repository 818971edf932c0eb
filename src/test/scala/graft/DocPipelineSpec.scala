package graft

import graft.streaming.DocPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class DocPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("streaming curation == batch parse + quality gate + dedup") {
    // build a JSONL file from the real documents table, with some junk
    // lines and an exact duplicate injected
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    val lines = src.select(to_json(struct(
        col("doc_id").as("id"), col("text"), col("lang"), col("source"))).as("line"))
      .as[String].collect().toSeq
    val withJunk = lines ++ Seq(lines.head, "{not json", """{"text": ""}""")
    val dir = tmpDir("jsonl_stream")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      withJunk.mkString("\n").getBytes("UTF-8"))

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .text(dir)
      .select(col("value").as("line"))
      .withColumn("event_time", timestamp_micros(lit(1704844800000000L)))
    val q = DocPipeline.curate(stream, "event_time", minQuality = 0.5)
      .writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("curated_stream")

    // batch truth over the same lines: parse, gate, exact-dedup by text
    val batchParsed = graft.sources.JsonlDocs.fromLines(withJunk.toDF("line"))
    val batchGood = graft.operators.TextOps.withQuality(batchParsed.good)
      .filter(col("quality") >= 0.5)
      .dropDuplicates("text")
    assert(streamed.count() == batchGood.count())
    assert(streamed.select("text").as[String].collect().toSet ==
      batchGood.select("text").as[String].collect().toSet)
    // stream carries the canonical columns + quality + the time column
    assert(streamed.columns.toSet ==
      Set("doc_id", "text", "lang", "source", "n_chars", "event_time", "quality"))
    // quarantine path on the batch side sees exactly the junk
    assert(batchParsed.bad.count() == 2)
  }
}
