package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  test("streaming content dedup == batch exact dedup (one survivor per distinct text)") {
    // stream the real documents table through a file source; synthesize an
    // event time (the table has none) so the watermark has a clock
    val src = "/root/testdata/sf0.001/documents.parquet"
    val dir = tmpDir("stream_docs")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("event_time", timestamp_micros(lit(1704844800000000L) + col("doc_id")))
    val q = StreamDedup.dedupByContent(stream, "event_time").writeStream
      .format("memory").queryName("dedup_stream").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("dedup_stream")
      .select("content_hash").as[String].collect()

    // batch truth: one survivor per distinct content hash. WHICH duplicate
    // survives the stream is arrival-order-dependent, so compare the hash
    // set and its cardinality, not survivor ids.
    val batch = spark.read.parquet(src)
      .select(md5(col("text")).as("content_hash"))
      .distinct().as[String].collect()
    assert(streamed.length == streamed.distinct.length) // no dup passed through
    assert(streamed.toSet == batch.toSet)
    assert(streamed.nonEmpty)
  }

  test("within-watermark duplicates COLLAPSE: 2x-staged corpus emits each hash once") {
    // the corpus itself has no exact duplicates — stage it twice so the
    // stream really carries one duplicate per document
    val src = "/root/testdata/sf0.001/documents.parquet"
    val dir = tmpDir("stream_docs_2x")
    for (c <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.copy(java.nio.file.Paths.get(src),
        java.nio.file.Paths.get(s"$dir/$c"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("event_time", timestamp_micros(lit(1704844800000000L) + col("doc_id")))
    val q = StreamDedup.dedupByContent(stream, "event_time").writeStream
      .format("memory").queryName("dedup_stream_2x").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("dedup_stream_2x")
      .select("content_hash").as[String].collect()
    val n = spark.read.parquet(src).count()
    assert(streamed.length == n, s"expected $n survivors, got ${streamed.length}")
    assert(streamed.distinct.length == streamed.length)
  }
}
