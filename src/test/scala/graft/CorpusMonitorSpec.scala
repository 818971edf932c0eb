package graft

import graft.operators.TextOps
import graft.streaming.CorpusMonitor
import org.apache.spark.sql.streaming.Trigger

/** The streaming corpus monitor: running (source, term) counts across
  * REAL micro-batches must equal the batch counts exactly, and the
  * drift report computed from them must equal the batch report row for
  * row (the e2e form of this claim is `q_stream_drift` sharing
  * `q_drift`'s oracle verbatim).
  */
class CorpusMonitorSpec extends SparkSuite {
  import spark.implicits._

  test("streamed running term counts equal batch counts across micro-batches") {
    val src = "/root/testdata/sf0.001/documents.parquet"
    val docs = spark.read.parquet(src)
    val dir = tmpDir("stream_docs")
    // two plain files + maxFilesPerTrigger=1: state must CARRY between
    // triggers, not be rebuilt per batch
    for ((pred, name) <- Seq(
      (org.apache.spark.sql.functions.col("doc_id") % 2 === 0, "even.parquet"),
      (org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0, "odd.parquet"))) {
      val tmp = tmpDir("stream_docs_split")
      docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = CorpusMonitor.runningTermCounts(stream).writeStream
      .format("memory").queryName("termcounts").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L))

    val streamed = spark.table("termcounts")
      .as[(String, String, Long)].collect().toSet
    val batch = CorpusMonitor.runningTermCounts(docs)
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)

    // and the drift matrix over the streamed counts == the batch report
    // (materialized to a local frame: a memory-sink VIEW under the
    // matrix's self-joins trips Spark's conflicting-reference resolution;
    // the production path reads the counts back from parquet — q_stream_drift)
    val fromStream = TextOps.driftFromTermCounts(
      streamed.toSeq.toDF("src", "term", "c"), "kl", vocabSize = 8)
      .as[(String, Long, Long, Double)].collect().toSeq
    val fromBatch = TextOps.driftReport(docs, vocabSize = 8)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(fromStream == fromBatch && fromStream.nonEmpty)
  }
}
