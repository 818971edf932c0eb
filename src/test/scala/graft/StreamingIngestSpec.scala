package graft

import graft.sources.ShardStore
import graft.streaming.Ingest
import org.apache.spark.sql.streaming.Trigger

/** S1/S3/S6: streaming ingest — file stream → validate → partitioned store. */
class StreamingIngestSpec extends SparkSuite {

  test("file stream ingests wire json into the shard store exactly once") {
    val in = tmpDir("stream_in")
    val store = tmpDir("stream_store")
    val ckpt = tmpDir("stream_ckpt")
    val lines = (1 to 50).map { i =>
      s"""{"series": "s${i % 3}", "point": {"timestamp": ${1704067200000000L + i}, "value": $i}}"""
    } :+ """{"series": "bad", "point": {"nope": 1}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/batch0.jsonl"),
      lines.mkString("\n").getBytes)

    val q = Ingest.startFileStream(spark, in, store, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000L)

    val back = ShardStore.read(spark, store)
    assert(back.count() == 50) // invalid row quarantined, not stored
    assert(back.select("series").distinct().count() == 3)
    val sums = back.groupBy().sum("value").head().getDouble(0)
    assert(sums == (1 to 50).sum.toDouble)
  }
}
