package graft.tools

import graft.functions.Tags
import graft.operators.{TimeSeries => TS}
import graft.sources.ShardStore
import graft.streaming.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** End-to-end drive of the ingest→store→query pipeline (the reference's
  * POST → membuf → shard → GET lifecycle, SURVEY §3): writes wire JSON,
  * streams it into a partitioned ShardStore, then runs range + tag-filter +
  * aggregate reads against the store. `sbt "runMain graft.tools.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val in = java.nio.file.Files.createTempDirectory("demo_in").toString
    val store = java.nio.file.Files.createTempDirectory("demo_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("demo_ckpt").toString

    val t0 = 1704067200000000L
    val lines = (0 until 1000).map { i =>
      val series = Seq("cpu", "mem", "disk")(i % 3)
      val loc = (i % 4).toString
      s"""{"series": "$series", "point": {"timestamp": ${t0 + i * 180000000L}, "tag": [{"host":"h$loc"}], "value": ${i % 100}}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/points.jsonl"),
      lines.mkString("\n").getBytes)

    println(s"[demo] streaming 1000 points from $in into $store")
    val q = Ingest.startFileStream(spark, in, store, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000L)

    val df = ShardStore.read(spark, store)
    println(s"[demo] store rows=${df.count()}, partitions on disk:")
    new java.io.File(store).listFiles().filter(_.isDirectory)
      .foreach(d => println(s"  ${d.getName}"))

    println("[demo] last 3 per series:")
    TS.readLast(df, Seq("cpu", "mem", "disk"), 3).show(9, false)

    println("[demo] pruned range read (day 2 only), filter host=h1, mean:")
    val ranged = ShardStore.readRange(spark, store, Seq("cpu"),
      t0 + 86400000000L, t0 + 2 * 86400000000L - 1)
    val filtered = TS.tagFilter(ranged, Seq(Tags.Group("host", Seq("h1"), Tags.Eq)))
    TS.aggregate(filtered, TS.Mean).show()
    println("[demo] physical plan of the pruned read:")
    ranged.explain("formatted")
    spark.stop()
  }
}
