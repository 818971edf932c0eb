package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: winnowing join fan-in at a given SF — how many candidate
  * join rows feed the pair-count aggregation, and where the df mass sits.
  * `sbt "runMain graft.tools.WinnowProbe [sfDir]"`.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fps = graft.operators.TextOps.winnowingFingerprints(docs)
      .select(col("doc_id").as("id"), explode(col("fingerprints")).as("fp"))
      .cache()
    println(s"[probe] fp rows: ${fps.count()}")
    val dfreq = fps.groupBy("fp").agg(count(lit(1)).as("df")).cache()
    println(s"[probe] distinct fps: ${dfreq.count()}")
    // df histogram + join-row mass Σ df·(df-1)/2 per df band
    dfreq.withColumn("band",
        when(col("df") === 1, "1").when(col("df") <= 5, "2-5")
        .when(col("df") <= 20, "6-20").when(col("df") <= 50, "21-50")
        .otherwise(">50 (capped)"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_fps"),
        sum(col("df") * (col("df") - 1) / 2).as("pair_rows"))
      .orderBy("band").show(false)
    // per-doc fp counts
    fps.groupBy("id").agg(count(lit(1)).as("n"))
      .agg(min("n"), expr("percentile(n, array(0.5, 0.9, 0.99))"), max("n")).show(false)
    val t0 = System.nanoTime()
    val rare = dfreq.filter(col("df") <= 50).select("fp")
    val pruned = fps.join(rare, Seq("fp"))
    val joined = pruned.select(col("id").as("id_a"), col("fp"))
      .join(pruned.select(col("id").as("id_b"), col("fp").as("fp_b")),
        col("fp") === col("fp_b") && col("id_a") < col("id_b"))
    println(s"[probe] candidate join rows (df<=50): ${joined.count()}  (${(System.nanoTime()-t0)/1e9}s)")
    val t1 = System.nanoTime()
    val agg = joined.groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
    println(s"[probe] distinct pairs: ${agg.count()}  (${(System.nanoTime()-t1)/1e9}s)")
    println(s"[probe] pairs >= 3 shared: ${agg.filter(col("n_shared") >= 3).count()}")
    spark.stop()
  }
}
