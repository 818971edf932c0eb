package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: 3-gram shingle doc-frequency distribution on documents, and
  * the containment candidate fan-in with/without a B-side df cap.
  * `sbt "runMain graft.tools.ContainProbe [sfDir]"`.
  */
object ContainProbe {
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
    val sets = docs.select(col("doc_id").as("id"),
      graft.functions.SketchExpressions.hashed_shingles(col("text"), 3).as("sh"))
    val fps = sets.select(col("id"), explode(col("sh")).as("shingle")).cache()
    val dfreq = fps.groupBy("shingle").agg(count(lit(1)).as("df")).cache()
    println(s"[probe] shingle rows=${fps.count()} distinct=${dfreq.count()}")
    dfreq.agg(max("df"), expr("percentile(df, array(0.5,0.9,0.99,0.999))")).show(false)
    // prefix elements (t=0.7) and their df: what actually enters the join
    val t = 0.7
    val exploded = sets.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("shingle").asc)
    val ranked = exploded.join(dfreq, Seq("shingle"))
      .withColumn("pos", row_number().over(w))
    val prefixes = ranked.filter(col("pos") <= col("n_sh") - ceil(col("n_sh") * t) + 1).cache()
    println(s"[probe] prefix rows=${prefixes.count()}")
    prefixes.agg(max("df"), expr("percentile(df, array(0.5,0.9,0.99,0.999))")).show(false)
    // candidate join rows = sum over prefix rows of df (B postings joined)
    prefixes.agg(sum("df").as("cand_rows_upper")).show(false)
    spark.stop()
  }
}
