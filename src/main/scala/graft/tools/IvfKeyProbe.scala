package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the IVF centroid DISK key hash and whether the
  * persisted centroid cache was hit. Run TWICE (two JVMs) — the hashes
  * must match and the second run must report fits=0, or the cross-JVM
  * cache is broken (the r3 review found semanticHash embeds a per-JVM
  * class identity hash). `sbt "runMain graft.tools.IvfKeyProbe"`.
  */
object IvfKeyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dk = graft.operators.Similarity.centroidDiskKey(emb, 8, 10, 424242L, "embedding")
    val before = graft.operators.Similarity.kmeansFits.get()
    graft.operators.Similarity.trainCellsCached(emb, 8, seed = 424242L)
    println(s"[ivfkey] path=${graft.operators.Similarity.centroidCachePath(dk)}")
    println(s"[ivfkey] fits_this_run=${graft.operators.Similarity.kmeansFits.get() - before}")
    spark.stop()
  }
}
