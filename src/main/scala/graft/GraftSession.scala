package graft

import org.apache.spark.sql.SparkSession

/** One place for the session configuration the engine expects:
  * AQE (runtime re-plan, skew-join split, partition coalescing), UTC,
  * right-sized shuffle partitions, a codegen cache big enough for a wide
  * query library, the nanos-timestamp legacy read, and graft's SQL
  * functions registered.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build + register SQL functions. */
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    Graft.register(spark)
    spark
  }
}
