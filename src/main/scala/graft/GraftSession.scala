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
      // plan STRINGS must stay bounded however large a composed plan
      // grows (wide unions, literal-bearing model tables): the default is
      // effectively unbounded and building a cache name / explain dump
      // for a pathological plan can OOM the driver before any task runs.
      // 8 MB keeps every legitimate dump (PLANS.md's largest is ~100 KB)
      // and truncates the pathological case instead of crashing.
      .config("spark.sql.maxPlanStringLength", (8 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build + register SQL functions. */
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    Graft.register(spark)
    spark
  }
}
