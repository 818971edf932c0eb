package graft

import graft.functions.Tags
import graft.model.Canon
import graft.operators.{TimeSeries => TS}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one named query per implemented operator (SURVEY.md §2),
  * each with equivalent DuckDB SQL in [[SparkEntry.oracleSql]].
  *
  * Oracle-determinism rules used throughout (see SURVEY §7.5 #10):
  *  - timestamps surface as epoch-µs BIGINT (`ts_us`) on both sides;
  *  - every result is totally ordered (unique tiebreak column);
  *  - aggregates over doubles are rounded (sum→4dp, mean/sd→6dp) so
  *    summation-order differences between engines can't flip the hash;
  *  - tag semantics are exercised through FILTERS (which rows survive),
  *    while outputs carry `rid` (= event_id) as row identity, so the
  *    ARRAY<STRUCT> tag column itself never needs cross-engine serialization.
  */
object SparkEntry {

  // Fixed time constants (events span 2024-01-01 .. 2024-01-30 UTC).
  private val R1 = 1704844800000000L // 2024-01-10 00:00:00 UTC in µs
  private val R2 = 1705708800000000L // 2024-01-20 00:00:00 UTC in µs
  private val SINCE = 1706140800000000L // 2024-01-25 00:00:00 UTC in µs
  private val HOUR_US = 3600000000L

  private val IDS3 = Seq("click", "error", "purchase")
  private val IDS2 = Seq("signup", "view")

  /** DuckDB mirror of Canon.canonicalizeEvents. */
  private val CANON_SQL =
    """WITH c AS (
      |  SELECT event_type AS series, epoch_us(ts) AS ts_us,
      |         json_extract_string(props, '$.k') AS tag_k,
      |         CAST(user_id % 10 AS VARCHAR) AS tag_u,
      |         value, event_id AS rid
      |  FROM events
      |)""".stripMargin

  private val ROW = "series, ts_us, value, rid"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * range read → tag filter → per-series mean/count (the reference's whole
    * pipeline, plus the group-by it lacks).
    */
  def entry(spark: SparkSession): DataFrame = {
    val df = Canon.events(spark, "/root/testdata/sf0.001")
    val ranged = TS.readRange(df, Nil, R1, R2)
    val filtered = TS.tagFilter(ranged, Seq(Tags.Group("u", Seq("1", "2", "3"), Tags.Eq)))
    filtered.groupBy("series")
      .agg(round(avg("value"), 6).as("mean"), count(lit(1)).as("n"))
      .orderBy("series")
  }

  private def ev(s: SparkSession, dir: String): DataFrame = Canon.events(s, dir)

  private def raw(df: DataFrame, asc: Boolean = false): DataFrame = {
    val sorted = if (asc) df.orderBy(col("ts_us").asc, col("rid").asc)
                 else df.orderBy(col("ts_us").desc, col("rid").desc)
    sorted.select("series", "ts_us", "value", "rid")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- Q1-Q6: point lookups & range scans (SURVEY §2.2)
    "q_last_n" -> ((s, d) => raw(TS.readLast(ev(s, d), IDS3, 50))),
    "q_latest" -> ((s, d) => raw(TS.latest(ev(s, d), Nil))),
    "q_first_n" -> ((s, d) => raw(TS.readFirst(ev(s, d), IDS3, 50), asc = true)),
    "q_earliest" -> ((s, d) => raw(TS.earliest(ev(s, d), Nil), asc = true)),
    "q_since" -> ((s, d) => raw(TS.readSince(ev(s, d), IDS2, SINCE))),
    "q_range" -> ((s, d) => raw(TS.readRange(ev(s, d), IDS3, R1, R2))),
    // ----- F1-F3: tag-filter algebra (SURVEY §2.4)
    "q_filter_equals" -> ((s, d) =>
      raw(TS.tagFilter(TS.readRange(ev(s, d), Nil, R1, R2), Seq(Tags.Group("k", Seq("42"), Tags.Eq))))),
    "q_filter_contains" -> ((s, d) =>
      raw(TS.tagFilter(TS.readSince(ev(s, d), Nil, SINCE), Seq(Tags.Group("k", Seq("4"), Tags.Contains))))),
    "q_filter_multi" -> ((s, d) =>
      raw(TS.tagFilter(TS.readRange(ev(s, d), Nil, R1, R2), Seq(
        Tags.Group("k", Seq("7", "42", "77"), Tags.Eq),
        Tags.Group("u", Seq("3", "4"), Tags.Eq))))),
    // ----- A1-A7: aggregations over a multi-series range read (SURVEY §2.5)
    "q_agg_sum" -> ((s, d) =>
      TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Sum).select(round(col("sum"), 4).as("sum"))),
    "q_agg_count" -> ((s, d) => TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Count)),
    "q_agg_max" -> ((s, d) => TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Max)),
    "q_agg_min" -> ((s, d) => TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Min)),
    "q_agg_mean" -> ((s, d) =>
      TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Mean).select(round(col("mean"), 6).as("mean"))),
    "q_agg_sd" -> ((s, d) =>
      TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Sd).select(round(col("sd"), 6).as("sd"))),
    "q_agg_median" -> ((s, d) =>
      TS.aggregate(TS.readRange(ev(s, d), IDS3, R1, R2), TS.Median).select(round(col("median"), 4).as("median"))),
    "q_filter_agg" -> ((s, d) => // filter → aggregate pipeline (xargs with agg)
      TS.aggregate(TS.tagFilter(TS.readSince(ev(s, d), Nil, SINCE), Seq(Tags.Group("u", Seq("5"), Tags.Eq))), TS.Mean)
        .select(round(col("mean"), 6).as("mean"))),
    // ----- D1: delete (surviving rows; SURVEY §2.8)
    "q_delete_range" -> ((s, d) =>
      raw(TS.deleteRange(ev(s, d), IDS2, R1, R2)).orderBy(col("rid"))),
    // ----- U2/I1/I5/I6: metadata (SURVEY §2.7/§2.9)
    "q_names" -> ((s, d) => TS.names(ev(s, d))),
    "q_length" -> ((s, d) => TS.length(ev(s, d), IDS3)),
    "q_stats" -> ((s, d) => TS.stats(ev(s, d))),
    "q_index_info" -> ((s, d) => TS.indexInfo(ev(s, d))),
    // ----- beyond parity: group-by + time-window generalizations
    "q_agg_by_series" -> ((s, d) =>
      TS.aggregateBySeries(ev(s, d), TS.Mean).select(col("series"), round(col("mean"), 6).as("mean"))),
    "q_window_hourly" -> ((s, d) =>
      TS.windowAggregate(TS.readRange(ev(s, d), IDS3, R1, R2), HOUR_US, TS.Sum)
        .select(col("series"), col("bucket_us"), round(col("sum"), 4).as("sum")))
  )

  def oracleSql: Map[String, String] = {
    val idsIn3 = "series IN ('click','error','purchase')"
    val idsIn2 = "series IN ('signup','view')"
    val range = s"ts_us BETWEEN $R1 AND $R2"
    Map(
      "q_last_n" ->
        s"""$CANON_SQL SELECT $ROW FROM (
           |  SELECT *, row_number() OVER (PARTITION BY series ORDER BY ts_us DESC, rid DESC) AS rn
           |  FROM c WHERE $idsIn3) t
           |WHERE rn <= 50 ORDER BY ts_us DESC, rid DESC""".stripMargin,
      "q_latest" ->
        s"""$CANON_SQL SELECT $ROW FROM (
           |  SELECT *, row_number() OVER (PARTITION BY series ORDER BY ts_us DESC, rid DESC) AS rn
           |  FROM c) t
           |WHERE rn <= 1 ORDER BY ts_us DESC, rid DESC""".stripMargin,
      "q_first_n" ->
        s"""$CANON_SQL SELECT $ROW FROM (
           |  SELECT *, row_number() OVER (PARTITION BY series ORDER BY ts_us ASC, rid ASC) AS rn
           |  FROM c WHERE $idsIn3) t
           |WHERE rn <= 50 ORDER BY ts_us ASC, rid ASC""".stripMargin,
      "q_earliest" ->
        s"""$CANON_SQL SELECT $ROW FROM (
           |  SELECT *, row_number() OVER (PARTITION BY series ORDER BY ts_us ASC, rid ASC) AS rn
           |  FROM c) t
           |WHERE rn <= 1 ORDER BY ts_us ASC, rid ASC""".stripMargin,
      "q_since" ->
        s"$CANON_SQL SELECT $ROW FROM c WHERE $idsIn2 AND ts_us >= $SINCE ORDER BY ts_us DESC, rid DESC",
      "q_range" ->
        s"$CANON_SQL SELECT $ROW FROM c WHERE $idsIn3 AND $range ORDER BY ts_us DESC, rid DESC",
      "q_filter_equals" ->
        s"$CANON_SQL SELECT $ROW FROM c WHERE $range AND tag_k = '42' ORDER BY ts_us DESC, rid DESC",
      "q_filter_contains" ->
        s"$CANON_SQL SELECT $ROW FROM c WHERE ts_us >= $SINCE AND contains(tag_k, '4') ORDER BY ts_us DESC, rid DESC",
      "q_filter_multi" ->
        s"""$CANON_SQL SELECT $ROW FROM c
           |WHERE $range AND tag_k IN ('7','42','77') AND tag_u IN ('3','4')
           |ORDER BY ts_us DESC, rid DESC""".stripMargin,
      "q_agg_sum" ->
        s"""$CANON_SQL SELECT round(sum(value), 4) AS "sum" FROM c WHERE $idsIn3 AND $range""",
      "q_agg_count" ->
        s"""$CANON_SQL SELECT CAST(count(*) AS DOUBLE) AS "count" FROM c WHERE $idsIn3 AND $range""",
      "q_agg_max" ->
        s"""$CANON_SQL SELECT max(value) AS "max" FROM c WHERE $idsIn3 AND $range""",
      "q_agg_min" ->
        s"""$CANON_SQL SELECT min(value) AS "min" FROM c WHERE $idsIn3 AND $range""",
      "q_agg_mean" ->
        s"$CANON_SQL SELECT round(avg(value), 6) AS mean FROM c WHERE $idsIn3 AND $range",
      "q_agg_sd" ->
        s"$CANON_SQL SELECT round(stddev_samp(value), 6) AS sd FROM c WHERE $idsIn3 AND $range",
      "q_agg_median" ->
        s"""$CANON_SQL SELECT round(median(value), 4) AS "median" FROM c WHERE $idsIn3 AND $range""",
      "q_filter_agg" ->
        s"$CANON_SQL SELECT round(avg(value), 6) AS mean FROM c WHERE ts_us >= $SINCE AND tag_u = '5'",
      "q_delete_range" ->
        s"$CANON_SQL SELECT $ROW FROM c WHERE NOT ($idsIn2 AND $range) ORDER BY rid",
      "q_names" ->
        s"$CANON_SQL SELECT DISTINCT series FROM c ORDER BY series",
      "q_length" ->
        s"$CANON_SQL SELECT count(*) AS length FROM c WHERE $idsIn3",
      "q_stats" ->
        s"$CANON_SQL SELECT series, count(*) AS length FROM c GROUP BY series ORDER BY series",
      "q_index_info" ->
        s"""$CANON_SQL SELECT series, min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us,
           |count(*) AS length FROM c GROUP BY series ORDER BY series""".stripMargin,
      "q_agg_by_series" ->
        s"$CANON_SQL SELECT series, round(avg(value), 6) AS mean FROM c GROUP BY series ORDER BY series",
      "q_window_hourly" ->
        s"""$CANON_SQL SELECT series, (ts_us // $HOUR_US) * $HOUR_US AS bucket_us,
           |round(sum(value), 4) AS "sum" FROM c WHERE $idsIn3 AND $range
           |GROUP BY series, bucket_us ORDER BY series, bucket_us""".stripMargin
    )
  }
}
