package graft

import org.apache.spark.sql.functions._

/** Evidence for the "co-partitions with an id-bucketed layout" claims in
  * the operator scaladocs (topKOverIds, Events, Dedup): when the
  * documents/embeddings tables are written BUCKETED on the join id, the
  * id joins and semi-joins plan with NO shuffle exchange on the bucketed
  * sides — at 100 TB that is the difference between an id-only shuffle
  * per query and none at all. Auto-broadcast is disabled inside the test:
  * at 100 TB neither side broadcasts, and with broadcast available the
  * planner (correctly) ignores bucketing at toy scale. Bucketing is the
  * production layout story; the parquet-path tests elsewhere cover the
  * unbucketed case.
  */
class BucketedLayoutSpec extends SparkSuite {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count()
    // AQE's toString prints Final AND Initial plans; assert on Final only
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("bucketed doc/embedding tables join with zero shuffle exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumnRenamed("vec_id", "doc_id")
    // the PRODUCTION writer/reader, not a test-local saveAsTable
    graft.sources.ShardStore.writeBucketed(docs, "graft_docs_b", "doc_id", 8)
    graft.sources.ShardStore.writeBucketed(embs, "graft_embs_b", "doc_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = graft.sources.ShardStore.readBucketed(spark, "graft_docs_b")
      val e = graft.sources.ShardStore.readBucketed(spark, "graft_embs_b")
      // inner join on the bucket key: both sides scan their buckets
      // directly — no exchange before the join (the groupBy downstream
      // still aggregates, which is its own business)
      val joined = d.join(e, Seq("doc_id"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
      val p = finalPlan(joined)
      val joinSection = p.split("HashAggregate").last // below the aggs
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"), p)
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      // semi-join (the filtered-vector-search shape) — same property
      val semi = e.join(d.filter(col("lang") === "en").select("doc_id"),
        Seq("doc_id"), "left_semi")
      val ps = finalPlan(semi)
      assert(!ps.contains("Exchange"), s"bucketed semi-join shuffles:\n$ps")
      // and results match the unbucketed computation
      assert(semi.count() ==
        embs.join(docs.filter(col("lang") === "en").select("doc_id"),
          Seq("doc_id"), "left_semi").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
      spark.sql("DROP TABLE IF EXISTS graft_embs_b")
    }
  }
}
