package graft.tools

import graft.GraftSession
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence probe for the native text-signal expressions: times the
  * quality + langid pass in its NATIVE form (TextSignalExpressions byte
  * scans) against the pre-round-4 HOF formulation (materialized token
  * arrays + interpreted per-token lambdas) on a ×MULT self-multiplied
  * documents corpus, and asserts the two produce identical rows.
  * `sbt "runMain graft.tools.SignalProbe [mult]"`.
  */
object SignalProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.model.Canon.documents(spark, "/root/testdata/sf0.1")
    val docs = (0 until mult).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _).cache()
    docs.count()

    // the pre-native formulation, verbatim from the old quality()
    def qualityHof(df: DataFrame): DataFrame = {
      val staged = df.select(col("doc_id"), col("text").as("__t"),
        TextOps.tokens(col("text")).as("__toks"),
        TextOps.tokens(lower(col("text"))).as("__ltoks"))
      val t = col("__t")
      val toks = col("__toks")
      staged.select(
        col("doc_id"),
        length(t).as("n_chars"),
        size(toks).as("n_tokens"),
        round(length(regexp_replace(t, TextOps.wsClass + "+", "")).cast("double") /
          greatest(size(toks), lit(1)), 4).as("mean_token_len"),
        round(TextOps.punctCount(t).cast("double") / greatest(length(t), lit(1)), 6).as("punct_ratio"),
        round(size(filter(col("__ltoks"), x => x.isin(TextOps.englishStopwords: _*))).cast("double") /
          greatest(size(toks), lit(1)), 6).as("stopword_ratio"))
    }

    // force EVERY signal column to evaluate — a bare count() lets
    // Catalyst prune the computed columns and times the scan alone
    def sink(df: DataFrame): Long =
      df.agg(sum("n_tokens"), sum(length(col("mean_token_len").cast("string"))),
        sum("punct_ratio"), sum("stopword_ratio")).collect()
        .length.toLong
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both plan shapes, then min of two timed runs each
    sink(TextOps.quality(docs)); sink(qualityHof(docs))
    val native = math.min(time(sink(TextOps.quality(docs))),
      time(sink(TextOps.quality(docs))))
    val hof = math.min(time(sink(qualityHof(docs))), time(sink(qualityHof(docs))))
    println(f"[signal] quality ${mult}x: native=$native%6.2fs hof=$hof%6.2fs speedup=${hof / native}%4.1fx")

    // bit-equality of every signal row (both directions)
    val a = TextOps.quality(docs)
    val b = qualityHof(docs)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[signal] row diff (exceptAll both ways): $diff")
    require(diff == 0, "native and HOF quality disagree")

    def langSink(df: DataFrame): Long =
      df.agg(sum(length(col("lang")))).collect().length.toLong
    val lang = math.min(time(langSink(TextOps.langId(docs))),
      time(langSink(TextOps.langId(docs))))
    println(f"[signal] langid ${mult}x: native=$lang%6.2fs")
    spark.stop()
  }
}
