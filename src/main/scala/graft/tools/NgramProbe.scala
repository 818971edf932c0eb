package graft.tools

import graft.model.Canon
import graft.operators.{Dedup, TextOps}
import graft.GraftSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the prefix-filtered jaccard pipeline at sf0.1
  * (mirrors the CURRENT hashed + positional-filtered Dedup.ngramJaccardPairs;
  * keep in sync when that pipeline changes).
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Canon.documents(spark, args.headOption.getOrElse("/root/testdata/sf0.1"))
    val tau = 0.6

    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[ngram] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    val sets = docs.select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), Dedup.shinglesFromTokens(col("toks"), 3).as("ssh"))
      .select(col("id"), array_sort(transform(col("ssh"), s => xxhash64(s))).as("sh"))
      .cache()
    t("shingle_sets (cached)")(sets.count())
    val freq = sets.select(explode(col("sh")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("f")).cache()
    t("global_freq (cached)")(freq.count())
    val exploded = sets.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("f").asc, col("shingle").asc)
    val ranked = exploded.join(freq, Seq("shingle")).withColumn("pos", row_number().over(w))
    val prefixes = ranked.filter(
      col("pos") <= col("n_sh") - ceil(col("n_sh") * tau) + 1).cache()
    t("rank+prefix (cached)")(prefixes.count())
    val joined = prefixes.select(col("id").as("id_a"), col("n_sh").as("n_a"),
        col("shingle"), col("pos").as("pos_a"))
      .join(prefixes.select(col("id").as("id_b"), col("n_sh").as("n_b"),
          col("shingle").as("shingle_b"), col("pos").as("pos_b")),
        col("shingle") === col("shingle_b") && col("id_a") < col("id_b") &&
        col("n_b") >= col("n_a") * tau && col("n_a") >= col("n_b") * tau)
    t("prefix_join (raw matches)")(joined.count())
    val cand = joined
      .groupBy("id_a", "id_b")
      .agg(min(col("pos_a")).as("ia"), min(col("pos_b")).as("jb"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(lit(1) + least(col("n_a") - col("ia"), col("n_b") - col("jb")) >=
        ceil((col("n_a") + col("n_b")) * tau / (1 + tau)))
      .select("id_a", "id_b").cache()
    t("candidates (cached)")(cand.count())
    val verified = cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayExpressions
          .sorted_intersect_count(col("sh_a"), col("sh_b")).as("c"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
    t("verify")(verified.count())
    spark.stop()
  }
}
