package graft.tools

import graft.{Graft, GraftSession}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** One-off measurement of residual-PQ recall by level on the near-uniform
  * sf0.001 embeddings (the PQ worst case) — the numbers behind the
  * pqTopK `levels` default and the RecallGateSpec uniform floor. */
object PqLevelsProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    Graft.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val qids = (0L until 500L by 23L).take(20)
    val brute = Similarity.bruteForceTopK(emb, qids, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    def recall(lv: Int, refine: Int): (Double, Double) = {
      val got = Similarity.pqTopK(emb, qids, k = 10, refine = refine, levels = lv)
        .select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
      val rs = brute.keys.toSeq.map(q =>
        got.getOrElse(q, Set.empty[Long]).count(brute(q)).toDouble / 10)
      (rs.sum / rs.size, rs.min)
    }
    for (lv <- 1 to 3; refine <- Seq(10, 50)) {
      val (mean, min) = recall(lv, refine)
      println(f"[pqprobe] levels=$lv refine=$refine mean=$mean%.3f min=$min%.3f")
    }
    spark.stop()
  }
}
