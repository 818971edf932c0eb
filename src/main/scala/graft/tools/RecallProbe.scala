package graft.tools

import graft.model.Canon
import graft.operators.Similarity
import graft.{CacheLedger, Graft, GraftSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall@k for every approximate similarity tier against the
  * brute-force exact top-k — the quality half of the ANN story (the
  * bench measures only speed; the unit specs pin recall FLOORS on tiny
  * fixtures). Runs each tier over the full sf corpus with a spread of
  * query vectors and prints mean/min recall@k plus wall time, so
  * SCALE.md can state "X% recall at Yx the brute cost" with numbers.
  *
  * Recall@k here = |approx top-k ∩ exact top-k| / k per query, averaged
  * (ties broken identically on both sides: cosine desc, id asc).
  *
  * Run: sbt "runMain graft.tools.RecallProbe [k] [nQueries] [sfDir]"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    Graft.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Canon.embeddings(spark, dir).cache()
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // deterministic spread of query ids across the corpus
    val qids = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0)).grouped(math.max(1, (n / nQ).toInt))
      .map(_.head).take(nQ).toSeq
    println(s"[recall] corpus=$n dim=$dim k=$k queries=${qids.size} sf=$dir")

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rows) =>
          q -> rows.map(_.getLong(1)).toSet
        }

    var exact: Map[Long, Set[Long]] = Map.empty
    def run(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val sets = CacheLedger.scoped { topSets(f) }
      val wall = (System.nanoTime() - t0) / 1e9
      if (name == "brute") { exact = sets
        println(f"[recall] $name%-12s wall=$wall%6.1fs (the exact baseline)")
      } else if (exact.isEmpty) {
        println(s"[recall] $name skipped: exact baseline found no query rows " +
          "(query ids absent from this corpus?)")
      } else {
        val rs = exact.keys.toSeq.map(q =>
          sets.getOrElse(q, Set.empty).count(exact(q).contains).toDouble
            / exact(q).size)
        println(f"[recall] $name%-12s wall=$wall%6.1fs recall@$k " +
          f"mean=${rs.sum / rs.size}%.3f min=${rs.min}%.3f")
      }
    }

    run("brute") { Similarity.bruteForceTopK(emb, qids, k) }
    run("lsh_ann") { Similarity.annTopK(emb, qids, k, dim) }
    run("ivf_label") { Similarity.ivfTopK(emb, qids, k) }
    run("ivf_trained") { Similarity.ivfTopKTrained(emb, qids, k, cells = 16, nprobe = 3) }
    run("pq_adc") { Similarity.pqTopK(emb, qids, k, refine = math.max(50, 5 * k)) }

    // ---- the CLUSTERED regime: the testdata embeddings are near-uniform
    // on the sphere (the structural worst case for every ANN family —
    // neighbors are barely closer than strangers), while production
    // embedding corpora are clustered, which is WHY cell/bucket methods
    // work. Same tiers over a deterministic 50-center mixture (center +
    // noise (per-dim σ=0.05 → noise norm ≈0.4), renormalized) of the same size/dim.
    println("[recall] --- clustered corpus (50 centers, noise norm ~0.4) ---")
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    val centers = Array.fill(50)(unit())
    val session = spark
    import session.implicits._
    val clustered = (0L until n).map { i =>
      val c = centers((i % 50).toInt)
      val v = c.zip(Array.fill(dim)(rnd.nextGaussian() * 0.05)).map { case (a, b) => a + b }
      val nn = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(x => (x / nn).toFloat).toSeq, (i % 50).toInt)
    }.toDF("vec_id", "embedding", "label").cache()
    clustered.count()
    // qids for THIS corpus come from ITS id space (0 until n by
    // construction) — reusing the original corpus's harvested ids would
    // silently miss every query on any corpus with non-contiguous ids
    val qids2 = (0L until n by math.max(1L, n / nQ)).take(nQ).toSeq
    run("brute") { Similarity.bruteForceTopK(clustered, qids2, k) }
    run("lsh_ann") { Similarity.annTopK(clustered, qids2, k, dim) }
    run("ivf_label") { Similarity.ivfTopK(clustered, qids2, k) }
    run("ivf_trained") { Similarity.ivfTopKTrained(clustered, qids2, k, cells = 16, nprobe = 3) }
    run("pq_adc") { Similarity.pqTopK(clustered, qids2, k, refine = math.max(50, 5 * k)) }
    spark.stop()
  }
}
