package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the DCLM/fastText-style step above the
  * Gopher heuristics (public recipe: label a reference corpus positive
  * and crawl text negative, fit a linear model over cheap signals, gate
  * on the predicted probability). Here: logistic regression over the
  * engine's existing quality signal columns, trained DISTRIBUTED
  * (full-batch gradient descent — each step is ONE aggregation job over
  * the feature frame; the model is 4 weights on the driver, the
  * `Bpe.trainMerges` two-tier precedent) and scored MAP-ONLY with the
  * weights inlined as literals.
  *
  * Everything is fixed-point integer arithmetic so training is
  * deterministic and exactly mirrorable: features are micro-units
  * (round(signal·1e6) — the same rounded signal formulas the quality
  * oracles already pin), weights are nano-units, the per-doc sigmoid is
  * the chain's ONLY transcendental and is rounded to nano immediately
  * (the lmScore ln precedent), gradients are exact DECIMAL sums
  * (|x·dy| ≤ 1e15 per doc fits a Long per-row; the sum widens to
  * decimal(30,0), matching the oracle's exact HUGEINT sum at any n),
  * and the weight update rounds through the same IEEE double
  * expression in both engines.
  * Result: 8 unrolled GD steps replay in DuckDB SQL bit-for-bit.
  *
  * Scale shape: K training steps = K scans of a cached feature frame
  * (each a partial-aggregated 5-column reduce — no shuffle beyond the
  * final single-row combine); scoring is codegen'd per-row arithmetic.
  * At 100 TB you'd train on a SAMPLE (the published recipes do — DCLM
  * fits on ~1M docs) and score the full corpus map-only, which is
  * exactly the shape this decomposition gives.
  */
object Classifier {

  /** Micro-unit feature frame `(idCol, y, x0..x3)`: bias, capped length
    * score, capped stopword-rate score, capped punctuation-rate score —
    * the [[TextOps.qualityScore]] components, each already mirrored in
    * the oracle corpus, as integers.
    */
  def features(docs: DataFrame, label: Column, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    import graft.functions.TextSignalExpressions._
    val t = col(textCol)
    val nToks = token_cnt(t)
    val punct = round(punct_cnt(t).cast("double") / greatest(length(t), lit(1)), 6)
    val stop = round(token_hit_cnt(t, TextOps.englishStopwords).cast("double") /
      greatest(nToks, lit(1)), 6)
    docs.select(col(idCol), label.cast("long").as("y"),
      lit(1000000L).as("x0"),
      round(least(nToks.cast("double") / 100.0, lit(1.0)) * 1e6).cast("long").as("x1"),
      round(least(stop * 5.0, lit(1.0)) * 1e6).cast("long").as("x2"),
      round(least(punct * 10.0, lit(1.0)) * 1e6).cast("long").as("x3"))
  }

  /** σ(w·x) in nano-units: the dot is exact integer (nano × micro =
    * 1e15 scale), the sigmoid rounds to nano at once so the single
    * transcendental's last-bit noise can't accumulate.
    */
  private def sigmoidNano(w: Seq[Long]): Column = {
    val dot = (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")).cast("double") / lit(1e15)
    round(lit(1e9) / (lit(1.0) + exp(-dot))).cast("long")
  }

  /** Full-batch GD from w=0: K steps, each one aggregation job. Returns
    * nano-unit weights. `lr` multiplies the mean gradient; the update
    * floors through a double (IEEE-identical across engines).
    */
  def train(feat: DataFrame, iters: Int = 8, lr: Double = 4.0): Array[Long] = {
    val cached = feat.select("y", "x0", "x1", "x2", "x3").trackedCache
    try {
      var w = Array(0L, 0L, 0L, 0L)
      for (_ <- 0 until iters) {
        val dy = col("y") * lit(1000000000L) - sigmoidNano(w.toSeq)
        // per-row products fit a Long (≤1e15); the SUM widens to exact
        // decimal — at ×10-probe scale (50k docs) a Long sum overflows
        // (≈5e19), and DuckDB's HUGEINT sum is exact at any n, so the
        // engine must be too
        def g(x: Column) = sum((x * dy).cast("decimal(20,0)"))
        val row = cached.agg(
          g(col("x0")), g(col("x1")), g(col("x2")), g(col("x3")),
          count(lit(1))).first()
        val n = row.getLong(4)
        require(n > 0, "classifier: empty training frame")
        // grad is in micro·nano (1e15) scale; /1e6 lands the update in
        // nano-units (real-unit step = lr × mean(x_real · dy_real));
        // exact-decimal → double is the same IEEE rounding both engines
        w = Array.tabulate(4)(j =>
          w(j) + math.floor(row.getDecimal(j).doubleValue() * lr / n / 1e6).toLong)
      }
      w
    } finally cached.unpersist()
  }

  /** Map-only scoring: nano-unit probability + the 0.5-threshold label. */
  def score(feat: DataFrame, w: Seq[Long]): DataFrame =
    feat.withColumn("score_nano", sigmoidNano(w))
      .withColumn("pred", col("score_nano") >= lit(500000000L))

  /** Train on `feat` and score it (the self-gating shape CCNet/DCLM
    * pipelines run: fit on the labeled slice, score the corpus).
    */
  def trainAndScore(feat: DataFrame, iters: Int = 8, lr: Double = 4.0): DataFrame =
    score(feat, train(feat, iters, lr).toSeq)

  /** Deterministic labeled fixture over the documents table: even ids
    * are "reference" docs padded with stopword-dense text, odd ids are
    * "crawl junk" padded with punctuation spam — plain string
    * arithmetic the oracle replays, planting exactly the separation the
    * quality signals measure (the langid-fixture pattern: the corpus
    * text itself is language-/quality-agnostic word salad).
    */
  def syntheticLabeled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 2 === 0,
          lit(" the of and to in is it that for a the of and to in is it that for a"))
          .otherwise(lit(" !!!! ???? ;;;; !!!! ???? ;;;; !!!!"))).as("text"))
}
