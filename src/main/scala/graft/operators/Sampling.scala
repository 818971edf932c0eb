package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Every sampler here is HASH-GATED, not RNG-gated: membership is a pure
  * function of the row's stable id, so a sample is (a) reproducible across
  * runs, engines and cluster sizes, (b) oracle-checkable (the same gate is
  * one line of ANSI SQL), and (c) consistent across tables — joining a 10%
  * sample of docs with a 10% sample of their annotations keyed the same way
  * yields the 10% sample of the join. `rand(seed)` gives none of these: its
  * stream is partition-order-dependent, so a repartition silently changes
  * the sample.
  *
  * Scale design: the gate is a scan-time predicate over a 16-byte digest —
  * no shuffle, no state, pushes through any plan. Stratified top-k is the
  * only member that shuffles (by stratum), and it rides WindowGroupLimit so
  * each map task forwards at most k rows per stratum — at 100 TB the
  * shuffle volume is `k × #strata`, not the corpus.
  */
object Sampling {

  /** md5 hex digest of the row key — the sampling coin. Keys are rendered
    * as strings before hashing so any engine reproduces the digest
    * (md5('123') is engine-independent; hashing raw int64 bytes is not).
    */
  def sampleKey(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** Keep-gate with rate `threshold256`/256, expressed as a lexicographic
    * compare of the digest's first two hex digits against the threshold
    * rendered in hex — string compare on lowercase hex IS numeric compare,
    * so the same predicate runs verbatim in any SQL engine. 1/256 rate
    * granularity is the price of exact portability.
    */
  def hashGate(key: Column, threshold256: Int): Column = {
    require(threshold256 >= 0 && threshold256 <= 256,
      s"threshold256 must be in [0,256], got $threshold256")
    if (threshold256 == 256) lit(true)
    else substring(sampleKey(key), 1, 2) < lit(f"$threshold256%02x")
  }

  /** Uniform deterministic sample at rate threshold256/256. */
  def hashSample(df: DataFrame, threshold256: Int, idCol: String = "doc_id"): DataFrame =
    df.filter(hashGate(col(idCol), threshold256))

  /** Per-stratum deterministic top-k: the k rows of each stratum whose
    * digest sorts first — a fixed-size, reproducible panel per language /
    * source / domain (eval-set carving, per-domain inspection samples).
    * WindowGroupLimit pushes the rank bound below the shuffle.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, k: Int,
                       idCol: String = "doc_id"): DataFrame = {
    // collision-free rank column: an input that already carries the name
    // would be silently overwritten and dropped from the result
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleKey(col(idCol)).asc, col(idCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Weighted mixture sampling — the "domain mixing" step of corpus
    * assembly: each stratum keeps a configured fraction (in 256ths),
    * unlisted strata keep `default256`. Returns the per-stratum report
    * (total, kept, realized rate); `mixtureFilter` gives the row-level
    * gate for building the actual mixed corpus.
    */
  def mixtureGate(strata: Column, key: Column,
                  weights: Seq[(String, Int)], default256: Int): Column =
    weights.foldRight(hashGate(key, default256)) { case ((value, t), acc) =>
      when(strata === value, hashGate(key, t)).otherwise(acc)
    }

  def mixtureFilter(df: DataFrame, strataCol: String,
                    weights: Seq[(String, Int)], default256: Int,
                    idCol: String = "doc_id"): DataFrame =
    df.filter(mixtureGate(col(strataCol), col(idCol), weights, default256))

  def mixtureReport(df: DataFrame, strataCol: String,
                    weights: Seq[(String, Int)], default256: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val kept = mixtureGate(col(strataCol), col(idCol), weights, default256)
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(kept, 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("rate", round(col("n_sampled").cast("double") / col("n_docs"), 6))
      .orderBy(strataCol)
  }

  // ------------------------------------------------- token budgets --

  /** Token-budget mixture allocation — the data-mixing step of training-
    * corpus assembly when the knob is a TOKEN budget, not a sampling
    * rate: distribute `totalBudget` tokens across sources by
    * temperature-flattened size weights w_s ∝ sqrt(tokens_s) (the
    * T=0.5 point of the multilingual-sampling exponent family; sqrt
    * specifically because IEEE-754 sqrt is correctly rounded in every
    * engine where pow(x, α) is not, so the weights round-trip the
    * oracle bit-for-bit), then fill each source's budget
    * deterministically in [[sampleKey]] order — reproducible across
    * runs, engines and cluster sizes, unbiased by ingest order. All
    * budget arithmetic after one quantized sqrt is exact integer math:
    * `wq = round(sqrt(tokens_s)·1e6)`, `budget_s = totalBudget·wq DIV
    * Σwq`; a kept document is one whose per-source running token sum
    * (inclusive) stays within the budget — a deterministic prefix,
    * never a probabilistic thinning.
    *
    * Scale: per-source totals are one aggregate; Σwq is a single-
    * partition window over that SOURCE-CARDINALITY aggregate (the
    * sanctioned bounded-input shape); the budget join back to the
    * corpus pins `shuffle_hash` (slim (source, budget) build rows —
    * source cardinality is corpus-dependent, the commonness
    * discipline); and the per-source running sum is the hot-key-safe
    * two-pass prefix sum (`Windowing.withRankAndRunningSum` — source is
    * low-cardinality, so a plain per-source window would serialize each
    * source through one task).
    */
  private def budgetFrames(df: DataFrame, totalBudget: Long,
                           sourceCol: String, idCol: String,
                           textCol: String): (DataFrame, DataFrame) = {
    import graft.CacheLedger.Tracked
    require(totalBudget >= 0, s"negative token budget: $totalBudget")
    val outputs = Set("n_tokens", "budget_tokens", "src_docs", "src_tokens",
      "kept_docs", "kept_tokens")
    require(!outputs.contains(idCol) && !outputs.contains(sourceCol),
      "id/source column collides with a tokenBudget output column")
    val toks = df.select(col(sourceCol), col(idCol),
      TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      sampleKey(col(idCol)).as("__h"))
      .trackedCache // feeds the budget aggregate AND the prefix-sum probe
    val budgets = toks.groupBy(sourceCol)
      .agg(count(lit(1)).as("src_docs"), sum("n_tokens").as("src_tokens"))
      .withColumn("wq", round(sqrt(col("src_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("__W", sum("wq").over(Window.partitionBy()))
      .withColumn("budget_tokens",
        expr(s"(CAST($totalBudget AS BIGINT) * wq) DIV __W"))
      .select(col(sourceCol), col("src_docs"), col("src_tokens"), col("budget_tokens"))
    val ranked = Windowing.withRankAndRunningSum(toks, Seq(sourceCol),
      Seq(col("__h").asc, col(idCol).asc), col("n_tokens"),
      rankName = "__rk", sumName = "__cum")
    val kept = ranked.join(budgets.hint("shuffle_hash"), Seq(sourceCol))
      .filter(col("__cum") <= col("budget_tokens"))
    (budgets, kept)
  }

  /** The kept rows: `(source, id, n_tokens, ...)` of every document whose
    * per-source running token sum stays inside its source's budget.
    */
  def tokenBudgetKept(df: DataFrame, totalBudget: Long,
                      sourceCol: String = "source", idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    budgetFrames(df, totalBudget, sourceCol, idCol, textCol)._2
      .select(col(sourceCol), col(idCol), col("n_tokens"))

  /** Per-source allocation report: corpus size, allocated budget, and the
    * kept prefix — sources whose budget admits no document still report.
    */
  def tokenBudgetReport(df: DataFrame, totalBudget: Long,
                        sourceCol: String = "source", idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val (budgets, kept) = budgetFrames(df, totalBudget, sourceCol, idCol, textCol)
    val keptAgg = kept.groupBy(sourceCol)
      .agg(count(lit(1)).as("kept_docs"), sum("n_tokens").as("kept_tokens"))
    // both sides are source-cardinality aggregates, but their subtrees are
    // whole-corpus scans — pin shuffle_hash so AQE never "broadcasts" a
    // subtree whose leaf is the unfiltered corpus (the plan-gate shape)
    budgets.join(keptAgg.hint("shuffle_hash"), Seq(sourceCol), "left")
      .select(col(sourceCol), col("src_docs"), col("src_tokens"),
        col("budget_tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(sourceCol)
  }
}
