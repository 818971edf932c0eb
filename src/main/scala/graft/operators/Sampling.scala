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
}
