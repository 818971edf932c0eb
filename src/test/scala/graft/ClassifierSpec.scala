package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSuite {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("held-out accuracy: train on 80%, the 20% split scores >= 0.9") {
    val labeled = Classifier.syntheticLabeled(docs)
    val feat = Classifier.features(labeled, col("doc_id") % 2 === 0)
    val w = Classifier.train(feat.filter(col("doc_id") % 5 =!= 0))
    val held = Classifier.score(feat.filter(col("doc_id") % 5 === 0), w.toSeq)
    val (hit, n) = held.select(
        sum((col("pred") === (col("y") === 1)).cast("long")), count(lit(1)))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .head()
    assert(n > 50, s"held-out slice too small: $n")
    val acc = hit.toDouble / n
    assert(acc >= 0.9, s"held-out accuracy $acc under the 0.9 floor")
  }

  test("negative control: shuffled labels collapse held-out accuracy to chance") {
    // labels independent of the planted separation (plant is %2, label
    // %3): a classifier that still scores high here is reading a leak
    val labeled = Classifier.syntheticLabeled(docs)
    val feat = Classifier.features(labeled, col("doc_id") % 3 === 0)
    val w = Classifier.train(feat.filter(col("doc_id") % 5 =!= 0))
    val held = Classifier.score(feat.filter(col("doc_id") % 5 === 0), w.toSeq)
    val rows = held.select((col("pred") === (col("y") === 1)).cast("long")).collect()
    val acc = rows.map(_.getLong(0)).sum.toDouble / rows.length
    // %3 base rate is ~2/3 all-negative; the gate is "far from the 0.9
    // the real signal reaches", not "exactly 50%"
    assert(acc < 0.8, s"negative control scored $acc — feature leak?")
  }

  test("training is deterministic: identical weights across runs and partitionings") {
    val labeled = Classifier.syntheticLabeled(docs)
    val feat = Classifier.features(labeled, col("doc_id") % 2 === 0)
    val w1 = Classifier.train(feat).toSeq
    val w2 = Classifier.train(feat.repartition(13)).toSeq
    assert(w1 == w2, s"$w1 != $w2")
    assert(w1.exists(_ != 0L))
  }

  test("the learned weights point the right way: stopwords up, punctuation down") {
    val labeled = Classifier.syntheticLabeled(docs)
    val feat = Classifier.features(labeled, col("doc_id") % 2 === 0)
    val w = Classifier.train(feat)
    assert(w(2) > 0, s"stopword weight ${w(2)} should be positive")
    assert(w(3) < 0, s"punctuation weight ${w(3)} should be negative")
  }
}
