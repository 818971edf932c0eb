package graft

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashGate edges: 0 keeps nothing, 256 keeps everything") {
    assert(Sampling.hashSample(docs, 0).count() == 0)
    assert(Sampling.hashSample(docs, 256).count() == docs.count())
  }

  test("hash samples nest: raising the threshold only adds rows") {
    val at64 = Sampling.hashSample(docs, 64).select("doc_id").as[Long].collect().toSet
    val at128 = Sampling.hashSample(docs, 128).select("doc_id").as[Long].collect().toSet
    assert(at64.subsetOf(at128))
    // and the realized rates are in the right ballpark (not a proof of
    // uniformity — md5 gives that — just a wiring check against an
    // accidentally-constant gate)
    val n = docs.count().toDouble
    assert(math.abs(at64.size / n - 0.25) < 0.1)
    assert(math.abs(at128.size / n - 0.5) < 0.1)
  }

  test("hash sample is invariant under repartitioning (rand() is not)") {
    val once = Sampling.hashSample(docs, 64).select("doc_id").as[Long].collect().toSet
    val shuffled = Sampling.hashSample(docs.repartition(13), 64)
      .select("doc_id").as[Long].collect().toSet
    assert(once == shuffled)
  }

  test("stratified sample: exactly min(k, |stratum|) rows per stratum, deterministic") {
    val k = 7
    val got = Sampling.stratifiedSample(docs, "lang", k)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- sizes) assert(got(lang) == math.min(k.toLong, n), lang)
    val again = Sampling.stratifiedSample(docs, "lang", k)
      .select("doc_id").as[Long].collect().toSet
    val first = Sampling.stratifiedSample(docs, "lang", k)
      .select("doc_id").as[Long].collect().toSet
    assert(first == again)
  }

  test("mixture report: per-stratum counts sum to totals, gated rows match the filter") {
    val weights = Seq("src0" -> 192, "src1" -> 64)
    val rep = Sampling.mixtureReport(docs, "source", weights, default256 = 32)
      .as[(String, Long, Long, Double)].collect()
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    for ((src, nDocs, nSampled, rate) <- rep) {
      assert(nDocs == totals(src))
      assert(nSampled <= nDocs)
      assert(math.abs(rate - nSampled.toDouble / nDocs) < 1e-6)
    }
    val filtered = Sampling.mixtureFilter(docs, "source", weights, default256 = 32).count()
    assert(filtered == rep.map(_._3).sum)
  }

  // ---- decontamination (planted-case semantics)

  // eval doc 0; doc 10 contains eval 5-grams verbatim (contaminated);
  // doc 11 shares words but no 5-gram; doc 12 unrelated
  lazy val contaminated = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (10L, "prefix words then alpha beta gamma delta epsilon zeta and more"),
    (11L, "alpha beta something gamma delta else epsilon zeta iota"),
    (12L, "totally unrelated words about spark shuffles and parquet files")
  ).toDF("doc_id", "text")

  test("decontamination report flags exactly the doc sharing a 5-gram with eval") {
    val rep = Dedup.decontaminationReport(contaminated, col("doc_id") === 0L, n = 5)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 10 shares "alpha beta gamma delta epsilon" and "beta gamma delta
    // epsilon zeta" with eval doc 0 → 1 eval doc, 2 grams
    assert(rep == Seq((10L, 1L, 2L)))
  }

  test("decontaminate keeps clean training docs and drops contaminated + eval") {
    val kept = Dedup.decontaminate(contaminated, col("doc_id") === 0L, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L))
  }

  test("decontaminate with an empty eval set keeps all training docs") {
    val kept = Dedup.decontaminate(contaminated, lit(false), n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 10L, 11L, 12L))
  }

  test("token budget: kept set equals a driver-side reference prefix fill") {
    val budget = 5000L
    // driver reference: same arithmetic, plain Scala
    val rows = docs.select(col("source"), col("doc_id"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long"),
        Sampling.sampleKey(col("doc_id")))
      .as[(String, Long, Long, String)].collect().toSeq
    val bySrc = rows.groupBy(_._1)
    val wq = bySrc.view.mapValues(v =>
      math.round(math.sqrt(v.map(_._3).sum.toDouble) * 1e6)).toMap
    val bigW = wq.values.sum
    val expect = bySrc.flatMap { case (src, v) =>
      val b = budget * wq(src) / bigW
      var cum = 0L
      v.sortBy(r => (r._4, r._2)).flatMap { r =>
        cum += r._3; if (cum <= b) Some(r._2) else None
      }
    }.toSet
    val got = Sampling.tokenBudgetKept(docs, budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
    // and per-source kept tokens never exceed the allocation
    val rep = Sampling.tokenBudgetReport(docs, budget)
      .select("source", "budget_tokens", "kept_tokens")
      .as[(String, Long, Long)].collect()
    assert(rep.forall { case (_, b, k) => k <= b })
    // allocations can't overrun the global budget (DIV floors)
    assert(rep.map(_._2).sum <= budget)
  }

  test("token budget is invariant under repartitioning") {
    val a = Sampling.tokenBudgetKept(docs, 3000L)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.tokenBudgetKept(docs.repartition(13), 3000L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("token budget edge: zero budget keeps only zero-token documents") {
    val kept = Sampling.tokenBudgetKept(docs, 0L)
      .select("n_tokens").as[Long].collect()
    assert(kept.forall(_ == 0L))
  }
}
