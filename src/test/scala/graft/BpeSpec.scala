package graft

import graft.operators.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("applyMerge: greedy left-to-right, non-overlapping, resumes past fusions") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
    assert(Bpe.applyMerge(Array.empty[String], "a", "b").toSeq == Seq())
    // a fused symbol can participate in LATER merges, not the current scan
    assert(Bpe.applyMerge(Array("ab", "ab"), "ab", "ab").toSeq == Seq("abab"))
  }

  test("reference merges: the textbook low/lower/newest/widest example") {
    // Sennrich et al. 2016 fig. 1 shape: es, est, est</w> dominate
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.referenceMerges(words, 4)
    assert(m.map(r => (r.left, r.right)) ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    assert(m.head.pair_count == 9L) // es: 6 newest + 3 widest
    // counts stay consistent as symbols fuse
    assert(m(1).pair_count == 9L && m(2).pair_count == 9L && m(3).pair_count == 7L)
  }

  test("reference merges: deterministic tiebreak, stops when pairs run dry") {
    // all four pairs count 2: ties broken (left,right) asc — and "</w>"
    // sorts BEFORE letters ('<' is 0x3C), so (a,</w>) beats (a,b)
    val m = Bpe.referenceMerges(Seq(("ba", 2L), ("ab", 2L)), 10)
    assert(m.head.left == "a" && m.head.right == "</w>")
    // a single one-char word exhausts after one merge: ["a","</w>"] fuses,
    // the lone fused symbol has no adjacent pairs left
    val dry = Bpe.referenceMerges(Seq(("a", 1L)), 10)
    assert(dry.map(r => (r.left, r.right, r.pair_count)) == Seq(("a", "</w>", 1L)))
  }

  test("distributed trainer == reference implementation on a mixed fixture") {
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest"),
      (4L, "the newest widget is the widest low-cost widget")
    ).toDF("doc_id", "text")
    // reference input: the same word counts the corpus aggregation yields
    val wc = docs.selectExpr("explode(filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')) AS w")
      .groupBy("w").count().as[(String, Long)].collect().toSeq
    val expect = Bpe.referenceMerges(wc, 8)
    // localVocab = 0 forces the distributed tier — the default would take
    // the driver tier, which IS referenceMerges, making this vacuous
    val got = Bpe.trainMerges(docs, 8, localVocab = 0)
    assert(got == expect)
    assert(got.length == 8)
    // ranks are sequential and counts non-increasing is NOT guaranteed by
    // BPE in general, but determinism is: a second run is identical
    assert(Bpe.trainMerges(docs, 8, localVocab = 0) == got)
    // tier equivalence end-to-end through the public default path: the
    // small fixture takes the driver tier and must produce the same rules
    assert(Bpe.trainMerges(docs, 8) == expect)
  }

  test("mergesDf: roster shape, rank-ordered, merged column spells the fusion") {
    val docs = Seq((1L, "aa aa aa ab")).toDF("doc_id", "text")
    val df = Bpe.mergesDf(spark, docs, 3)
    assert(df.columns.toSeq == Seq("rank", "left", "right", "merged", "pair_count"))
    val rows = df.as[(Long, String, String, String, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L))
    rows.foreach { case (_, l, r, m, _) => assert(m == l + r) }
    // top merge of "aa aa aa ab": (a,a) and (a,</w>) tie at 3; the EOW
    // marker's '<' sorts before 'a', so (a,</w>) takes rank 0
    assert((rows.head._2, rows.head._3) == (("a", "</w>")))
  }

  test("encode reproduces training-time word states exactly (train->encode consistency)") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.referenceMerges(wc, 6)
    // replay the reference trainer's rewriting and compare word by word
    var words = wc.map { case (w, c) => (w, w.map(_.toString).toArray :+ Bpe.EOW) }
    merges.foreach { m =>
      words = words.map { case (w, syms) => (w, Bpe.applyMerge(syms, m.left, m.right)) }
    }
    words.foreach { case (w, expect) =>
      assert(Bpe.encode(w, merges).toSeq == expect.toSeq, s"word=$w")
    }
    // an UNSEEN word encodes with whichever merges apply, in rank order:
    // k=6 learns es, est, est</w>, lo, low, ew — so "lowest" (never in
    // the corpus) factors into the two learned stems
    assert(Bpe.encode("lowest", merges).toSeq == Seq("low", "est</w>"))
    assert(Bpe.encode("", merges).toSeq == Seq(Bpe.EOW))
    assert(Bpe.encode("x", Nil).toSeq == Seq("x", Bpe.EOW))
  }

  test("encodeDf: per-doc word/subword/fused counts, map-only, EOW not counted as fused") {
    val docs = Seq(
      (1L, "newest newest"),
      (2L, "zz")
    ).toDF("doc_id", "text")
    val merges = Seq(Bpe.MergeRule(0, "e", "s", 1L),
      Bpe.MergeRule(1, "es", "t", 1L), Bpe.MergeRule(2, "est", Bpe.EOW, 1L))
    val rows = Bpe.encodeDf(docs, merges)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // newest -> n,e,w,est</w> (4 subwords, 1 fused); doc 1 has 2 words
    // zz -> z,z,</w> (3 subwords, 0 fused — bare EOW is not a fusion)
    assert(rows == Seq((1L, 2L, 8L, 2L), (2L, 1L, 3L, 0L)))
    // zero shuffles: map-only plan (plus the output sort) — no Exchange
    // other than the orderBy's range partitioning
    val plan = Bpe.encodeDf(docs, merges).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), plan)
  }

  test("trainMergesCached: identical rules, one fit per file-backed plan, bypass for local frames") {
    val docs = Seq((1L, "low low lower newest newest newest widest")).toDF("doc_id", "text")
    // no file lineage -> bypass: repeated calls retrain (fit counter moves)
    val f0 = Bpe.trainFits.get()
    val a = Bpe.trainMergesCached(docs, 4)
    assert(a == Bpe.trainMerges(docs, 4))
    assert(Bpe.trainFits.get() == f0, "local frames must not enter the cache")
    // file-backed: first call fits, second is a cache hit with equal rules
    val dir = java.nio.file.Files.createTempDirectory("bpe_cache_spec").toFile
    try {
      val p = new java.io.File(dir, "docs.parquet").getAbsolutePath
      docs.write.mode("overwrite").parquet(p)
      val onDisk = spark.read.parquet(p)
      val b = Bpe.trainMergesCached(onDisk, 4)
      val fits = Bpe.trainFits.get()
      assert(fits == f0 + 1)
      assert(Bpe.trainMergesCached(spark.read.parquet(p), 4) == b)
      assert(Bpe.trainFits.get() == fits, "second call must be a cache hit")
      assert(b == Bpe.trainMerges(onDisk, 4), "cached rules equal a live fit")
      // different k is a different model -> separate fit
      Bpe.trainMergesCached(spark.read.parquet(p), 2)
      assert(Bpe.trainFits.get() == fits + 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("k=0 and empty corpus degenerate cleanly") {
    val docs = Seq((1L, "anything at all")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, 0).isEmpty)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.trainMerges(empty, 5).isEmpty)
  }
}
