package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  // 0/1 identical; 2 is a near-dup of 0 (one word changed); 3 unrelated
  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today"),
    (3L, "completely different content about spark parquet shuffles and joins")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val got = Dedup.exact(docs).orderBy("keep_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngram jaccard: identical docs j=1, near-dup j high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, tau = 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.3 && pairs((0L, 2L)) < 1.0)
    assert(pairs((1L, 2L)) == pairs((0L, 2L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("prefix-filtered jaccard pairs == naive inverted-index pairs (real corpus)") {
    val docs001 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (tau <- Seq(0.3, 0.6, 0.9)) {
      val fast = Dedup.ngramJaccardPairs(docs001, n = 3, tau = tau)
        .as[(Long, Long, Double)].collect().toSet
      val naive = Dedup.ngramJaccardPairsNaive(docs001, n = 3, tau = tau)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == naive, s"tau=$tau")
    }
  }

  test("hashed_shingles set sizes match the string shingle pipeline (incl. edge cases)") {
    val edge = Seq(
      (0L, "  leading and trailing  "),
      (1L, "tab\tseparated\nnewline\rcarriagevtff tokens here"),
      (2L, "unicode héllo wörld ünicode tokens čšž here too"),
      (3L, ""), (4L, "   "), (5L, "two words"),
      (6L, "a b c"), (7L, "x x x x x x")
    ).toDF("doc_id", "text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").union(edge)
    val both = corpus.select(
      size(graft.functions.SketchExpressions.hashed_shingles($"text", 3)).as("native"),
      size(Dedup.shinglesFromTokens(graft.operators.TextOps.tokens($"text"), 3)).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("minhash LSH finds the same verified pairs as exact jaccard here") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, n = 3, k = 64, bands = 16, tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact) // high-sim pairs collide in >=1 band w.p. ~1
  }

  test("minhash signature: identical texts identical sigs; shingle guard for short docs") {
    val sigs = docs.select($"doc_id", graft.operators.TextOps.tokens($"text").as("toks"))
      .select($"doc_id", Dedup.shinglesFromTokens($"toks", 3).as("sh"))
      .select($"doc_id", Dedup.minhashSignature($"sh", 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
      .select($"doc_id", graft.operators.TextOps.tokens($"text").as("toks"))
      .select(Dedup.shinglesFromTokens($"toks", 3).as("sh"))
    assert(short.select(size($"sh")).as[Int].head() == 0)
  }

  test("containment catches a short doc subsumed in a long one (jaccard misses it)") {
    val subs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta " +
        Seq.tabulate(30)(i => s"filler$i word$i extra$i").mkString(" ")),
      (3L, "totally different content entirely unrelated words stand alone")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(subs, t = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(got.exists(r => r._1 == 1L && r._2 == 2L && r._3 >= 0.999))
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L))
    assert(Dedup.ngramJaccardPairs(subs, n = 3, tau = 0.8).count() == 0)
  }

  test("duplicate clusters: min-label propagation crosses chain components") {
    // A~B and B~C but A!~C: the component {A,B,C} has diameter 2, so the
    // representative must PROPAGATE, not just come from direct neighbors
    val chain = Seq(
      (10L, "a b c d e f g h i j k l"),
      (20L, "a b c d e f g h x y z w"),
      (30L, "q r s t e f g h x y z w"),
      (40L, "completely unrelated text that stands alone entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(chain, n = 3, tau = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L), (20L, 30L))) // the chain, no shortcut edge
    val clusters = Dedup.duplicateClusters(chain, n = 3, tau = 0.3)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(10L -> 10L, 20L -> 10L, 30L -> 10L)) // 40 absent: no pair
  }

  test("keeper election prefers quality over the min id") {
    // 10 and 20 are near-dups (J = 10/30 at the shared prefix); 20 scores
    // higher on the length AND stopword terms, so the keeper must be 20 —
    // NOT the min id the plain keep-list would choose
    val docs = Seq(
      (10L, "a b c d e f g h i j k l"),
      (20L, "a b c d e f g h i j k l " +
        "the and of to in is was for on with as by at from be this that it or"),
      (30L, "totally different standalone text body")
    ).toDF("doc_id", "text")
    val out = Dedup.qualityKeepers(docs, n = 3, tau = 0.3)
      .select("doc_id", "cluster_id", "keeper_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((10L, 10L, 20L), (20L, 10L, 20L))) // cluster label min, keeper argmax
  }

  test("LSH-tier keeper election equals the exact tier where LSH recall is 1") {
    // exact duplicates collide in EVERY band (identical signatures), so
    // the LSH tier recalls the full duplicate structure and the two
    // elections must agree row-for-row — including the quality argmax
    val docs = Seq(
      (10L, "a b c d e f g h i j k l"),
      (20L, "a b c d e f g h i j k l"), // exact dup of 10: identical signature
      (21L, "a b c d e f g h i j k l the and of"), // J = 10/13 vs 10 — on the
      // 16-band/r=4 curve a 0.77-Jaccard pair collides w.p. ~0.999, and the
      // fixed xxhash64 makes the outcome deterministic, not probabilistic
      (30L, "totally different standalone text body right here"),
      (31L, "totally different standalone text body right here"), // dup of 30
      (40L, "a lone unrelated document that matches nothing else at all")
    ).toDF("doc_id", "text")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "cluster_id", "keeper_id").as[(Long, Long, Long)].collect().toSet
    val exact = norm(Dedup.qualityKeepers(docs, n = 3, tau = 0.3))
    val lsh = norm(Dedup.qualityKeepersLsh(docs, n = 3, k = 64, bands = 16, tau = 0.3))
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
    assert(exact.map(_._1) == Set(10L, 20L, 21L, 30L, 31L), exact.toString)
  }

  test("incremental dedup: seen hashes filtered, within-batch first kept") {
    val seen = Seq("already stored body one", "already stored body two")
      .toDF("text").select(org.apache.spark.sql.functions.md5($"text").as("content_hash"))
    val batch = Seq(
      (1L, "already stored body one"),   // in the store → dropped
      (2L, "fresh body alpha"),
      (5L, "fresh body alpha"),          // batch dup of 2 → dropped
      (3L, "fresh body beta"),
      (9L, "already stored body two")    // in the store → dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNew(batch, seen)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L, 3L))
    // empty store: pure within-batch dedup (min id per content)
    val empty = seen.filter($"content_hash" === "")
    assert(Dedup.incrementalNew(batch, empty).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 9L))
  }

  test("cross-corpus LSH pairs: old-vs-new only, recall 1 on exact cross dups") {
    val old = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "an entirely different old document body with other words")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"), // = 100
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // = 100, AND = doc 1
      (3L, "no overlap with anything in the old corpus whatsoever here")
    ).toDF("doc_id", "text")
    val got = Dedup.crossCorpusLshPairs(fresh, old, n = 3, k = 64, bands = 16, tau = 0.5)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    // both exact cross-dups found; the new×new pair (1,2) must NOT appear
    assert(got == Set((1L, 100L), (2L, 100L)), got.toString)
  }

  test("clusters on an edgeless graph: empty result with the right schema, both tiers") {
    val lonely = Seq(
      (1L, "completely distinct first document body here"),
      (2L, "another unrelated second text with different words")
    ).toDF("doc_id", "text")
    for (localEdges <- Seq(1000000L, 0L)) {
      val out = Dedup.duplicateClusters(lonely, n = 3, tau = 0.9, localEdges = localEdges)
      assert(out.columns.toSeq == Seq("doc_id", "keep_id"))
      assert(out.count() == 0)
    }
  }

  test("containment df-cap: identical results on a real corpus, bounded on boilerplate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val capped = Dedup.containmentPairs(docs, t = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val uncapped = Dedup.containmentPairs(docs, t = 0.7, maxDocFreq = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == uncapped) // cap engages only on degenerate corpora
    // synthetic boilerplate: 60 docs that are NOTHING but the same hot
    // phrase — every shingle has df 60, far above the cap of 5, so the
    // candidate join is empty instead of 60²/2 rows per shingle
    val boiler = (1L to 60L)
      .map(i => (i, "standard legal disclaimer text applies to all documents"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(boiler, t = 0.7, maxDocFreq = 5).count() == 0)
    // and the documented recall trade: uncapped finds the full clique
    assert(Dedup.containmentPairs(boiler, t = 0.7, maxDocFreq = 100).count() == 60L * 59 / 2)
  }

  test("duplicate clusters: distributed pointer-jumping tier == local union-find tier") {
    // same chain graph, but force the distributed loop (localEdges = 0);
    // both tiers must produce the identical keep-list
    val chain = Seq(
      (10L, "a b c d e f g h i j k l"),
      (20L, "a b c d e f g h x y z w"),
      (30L, "q r s t e f g h x y z w"),
      (40L, "completely unrelated text that stands alone entirely here now")
    ).toDF("doc_id", "text")
    val local = Dedup.duplicateClusters(chain, n = 3, tau = 0.3)
      .as[(Long, Long)].collect().toMap
    // checkpoint RDDs carry the bare class name ('MapPartitionsRDD');
    // SQL-cache RDDs carry a rendered PLAN string (spaces/newlines) —
    // the discriminator that keeps this from racing a parallel sibling
    // suite's suite-lifetime .cache() fixtures (suites share the context)
    def storedIds = spark.sparkContext.getRDDStorageInfo
      .filter(i => i.name == null || !i.name.trim.contains(" ")).map(_.id).toSet
    val before = storedIds
    var during = Set.empty[Int]
    val dist = CacheLedger.scoped {
      val m = Dedup.duplicateClusters(chain, n = 3, tau = 0.3, localEdges = 0L)
        .as[(Long, Long)].collect().toMap
      during = storedIds
      m
    }
    assert(dist == local)
    assert(dist == Map(10L -> 10L, 20L -> 10L, 30L -> 10L))
    // THIS query's round checkpoints (LogicalRDD-backed blocks, NOT under
    // the SQL CacheManager) must release at ledger scope exit.
    // Poll briefly: unpersist is blocking=false.
    val mine = during -- before
    assert(mine.nonEmpty, "expected the distributed tier to checkpoint rounds")
    val deadline = System.nanoTime() + 30000000000L
    var leaked = storedIds intersect mine
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200); leaked = storedIds intersect mine
    }
    assert(leaked.isEmpty, s"round checkpoints still stored after scope exit: $leaked")
  }

  test("duplicated spans: overlapping cross-doc 3-grams cover positions once") {
    val corpus = Seq(
      (10L, "x y z p q"),     // shares "x y z" with 11 → positions 0-2 of 5
      (11L, "m n x y z"),     // → positions 2-4 of 5
      (12L, "a b"),           // < 3 tokens: no row
      (13L, "u v w"),         // unique 3-gram: zero coverage
      (14L, "1 2 3 4"),       // shares "1 2 3" AND "2 3 4" with 15: the
      (15L, "1 2 3 4 9")      // overlapping spans union to 0..3, not 6
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, n = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (10L, 5L, 3L, 0.6),
      (11L, 5L, 3L, 0.6),
      (13L, 3L, 0L, 0.0),
      (14L, 4L, 4L, 1.0),
      (15L, 5L, 4L, 0.8)))
  }

  test("duplicated spans: intra-doc repetition alone is NOT cross-doc duplication") {
    // "r s t" occurs twice in ONE doc — distinct-doc df is 1, so nothing
    // is flagged (in-doc repetition is q_text_repetition's signal)
    val corpus = Seq((20L, "r s t r s t"), (21L, "h i j k")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, n = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((20L, 6L, 0L, 0.0), (21L, 4L, 0L, 0.0)))
  }

  test("native simhash64 == HOF majority-vote formulation") {
    val hashed = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", transform(graft.operators.TextOps.tokens($"text"),
        t => xxhash64(t)).as("hashes"))
    val both = hashed.select(
      Dedup.simhashFromHashes($"hashes").as("native"),
      Dedup.simhashFromHashesHof($"hashes").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("simhash: identical docs hamming 0; near-dups close; pairs found via bands") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 16)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs.get((0L, 2L)).exists(_ <= 16)) // one-word change stays close
  }

  test("bloom decontamination: no false negatives; exact-equal at 2^20; subset when saturated") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isEval = col("doc_id") % 10 === 0
    val exact = Dedup.decontaminate(corpus, isEval)
      .select("doc_id").as[Long].collect().toSet
    val bloom = Dedup.decontaminateBloom(corpus, isEval)
      .select("doc_id").as[Long].collect().toSet
    // default table realizes zero false positives on the frozen corpus —
    // the property the exact SQL oracle for q_decontaminate_bloom relies on
    assert(bloom == exact)
    // saturate a 256-bit table: collisions now inevitable, but they may
    // only OVER-drop (subset) — a contaminated doc can never leak through
    val tiny = Dedup.decontaminateBloom(corpus, isEval, logM = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(tiny.subsetOf(exact))
    assert(tiny.size < exact.size) // FPs genuinely realized at 256 bits
  }

  test("paragraph dedup: boilerplate survives only its first occurrence; fully-dup docs drop") {
    import spark.implicits._
    val docs = Seq(
      (0L, "banner\nalpha beta\nfooter"),
      (1L, "banner\ngamma delta\nfooter"),
      (2L, "banner\nfooter"), // nothing unique: vanishes entirely
      (3L, "banner\nalpha beta")) // its middle para already in doc 0
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    assert(out(0) == ((0L, "banner\nalpha beta\nfooter", 3L)))
    assert(out(1) == ((1L, "gamma delta", 1L)))
    // blank lines are document STRUCTURE: every doc keeps its own — only
    // the banner dedups, never the paragraph separation
    val blanky = Seq(
      (0L, "banner\na\n\nb"),
      (1L, "banner\nx\n\ny"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupParagraphs(blanky)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(kept(0)._2 == "banner\na\n\nb")
    assert(kept(1)._2 == "x\n\ny", kept(1)._2)
    // order invariance: repartitioned input keeps the same first-occurrence set
    val shuffled = Dedup.dedupParagraphs(docs.repartition(7))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(shuffled.toSeq == out.toSeq)
  }

  test("incremental paragraph dedup: batch ∪ store ≡ one-shot on the union") {
    import spark.implicits._
    val old = Seq( // yesterday's crawl: ids strictly below the batch
      (0L, "banner\nalpha beta\nfooter"),
      (1L, "banner\nold news\n\ntail one"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "banner\nfresh gamma\nfooter"),  // banner+footer learned from store
      (11L, "banner\nfresh gamma\ntail two"), // fresh gamma dups WITHIN batch
      (12L, "banner\nfooter"),               // all boilerplate: drops entirely
      (13L, "banner\na\n\nb"))               // blank line survives as structure
      .toDF("doc_id", "text")
    val inc = Dedup.dedupParagraphsIncremental(batch, Dedup.paragraphHashes(old))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // the equivalence contract: one-shot over the union, restricted to batch ids
    val oneShot = Dedup.dedupParagraphs(old.unionByName(batch))
      .filter(col("doc_id") >= 10L)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(inc.toSeq == oneShot.toSeq)
    // and the expected content explicitly
    assert(inc.map(_._1).toSeq == Seq(10L, 11L, 13L))
    assert(inc(0) == ((10L, "fresh gamma", 1L)))
    assert(inc(1) == ((11L, "tail two", 1L)))
    assert(inc(2) == ((13L, "a\n\nb", 3L)))
    // closing the loop: appending the batch's kept hashes to the store
    // makes a re-run of the SAME batch drop everything non-blank
    val grown = Dedup.paragraphHashes(old)
      .unionByName(Dedup.paragraphHashes(batch)).distinct()
    val rerun = Dedup.dedupParagraphsIncremental(batch, grown)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // only doc 13's blank structure row survives the second pass
    assert(rerun.toSeq == Seq((13L, "", 1L)))
  }
}
