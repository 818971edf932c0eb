package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tokens drop empties; counts stable under padding") {
    val df = Seq("  a  b   c  ", "a b c").toDF("text")
    assert(df.select(TextOps.tokenCount($"text")).as[Int].collect().toSeq == Seq(3, 3))
  }

  test("vertical tab is NOT a token separator (RE2 \\s alignment)") {
    // Java's \s would split on VT (0x0B); the engine's class must not — that
    // is what keeps Spark and the RE2-based DuckDB oracle byte-identical
    val df = Seq("a\u000Bb c", "a\tb c").toDF("text")
    assert(df.select(TextOps.tokenCount($"text")).as[Int].collect().toSeq == Seq(2, 3))
  }

  test("withQuality appends the same composite qualityScore computes, keeping all columns") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byScore = TextOps.qualityScore(docs)
      .as[(Long, Double)].collect().toMap
    val appended = TextOps.withQuality(docs)
    assert(appended.columns.toSeq ==
      docs.columns.toSeq :+ "quality")
    val got = appended.select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(got == byScore)
  }

  test("chunks: overlapping windows, short tail, empty docs drop out") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // single short chunk
      (3L, "")                                        // no chunks
    ).toDF("doc_id", "text")
    val got = TextOps.chunks(df, maxTokens = 4, overlap = 2)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1: starts 0,2,4,6,8 -> 5 chunks; last is the 2-token tail
    assert(got(1L).map(_._2).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(got(1L).head._4 == "w1 w2 w3 w4")
    assert(got(1L)(1)._4 == "w3 w4 w5 w6") // overlap of 2
    assert(got(1L).last == ((1L, 4L, 2L, "w9 w10")))
    assert(got(2L).toSeq == Seq((2L, 0L, 2L, "a b")))
    assert(!got.contains(3L))
  }

  test("PII redaction masks emails/IPs/SSNs/phones and counts per class") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.com from 10.0.0.1 or call (415) 555-2671"),
      (2L, "ssn 123-45-6789 stays out of the corpus"),
      (3L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val r = TextOps.redact(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    val t1 = r(1L).getString(r(1L).fieldIndex("text"))
    assert(t1.contains("<EMAIL>") && t1.contains("<IP>") && t1.contains("<PHONE>"))
    assert(!t1.contains("@") && !t1.contains("10.0.0.1"))
    assert(r(1L).getInt(r(1L).fieldIndex("n_email")) == 1)
    assert(r(2L).getString(r(2L).fieldIndex("text")).contains("<SSN>"))
    assert(r(2L).getInt(r(2L).fieldIndex("n_ssn")) == 1)
    assert(r(3L).getString(r(3L).fieldIndex("text")).endsWith("at all"))
    // masks are fixed tokens: redaction is idempotent
    val once = df.select(TextOps.redactPii($"text").as("t"))
    val twice = once.select(TextOps.redactPii($"t").as("t"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("stripHtml: scripts/styles/comments vanish, blocks break lines, entities decode") {
    val html =
      """<html><head><title>t</title><script type="x">if (a < b && c > d) { alert("<p>"); }</script>
        |<style>p { color: red; }</style></head>
        |<body><!-- junk --><h1 id="h">Head</h1>
        |<p>one &amp; two &lt;three&gt;</p><p>four&nbsp;five&#39;s</p>
        |<div><a href="/x">link</a> tail</div>
        |<span>inline</span> text</body></html>""".stripMargin
    val got = Seq(html).toDF("html").select(TextOps.stripHtml($"html")).as[String].head()
    // title text survives (only script/style content is removed); block
    // tags break lines; inline tags become spaces; whitespace normalizes
    assert(got ==
      "t\nHead\none & two <three>\nfour five's\nlink tail\ninline text")
    // the audit stats count on the raw html
    val stats = TextOps.htmlToText(Seq((1L, html)).toDF("doc_id", "html"))
      .select("n_tags", "n_links", "n_blocks").head()
    assert(stats.getInt(1) == 1 && stats.getInt(2) == 2, stats.toString)
    // escaped markup inside text round-trips: wrap -> strip recovers it
    val tricky = "a < b & c > d"
    val esc = tricky.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val round = Seq(s"<p>$esc</p>").toDF("html")
      .select(TextOps.stripHtml($"html")).as[String].head()
    assert(round == tricky)
    // "&amp;lt;" decodes to the literal text "&lt;", not to "<"
    val amp = Seq("<p>&amp;lt;</p>").toDF("html")
      .select(TextOps.stripHtml($"html")).as[String].head()
    assert(amp == "&lt;")
  }

  test("bpe-ish count adds subword pieces for long words") {
    val df = Seq(("a bb cccc ddddddddd", 1L)).toDF("text", "id")
    // 1 + 1 + 1 + ceil(9/4)=3 => 6
    assert(df.select(TextOps.tokenCountBpeish($"text")).as[Int].head() == 6)
  }

  test("fingerprint invariant under case, punctuation, whitespace runs") {
    val df = Seq(
      "The quick, brown fox!",
      "the   quick brown fox",
      "THE QUICK BROWN: FOX").toDF("text")
    assert(df.select(TextOps.fingerprint($"text")).as[String].collect().toSet.size == 1)
  }

  test("langid picks the dominant stopword language; unk on no hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house is in a that for it"),
      (2L, "der hund und die katze ist nicht ein das zu den"),
      (3L, "le chat et la maison les des un une est que dans"),
      (4L, "el perro y los gatos las que de un una es en"),
      (5L, "zzz qqq www")).toDF("doc_id", "text")
    val got = TextOps.langId(df).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "unk"))
  }

  test("n-gram langid recovers held-out labels; zero-overlap docs fall to unk") {
    // training corpora with genuinely different character distributions
    val train = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and the cats watch"),
      ("en", "there is nothing that the things with the weather cannot show"),
      ("de", "der schnelle braune fuchs springt ueber den faulen hund und schaut"),
      ("de", "die katzen schauen nicht zu waehrend das wetter schlecht wird"),
      ("fr", "le renard brun rapide saute par dessus le chien paresseux et regarde"),
      ("fr", "les chats ne regardent pas pendant que le temps devient mauvais"))
      .toDF("lang", "text")
    val docs = Seq(
      (1L, "the dog watches the things over there with the cats"),
      (2L, "der hund schaut die katzen waehrend das wetter schlecht ist"),
      (3L, "le chien regarde les chats pendant que le temps est mauvais"),
      (4L, "000 111 222"), // zero trigram overlap with any profile → still
      // classified by penalty arithmetic ONLY if some gram matches; the
      // digits share nothing → every language is a zero-match → unk
      (5L, "ab")) // shorter than n: no grams at all → unk, distance -1
      .toDF("doc_id", "text")
    val got = TextOps.langIdNgram(docs, train, k = 100)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == "en" && got(2L)._1 == "de" && got(3L)._1 == "fr",
      got.toString)
    assert(got(4L) == (("unk", -1L)) && got(5L) == (("unk", -1L)))
    // determinism: repartitioned input yields the identical mapping
    val again = TextOps.langIdNgram(docs.repartition(5), train.repartition(3), k = 100)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == got)
  }

  test("winnowing: shared-substring docs share fingerprints, unrelated don't") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "PREFIX alpha beta gamma delta epsilon zeta eta theta SUFFIX"), // big overlap
      (3L, "totally unrelated words nothing in common here at all okay")
    ).toDF("doc_id", "text")
    val pairs = TextOps.winnowingOverlapPairs(df, minShared = 2)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // determinism + guarantee: identical docs share ALL fingerprints
    val fps = TextOps.winnowingFingerprints(df).select("fingerprints")
      .as[Seq[Long]].collect()
    assert(fps(0).nonEmpty && fps(0).toSet.intersect(fps(1).toSet).size >= 2)
  }

  test("repetition ratio: 0 for all-distinct n-grams, high for a repeated phrase") {
    val df = Seq(
      (1L, "one two three four five six seven eight nine ten"), // all 3-grams distinct
      (2L, "spam phrase here spam phrase here spam phrase here spam phrase here"),
      (3L, "a b") // fewer tokens than n: no n-grams, ratio 0 by definition
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionRatio(df).as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == ((8L, 0.0)))
    // doc 2: 10 total 3-grams, only the 3 rotations of the phrase distinct
    assert(r(2L)._1 == 10L && r(2L)._2 == 0.7)
    assert(r(3L) == ((0L, 0.0)))
  }

  test("vocab head: top tokens by corpus frequency with deterministic tiebreak") {
    val df = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "beta gamma delta")).toDF("doc_id", "text")
    val v = TextOps.vocabHead(df, 3).as[(String, Long)].collect().toSeq
    assert(v == Seq(("alpha", 3L), ("beta", 3L), ("gamma", 2L))) // alpha<beta on tie
  }

  test("bigram head: adjacent pairs cross word boundaries, not docs; tiebreak") {
    val df = Seq(
      (1L, "a b a b c"),   // "a b"×2, "b a", "b c"
      (2L, "b c"),         // "b c"
      (3L, "solo")         // <2 tokens: no pairs
    ).toDF("doc_id", "text")
    val got = TextOps.bigramHead(df, 3).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 2L), ("b c", 2L), ("b a", 1L)))
  }

  test("salient terms: tf/df ranking with term-string tiebreak, k bound") {
    val df = Seq(
      (1L, "Apple apple banana zebra"), // lowercased: apple tf=2
      (2L, "banana cherry"),
      (3L, "apple cherry cherry")).toDF("doc_id", "text")
    // df: apple 2 docs, banana 2, cherry 2, zebra 1
    val got = TextOps.salientTerms(df, k = 3).orderBy("doc_id", "rk")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      // doc 1: apple 2/2=1.0 ties zebra 1/1=1.0 → term asc breaks it
      (1L, "apple", 2L, 2L, 1.0, 1L),
      (1L, "zebra", 1L, 1L, 1.0, 2L),
      (1L, "banana", 1L, 2L, 0.5, 3L),
      // doc 2: equal salience, banana < cherry
      (2L, "banana", 1L, 2L, 0.5, 1L),
      (2L, "cherry", 1L, 2L, 0.5, 2L),
      (3L, "cherry", 2L, 2L, 1.0, 1L),
      (3L, "apple", 1L, 2L, 0.5, 2L)))
    val k1 = TextOps.salientTerms(df, k = 1).collect()
    assert(k1.length == 3 && k1.forall(_.getLong(5) == 1L))
  }

  test("quality signals are in range and respond to structure") {
    val df = Seq(
      (1L, "the of and to in is a clean readable sentence with words"),
      (2L, "!!!;;;...,,,:::")).toDF("doc_id", "text")
    val q = TextOps.quality(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getDouble(4) == 0.0)         // punct_ratio clean
    assert(q(2L).getDouble(4) > 0.9)          // punct-only
    assert(q(1L).getDouble(5) > 0.3)          // stopword-rich
    val s = TextOps.qualityScore(df).as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L))
    assert(s.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("packChunks equals the single-partition window formulation + invariants") {
    val chunks = (1L to 300L).map(i => (i / 7, i % 7, 1L + i * 13 % 40))
      .toDF("doc_id", "chunk_id", "n_tokens")
    val cap = 100L
    val order = Seq(col("doc_id").asc, col("chunk_id").asc)
    val got = TextOps.packChunks(chunks, cap, order)
      .select("doc_id", "chunk_id", "pack_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // reference: unpartitioned running sum (the shape banned at scale)
    val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = chunks.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) DIV $cap"))
      .select("doc_id", "chunk_id", "pack_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === want)
    // invariants: pack ids contiguous from 0; totals < cap + max chunk
    val packs = TextOps.packChunks(chunks, cap, order)
      .groupBy("pack_id").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packs.keys.toSeq.sorted == (0L until packs.size).toSeq)
    val maxChunk = 40L
    packs.filter(_._1 < packs.size - 1) // last pack may be underfull
      .foreach { case (id, tot) => assert(tot < cap + maxChunk, s"pack $id tot=$tot") }
  }

  test("gopherRules: every rule flips on a crafted fixture; keep is the conjunction") {
    val good = (Seq("the", "be", "to", "of", "and") ++
      Seq.fill(60)("words")).mkString(" ") // 65 words, all rules pass
    val docs = Seq(
      (1L, good),
      (2L, "too few words here"),                         // fails word count
      (3L, (Seq.fill(60)("a") ++ Seq("the", "be")).mkString(" ")), // mean len < 3
      (4L, (Seq.fill(60)("## #word the be") : Seq[String]).mkString(" ")), // hash ratio
      (5L, good + " " + Seq.fill(20)("...").mkString(" ")), // ellipsis symbols
      (6L, (Seq.fill(60)("123456") ++ Seq("the", "be")).mkString(" ")), // alpha < 0.8
      (7L, Seq.fill(70)("zebra").mkString(" ")),            // no stopword hits
      (8L, (1 to 10).map(i => s"- bullet $i " + Seq.fill(5)("the be of and words").mkString(" ")).mkString("\n")), // all lines bullets
      (9L, (1 to 10).map(i => s"line $i the be of and words trailing...").mkString("\n")) // all lines ellipsis-ended
    ).toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    def flag(id: Long, name: String): Boolean =
      r(id).getBoolean(r(id).fieldIndex(name))
    assert(flag(1, "keep"), r(1).toString)
    assert(!flag(2, "r_word_count") && !flag(2, "keep"))
    assert(!flag(3, "r_mean_word_len") && flag(3, "r_stop"))
    assert(!flag(4, "r_hash"), r(4).toString)
    assert(!flag(5, "r_ellipsis") && flag(5, "r_word_count"))
    assert(!flag(6, "r_alpha") && flag(6, "r_mean_word_len"))
    assert(!flag(7, "r_stop") && flag(7, "r_word_count"))
    assert(!flag(8, "r_bullet") && flag(8, "r_stop"))
    assert(!flag(9, "r_ellipsis_lines") && flag(9, "r_bullet"))
    // rule independence: failing docs fail ONLY their targeted rule family
    assert(flag(5, "r_hash") && flag(8, "r_ellipsis_lines") && flag(9, "r_bullet"))
    // degenerate: empty text -> zero words, no division blowups
    val e = TextOps.gopherRules(Seq((10L, "")).toDF("doc_id", "text")).head()
    assert(e.getLong(e.fieldIndex("n_words")) == 0L)
    assert(!e.getBoolean(e.fieldIndex("keep")))
    // idCol collision guard
    intercept[IllegalArgumentException] {
      TextOps.gopherRules(docs.withColumnRenamed("doc_id", "keep"), idCol = "keep")
    }
  }

  test("bm25: matches a plain-Scala reference; top-k rank deterministic; guards") {
    val corpus = Seq(
      (1L, "join hash join scan"),
      (2L, "merge filter filter filter"),
      (3L, "join join join join hash"),
      (4L, "nothing relevant here at all"),
      (5L, ""))
    val docs = corpus.toDF("doc_id", "text")
    val terms = Seq("join", "hash", "filter")
    val got = TextOps.bm25(docs, terms, k = 3).collect()
    // independent reference computation (same formula, plain collections)
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val idf = terms.map { t =>
      val df = toks.values.count(_.contains(t))
      t -> math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    def score(id: Long): Double = terms.map { t =>
      val tf = toks(id).count(_ == t).toDouble
      val dl = toks(id).size.toDouble
      idf(t) * tf / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))
    }.sum
    val expect = corpus.map(_._1)
      .map(id => (id, math.rint(score(id) * 1e6) / 1e6))
      .sortBy { case (id, s) => (-s, id) }.take(3)
    assert(got.length == 3)
    got.zip(expect).zipWithIndex.foreach { case ((row, (eid, es)), i) =>
      assert(row.getLong(0) == eid, s"rank ${i + 1}")
      assert(math.abs(row.getDouble(2) - es) < 1e-9, s"score of $eid")
      assert(row.getLong(row.fieldIndex("rank")) == i + 1)
    }
    // tf columns surface the per-term counts
    val r3 = got.find(_.getLong(0) == 3L).get
    assert(r3.getLong(r3.fieldIndex("tf_join")) == 4L)
    assert(r3.getLong(r3.fieldIndex("tf_hash")) == 1L)
    // empty corpus: typed empty frame, schema intact
    val empty = TextOps.bm25(Seq.empty[(Long, String)].toDF("doc_id", "text"), terms)
    assert(empty.columns.toSeq ==
      Seq("doc_id", "n_tokens", "score", "tf_join", "tf_hash", "tf_filter", "rank"))
    assert(empty.count() == 0)
    // guards
    intercept[IllegalArgumentException] { TextOps.bm25(docs, Seq.empty) }
    intercept[IllegalArgumentException] { TextOps.bm25(docs, Seq("Join")) }
    intercept[IllegalArgumentException] { TextOps.bm25(docs, Seq("a", "a")) }
    intercept[IllegalArgumentException] {
      TextOps.bm25(docs.withColumnRenamed("doc_id", "score"), terms, idCol = "score")
    }
  }

  test("drift report: conforming source scores near zero, skewed source far above") {
    // blend is 50/50 "a b"; src_same mirrors it, src_skew is all-"a"
    val docs = (Seq.fill(50)(("src_same", "a b")) ++
      Seq.fill(25)(("src_skew", "a a")) ++ Seq.fill(25)(("src_other", "a b")))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val out = TextOps.driftReport(docs, vocabSize = 8)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out.keySet == Set("src_same", "src_skew", "src_other"))
    // smoothed KL over a complete bucketing is >= 0 (nano-rounding slack)
    out.values.foreach(kl => assert(kl >= -1e-6, s"negative KL: $out"))
    assert(out("src_skew") > 0.3, out.toString)
    assert(out("src_same") < 0.06 && out("src_other") < 0.06, out.toString)
  }

  test("drift metrics: psi symmetric-signal, jsd bounded by ln 2, both ~0 on a conforming source") {
    val docs = (Seq.fill(50)(("src_same", "a b")) ++
      Seq.fill(25)(("src_skew", "a a")) ++ Seq.fill(25)(("src_other", "a b")))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    for (metric <- Seq("psi", "jsd")) {
      val out = TextOps.driftReportMetric(docs, metric, vocabSize = 8)
      assert(out.columns.toSeq == Seq("source", "n_tokens", "oov_tokens", metric))
      val m = out.as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r._4).toMap
      m.values.foreach(v => assert(v >= -1e-6, s"negative $metric: $m"))
      assert(m("src_skew") > m("src_same") * 3, s"$metric no signal: $m")
      // smoothing noise floor differs per metric ((p−q) weighting inflates
      // PSI's baseline vs KL's); the conforming sources still sit an order
      // of magnitude under the skewed one
      assert(m("src_same") < 0.1 && m("src_other") < 0.1, m.toString)
      if (metric == "jsd") // JSD <= ln 2 always, however skewed
        m.values.foreach(v => assert(v <= math.log(2) + 1e-6, m.toString))
    }
    intercept[IllegalArgumentException] {
      TextOps.driftReportMetric(docs, "hellinger")
    }
  }

  test("drift report: OOV bucket carries the tail when the cap engages") {
    val docs = Seq((0L, "x x x x rare1 rare2", "s0"), (1L, "x x x x rare3 rare4", "s1"))
      .toDF("doc_id", "text", "source")
    val rows = TextOps.driftReport(docs, vocabSize = 1) // only "x" in-vocab
      .as[(String, Long, Long, Double)].collect()
    rows.foreach { case (_, n, oov, _) => assert(n == 6 && oov == 2) }
  }

  test("heavy hitters: exact regime equals exact counts across partitionings") {
    // 40 terms, zipfish counts; capacity 64 > 40 → no decrement ever fires
    val rows = (0 until 40).flatMap(i => Seq.fill(200 / (i + 1))(s"t$i"))
    val expected = rows.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    for (parts <- Seq(1, 7)) { // single partial vs a real partial->merge tree
      val df = rows.toDF("w").repartition(parts)
        .select(concat(lit("x "), col("w")).as("text")) // 2 tokens/row: exercise explode
      val got = TextOps.heavyHitters(df, capacity = 64, k = 10)
        .as[(String, Long)].collect().toSeq
      // "x" itself is the top term (one per row); drop it to compare the rest
      assert(got.head._1 == "x" && got.head._2 == rows.size.toLong)
      assert(got.tail == expected.take(9))
    }
  }

  test("heavy hitters: Misra-Gries guarantees hold under eviction pressure") {
    // 500 distinct terms >> capacity 50; one heavy term at 30% of the stream
    val stream = (0 until 3000).map(i => if (i % 3 == 0) "heavy" else s"r${i % 500}")
    val n = stream.size
    val cap = 50
    val df = stream.toDF("text") // one token per row
    val got = TextOps.heavyHitters(df.repartition(5), capacity = cap, k = cap)
      .as[(String, Long)].collect().toMap
    val truth = stream.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    // presence: every term with true count > n/cap must be in the summary
    truth.filter(_._2 > n / cap).keys.foreach(t => assert(got.contains(t), t))
    // error: every estimate is an undercount by at most n/cap
    got.foreach { case (t, est) =>
      val tc = truth(t)
      assert(est <= tc && tc - est <= n / cap, s"$t est=$est true=$tc")
    }
  }

  test("lmScore: reference-like text scores lower nll than shuffled gibberish") {
    val ref = (0 until 40).map(i => (i.toLong, "the quick fox jumps over the lazy dog " +
      "and the dog runs after the quick fox"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (100L, "the quick fox jumps over the lazy dog"), // in-distribution
      (101L, "dog the after lazy jumps runs fox the")) // same words, broken order
      .toDF("doc_id", "text")
    val got = TextOps.lmScore(probe, ref)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(100L, 101L))
    assert(got(0)._2 == 7 && got(1)._2 == 7) // 8 tokens -> 7 bigrams
    assert(got(0)._4 < got(1)._4,
      s"fluent ${got(0)._4} should beat shuffled ${got(1)._4}")
    // exact integer nll: recompute one doc by hand-counting the model
    assert(got(0)._3 > 0 && got(0)._3 == math.round(got(0)._4 * 7 * 1e9 / 1e0) ||
      math.abs(got(0)._3 / 1e9 / 7 - got(0)._4) < 5e-5) // 4dp rounding consistency
    // docs shorter than 2 tokens produce no row
    val tiny = TextOps.lmScore(Seq((1L, "solo")).toDF("doc_id", "text"), ref)
    assert(tiny.count() == 0)
  }

  test("default language profiles generalize to HELD-OUT sentences") {
    // none of these sentences appear in graft_lang_samples.tsv — the
    // profiles must classify them from character statistics alone
    val held = Seq(
      (0L, "en", "The weather was cold yesterday and the children stayed at home reading their favourite books together."),
      (1L, "de", "Gestern war das Wetter sehr kalt und die Kinder blieben zu Hause und lasen gemeinsam ihre Lieblingsbücher."),
      (2L, "fr", "Hier le temps était très froid et les enfants sont restés à la maison pour lire ensemble leurs livres préférés."),
      (3L, "es", "Ayer el tiempo estaba muy frío y los niños se quedaron en casa leyendo juntos sus libros favoritos."),
      (4L, "it", "Ieri il tempo era molto freddo e i bambini sono rimasti a casa a leggere insieme i loro libri preferiti."),
      (5L, "pt", "Ontem o tempo estava muito frio e as crianças ficaram em casa lendo juntas os seus livros favoritos."),
      (6L, "nl", "Gisteren was het weer erg koud en de kinderen bleven thuis om samen hun lievelingsboeken te lezen."),
      (7L, "zh", "昨天天气很冷，孩子们留在家里一起阅读他们最喜欢的书籍，度过了安静的下午。"))
      .toDF("doc_id", "lang", "text")
    val pred = TextOps.langIdNgramDefault(held)
      .join(held.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val hits = pred.filter(col("lang_pred") === col("lang")).count()
    // 8 distinct languages from ~300-char profiles: allow one romance-
    // family confusion, no more
    assert(hits >= 7, s"only $hits/8 held-out sentences recovered")
    // the resource itself is well-formed: >= 8 languages, tab-separated
    assert(TextOps.defaultLangSamples.size >= 8 &&
      TextOps.defaultLangSamples.forall { case (l, t) => l.nonEmpty && t.length > 80 })
  }
}
