package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (r6 VERDICT item 6 — the last visible
  * LLM-pipeline gap): bounded-round byte-pair-encoding merge learning in
  * the Sennrich et al. 2016 formulation — train on the DISTINCT-WORD
  * frequency table, not the raw corpus. That is the whole 100 TB story:
  * the corpus is scanned and shuffled exactly ONCE (word counts); every
  * merge round then runs against the word table, which is
  * vocabulary-sized (Heaps' law: ~millions of rows for a 100 TB corpus,
  * KBs per executor core), so k training rounds cost k small shuffles
  * over a bounded table plus one corpus aggregation — not k corpus
  * passes. And because that table is model-parameter-scale, training is
  * two-tier ([[trainMerges]]): below a vocab threshold the table
  * collects once and the loop runs driver-side with zero per-round jobs;
  * the distributed rounds are the above-threshold path.
  *
  * Each round: adjacent-symbol pair counts weighted by word frequency
  * (one shuffle over the word table) → the single best pair collects to
  * the driver (one row — model-parameter scale, the trainCells
  * precedent) → a map-only merge application rewrites the symbol arrays
  * (no shuffle). The per-round word table is ledger-cached and the
  * previous round released, so k rounds hold one table's footprint.
  *
  * Deterministic: best pair = max count, ties broken (left, right)
  * lexicographically ascending. Not SQL-expressible (iterative
  * state-dependent rewriting), so the roster entry is golden-pinned and
  * the semantic argument is an equivalence unit against
  * [[referenceMerges]], a plain-loop driver-side implementation.
  */
object Bpe {

  /** One learned merge rule: `left`+`right` fuse into one symbol. */
  case class MergeRule(rank: Int, left: String, right: String, pair_count: Long)

  /** End-of-word marker (the standard Sennrich convention): lets a merge
    * distinguish word-final fragments ("st&lt;/w&gt;") from interior ones.
    */
  val EOW = "</w>"

  /** Greedy left-to-right non-overlapping merge application — after a
    * fusion at i the scan resumes at i+2, so "aaa" under merge (a,a)
    * becomes ["aa","a"], matching the reference BPE implementations.
    */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        buf += l + r; i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  private def toSymbols(w: String): Array[String] =
    w.map(_.toString).toArray :+ EOW

  /** Driver-side reference implementation (plain loops, no Spark) — the
    * equivalence oracle for the distributed path on small fixtures.
    */
  def referenceMerges(wordCounts: Seq[(String, Long)], k: Int): Seq[MergeRule] = {
    var words = wordCounts.map { case (w, c) => (toSymbols(w), c) }
    val out = Seq.newBuilder[MergeRule]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += MergeRule(rank, l, r, n)
        words = words.map { case (syms, c) => (applyMerge(syms, l, r), c) }
        rank += 1
      }
    }
    out.result()
  }

  /** The trainer — two tiers picked by vocabulary size, the
    * [[graft.operators.Dedup.clustersFromPairs]] precedent. The word
    * table is the state every round reads, and it is bounded by the
    * vocabulary, not the corpus (Heaps' law): under `localVocab` distinct
    * words — the overwhelmingly common case; 2M (word,count) rows is tens
    * of MB — a single limit-probe collect fetches it AND picks the tier,
    * then the merge loop runs driver-side as plain arrays
    * ([[referenceMerges]]): zero per-round Spark jobs. Above the
    * threshold the probe is discarded and the k-round distributed path
    * runs (one small shuffle per round over the cached vocab table). The
    * tiers are interchangeable by construction — same counts, same
    * (-count, left, right) tiebreak — and the equivalence is spec-pinned
    * with the distributed tier forced via `localVocab = 0`.
    *
    * The driver loop is O(k·Σ|word|) with no priority queue, fine at the
    * bounded k this module enforces; a caller pushing k toward the 10000
    * cap over a huge vocab should lower `localVocab` to keep the rounds
    * distributed. Returns at most `k` rules (fewer when the corpus runs
    * out of adjacent pairs first).
    */
  def trainMerges(docs: DataFrame, k: Int, textCol: String = "text",
                  localVocab: Long = 2000000L): Seq[MergeRule] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 0 && k <= 10000, s"merge rounds $k out of sane range")
    if (k == 0) return Seq.empty
    // the ONE corpus-scale pass: whitespace words -> (word, count).
    // Everything after runs on this vocabulary-sized table.
    val wcDf = docs
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .toDF.trackedCache
    // one action picks the tier AND fetches the vocab; limN caps what
    // collect can fetch, and the acceptance compares against it too, so a
    // threshold above Int range can't pass a TRUNCATED probe to the
    // driver loop as the complete vocabulary
    val limN = math.min(localVocab, Int.MaxValue - 2L).toInt.max(1)
    val probe = wcDf.limit(limN + 1).collect()
    if (probe.length < localVocab && probe.length <= limN) {
      wcDf.unpersist(blocking = false)
      return referenceMerges(
        probe.toSeq.map(r => (r.getString(0), r.getLong(1))), k)
    }
    var cur: Dataset[(Array[String], Long)] =
      wcDf.as[(String, Long)].map { case (w, c) => (toSymbols(w), c) }
    var curDf = cur.toDF.trackedCache
    cur = curDf.as[(Array[String], Long)]
    // materialize the symbol table before releasing the word table, or
    // round 1 would recompute the corpus aggregation through the lineage
    curDf.count()
    wcDf.unpersist()
    val out = Seq.newBuilder[MergeRule]
    var rank = 0
    var done = false
    try {
      while (rank < k && !done) {
        // one small shuffle: weighted adjacent-pair counts over the vocab
        val top = cur.flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
        }.toDF("l", "r", "c")
          .groupBy("l", "r").agg(sum("c").as("n"))
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val l = top(0).getString(0); val r = top(0).getString(1)
          out += MergeRule(rank, l, r, top(0).getLong(2))
          // map-only rewrite; cache the round, release the previous one —
          // AFTER materializing the new cache, or the unpersist would send
          // round r+1 back through r chained recomputes of the lineage
          val nextDf = cur.map { case (syms, c) => (applyMerge(syms, l, r), c) }
            .toDF.trackedCache
          nextDf.count()
          curDf.unpersist()
          curDf = nextDf
          cur = curDf.as[(Array[String], Long)]
          rank += 1
        }
      }
    } finally curDf.unpersist()
    out.result()
  }

  /** Roster shape: the learned merge table as a DataFrame (driver-built
    * LocalTableScan — k rows of model parameters, the scan-free re-entry
    * precedent). `merged` spells the fused symbol so the table doubles as
    * a usable tokenizer artifact.
    */
  def mergesDf(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    trainMerges(docs, k).toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
      .orderBy("rank")
  }

  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[MergeRule]]()
  private[graft] val trainFits = new java.util.concurrent.atomic.AtomicLong(0)

  /** In-process model cache for the train→encode pipeline — the
    * [[graft.operators.Similarity.trainCellsCached]] precedent, memory
    * tier: the merge list is model parameters (k ≤ 10000 rows); a
    * serving-path caller (encode the corpus with a trained tokenizer)
    * fits once and reuses, exactly like IVF centroids. Keyed by input
    * files + canonicalized plan + params, so a filtered/projected subset
    * of the same files trains separately; frames with no file lineage
    * (in-memory test relations) bypass the cache — their canonical plans
    * embed expression ids, not data, so keying on them would be unsound.
    */
  def trainMergesCached(docs: DataFrame, k: Int, textCol: String = "text"): Seq[MergeRule] = {
    val files = docs.inputFiles.toSeq.sorted.mkString(",")
    if (files.isEmpty) trainMerges(docs, k, textCol)
    else {
      val key =
        s"$files|${docs.queryExecution.analyzed.canonicalized.toString}|$k|$textCol"
      mergeCache.computeIfAbsent(key, _ => {
        trainFits.incrementAndGet()
        trainMerges(docs, k, textCol)
      })
    }
  }

  /** Encode one word with a learned merge list, applying merges in RANK
    * ORDER — which reproduces the training-time rewriting exactly, so
    * encode∘train is self-consistent by construction (unit-pinned). A
    * rank-ordered sweep is O(k·|word|); past ~10k merges the
    * pair-priority-queue formulation wins — out of scope at the bounded
    * k this module enforces, and swapping it changes no results.
    */
  def encode(word: String, merges: Seq[MergeRule]): Array[String] =
    merges.foldLeft(toSymbols(word)) { (syms, m) =>
      // a word shorter than the pair can't contain it; skip the scan
      if (syms.length < 2) syms else applyMerge(syms, m.left, m.right)
    }

  /** Subword-tokenize the corpus with a merge list: the full
    * train-then-encode pipeline when fed [[trainMerges]]' output. The
    * encode pass is MAP-ONLY — zero shuffles: the merge list is model
    * parameters riding the task closure (k ≤ 10000 bounded), and each
    * document's words encode independently. Per doc: whitespace word
    * count, subword count after merging, and the count of multi-char
    * subwords the merges created — the tokenizer-compression diagnostic
    * (subwords/word is what a vocab buys you).
    */
  def encodeDf(docs: DataFrame, merges: Seq[MergeRule],
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges // stable local for the closure
    docs.select(col(idCol).cast("long"), lower(col(textCol)).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
        var subwords = 0L
        var fused = 0L
        words.foreach { w =>
          val enc = encode(w, ms)
          subwords += enc.length
          // a fused symbol is multi-char and not the bare EOW marker
          fused += enc.count(s => s.length > 1 && s != EOW)
        }
        (id, words.length.toLong, subwords, fused)
      }
      .toDF(idCol, "n_words", "n_subwords", "n_fused")
      .orderBy(idCol)
  }
}
