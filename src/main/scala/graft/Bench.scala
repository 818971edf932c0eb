package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{ConcurrentHashMap, Executors}
import scala.jdk.CollectionConverters._

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Built to survive an external timeout (round 1 died rc=124 with no
  * output — sbt launch + compile + serial warmup overran the window):
  *   - the warmup pass runs on a thread pool (Spark interleaves the jobs,
  *     overlapping per-query codegen/planning with execution — the same
  *     ~3x wall win Verify.scala measured), and each warmup duration is
  *     recorded as a pessimistic fallback timing;
  *   - a JVM shutdown hook prints the JSON line from whatever has been
  *     measured so far, so even a SIGTERM'd run yields a parseable
  *     artifact (run/fork := true → sbt forwards the TERM to this JVM);
  *   - the timed pass is serial (accurate latencies) and runs each query
  *     three times: the contract line reports min(), the sidecar's median
  *     is a true 3-sample median, and the min-median spread doubles as a
  *     per-query noise estimate for cross-round diffing.
  *
  * Warmup-first because the first execution of each plan shape pays
  * JIT + whole-stage-codegen (janino) compilation, a per-process constant
  * rather than a per-data cost; the timed pass reports steady-state
  * throughput, which is what scales with data volume.
  */
object Bench {
  private val timings = new ConcurrentHashMap[String, Double]()
  // warmup durations: fallback ONLY (used by emit when a query has no
  // timed entry, e.g. the run was SIGTERM'd mid-pass). Never min()'d
  // against timed numbers — a warmup run can be cache-assisted by a
  // sibling thread's shared subplan cache and undercut honest compute.
  private val warmupTimings = new ConcurrentHashMap[String, Double]()
  // every timed-pass sample (warmup excluded — pool contention inflates)
  private val samples =
    new ConcurrentHashMap[String, java.util.concurrent.CopyOnWriteArrayList[Double]]()
  private val failures = ConcurrentHashMap.newKeySet[String]()
  // fixed-work host-speed samples (see calSample) — read by emit
  private val calSamples = new java.util.concurrent.CopyOnWriteArrayList[Double]()
  @volatile private var printed = false
  // the contract roster (warmup + 3 timed reps + calibration) finished:
  // a SIGTERM after this point — e.g. during the scale tier — must still
  // emit partial=false, because every contract measurement completed
  @volatile private var rosterComplete = false
  private val lock = new Object

  /** The driver-contract JSON line (exposed for the format unit test —
    * a malformed line silently costs a whole round's perf evidence).
    *
    * Values render with trailing zeros trimmed at `dp` decimals. The
    * driver's log-tail capture is a 2000-char window and r3's
    * full-precision line (1983 chars) + sbt's trailing "[success]" line
    * overran it, truncating the line's head — three rounds of
    * parsed:null. Since r17 the stdout line renders 2dp (VERDICT r16:
    * 1dp quantization made dozens of 0.1→0.2 "regressions" unreadable)
    * and fits the window by eliding the fastest queries instead of
    * compressing keys — see [[stdoutLine]].
    */
  private def fmt(v: Double, dp: Int): String = {
    val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    // "0.20" -> "0.2", "1.00" -> "1" (still legal JSON)
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
  }

  /** `medians`: per-query MEDIAN over the timed runs, rendered as a
    * sidecar-only "queries_median" object — the stdout line stays
    * min-only for the tail window. min vs median separates "best honest
    * run" from "typical run" so a round-over-round delta can be told
    * apart from host noise (VERDICT r5 item 6).
    *
    * `shortKeys` — RETIRED r17 (the driver could not match compacted
    * keys back to query names; see [[stdoutLine]]). The machinery and
    * its specs stay because the r13-r16 driver captures carry these
    * keys and tools/bench_diff.py expands them when diffing those
    * vintages. Original rationale (r7, extended late-r7 when
    * the 97-query roster left <15 chars of headroom): on the stdout line
    * ONLY, (1) the per-query object renders under `"q"` instead of
    * `"queries"`, (2) every query key drops the uniform `q_` prefix, and
    * (3) the nine high-population family prefixes abbreviate through
    * [[famAbbrev]] (`agg_sum` → `a_sum`, `multimodal_pixels` →
    * `m_pixels`). Mapping back is mechanical and collision-free: restore
    * the family via the inverse map (no original first-underscore
    * component is a single letter), then prepend `"q_"`. The SIDECAR
    * (bench_out.json) keeps FULL names and the `"queries"` key — any
    * per-query tooling (tools/bench_diff.py included) reads the sidecar;
    * the stdout line exists for the driver's log-tail capture. "partial"
    * and "failed" stay always-present (r6 ADVICE: omitted keys NPE a
    * presence-asserting parser).
    */
  private[graft] val famAbbrev = Map(
    "agg" -> "a", "dedup" -> "d", "filter" -> "f", "multimodal" -> "m",
    "sample" -> "p", "sim" -> "s", "stream" -> "w", "text" -> "t",
    "tpch" -> "h", "tier" -> "i",
    // late-r7 extension (the audio lane left 11 chars of tail-window
    // headroom): every remaining multi-member or long family. Same
    // inverse rule — no original first component is 1 char (spec-checked)
    "sessionize" -> "z", "delete" -> "e", "store" -> "o", "index" -> "x",
    "ingest" -> "g", "layout" -> "l", "approx" -> "b", "window" -> "u",
    "moving" -> "n", "pivot" -> "c", "ntile" -> "k", "vec" -> "v",
    "ts" -> "y", "range" -> "r", "join" -> "j")

  /** r8 automation (r7 VERDICT item 7): the static map above is a SEED —
    * every family in the actual roster that it doesn't cover gets a free
    * single character assigned here, deterministically (descending family
    * population, then name; prefer the family's own letters, then any
    * unused letter/digit), so a growing roster never again needs the map
    * hand-extended to stay inside the tail window. The inverse stays
    * mechanical and collision-free by construction: an abbrev char is
    * never a character that is itself a roster family name, and never
    * shadows a bare (underscore-free) query name.
    */
  private[graft] def abbrevFor(names: Seq[String]): Map[String, String] = {
    val bares = names.map(_.stripPrefix("q_"))
    val fams = bares.filter(_.contains('_'))
      .groupBy(_.takeWhile(_ != '_')).view.mapValues(_.size).toMap
    val used = scala.collection.mutable.Set[String]() ++
      famAbbrev.values ++ bares.filterNot(_.contains('_'))
    val out = scala.collection.mutable.Map[String, String]() ++ famAbbrev
    // 'q' is never assigned: "q_foo" would read as a full query name to
    // anyone pattern-matching the stripped "q_" prefix
    fams.keys.toSeq.filterNot(out.contains).filter(_.length > 1)
      .sortBy(f => (-fams(f), f))
      .foreach { f =>
        (f + "abcdefghijklmnopqrstuvwxyz0123456789").filterNot(_ == 'q').map(_.toString)
          .find(c => !used(c) && !fams.contains(c))
          .foreach { c => out(f) = c; used += c }
      }
    out.toMap
  }
  /** r13 trim (the 142-query roster dropped the middle tier below its 85%
    * detail floor): rendered short keys with the SUFFIX truncated to its
    * shortest ≥`minLen`-char collision-free prefix over the whole roster
    * (`d_containment` → `d_cont`; already-short keys untouched; a
    * collision group extends together until distinct, so the map is
    * deterministic and injective for any roster). Returns full name →
    * rendered key. Applied by [[stdoutLine]] only when the uncompacted
    * line overflows the budget — the sidecar always keeps full names.
    */
  private[graft] def compactKeys(names: Seq[String],
                                 abbrev: Map[String, String],
                                 minLen: Int = 2,
                                 minBare: Int = 4,
                                 sep: String = "_"): Map[String, String] = {
    def rendered(n: String): (String, String) = { // (prefix, suffix)
      val bare = n.stripPrefix("q_")
      val cut = bare.indexOf('_')
      if (cut < 0) (bare, "")
      else (abbrev.get(bare.substring(0, cut)).fold(bare.substring(0, cut))(identity),
        bare.substring(cut + 1))
    }
    val parts = names.map(n => n -> rendered(n)).toMap
    // every colliding group extends its members' truncation one char at a
    // time until all keys differ; terminates because the UNtruncated short
    // keys are distinct (spec-gated round-trip property). r14 trim: bare
    // single-word names ("decontaminate") truncate too, to a ≥minBare
    // collision-free prefix — the 152-query roster pushed the compacted
    // line one entry past the budget, and the long tail was exactly those
    // family-less names (cross-round key matching canonically uses the
    // sidecar's FULL names, so the render may shorten; bench_diff.py
    // reads bench_out.json when driver-capture keys don't expand).
    val lens = scala.collection.mutable.Map(
      names.map(n => n -> (if (parts(n)._2.isEmpty) minBare else minLen)): _*)
    def keyOf(n: String): String = parts(n) match {
      case (p, "") => p.take(lens(n))
      // a truncation landing on '_' would render a dangling separator;
      // the fused tier (sep="") drops INTERNAL suffix underscores too —
      // injectivity is re-proven over whatever this renders
      case (p, s) =>
        val cut = s.take(lens(n)).reverse.dropWhile(_ == '_').reverse
        p + sep + (if (sep.isEmpty) cut.replace("_", "") else cut)
    }
    def fullLen(n: String): Int = parts(n) match {
      case (p, "") => p.length
      case (_, s) => s.length
    }
    var changed = true
    while (changed) {
      changed = false
      names.groupBy(keyOf).values.filter(_.size > 1).foreach { grp =>
        grp.foreach { n =>
          if (lens(n) < fullLen(n)) { lens(n) += 1; changed = true }
        }
      }
    }
    // a group can exit the loop still colliding (every member's suffix
    // fully extended, or the trailing-underscore trim re-merged two fully
    // extended keys) — duplicate JSON keys on the stdout line would make
    // the driver's parse keep only one. Such groups fall back to their
    // UNtruncated short keys, which the spec-gated round-trip property
    // guarantees distinct; the require turns any violation into a loud
    // failure instead of a silently dropped query.
    val out = scala.collection.mutable.Map(names.map(n => n -> keyOf(n)): _*)
    out.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      grp.keys.foreach { n =>
        out(n) = parts(n) match {
          case (p, "") => p
          case (p, s) => p + sep + s
        }
      }
    }
    require(out.values.toSet.size == names.distinct.size,
      s"compactKeys failed to render injective keys for ${names.size} queries")
    out.toMap
  }

  private[graft] def formatLine(ts: Seq[(String, Double)], failed: Seq[String],
                                sfDir: String, partial: Boolean,
                                dp: Int = 1,
                                medians: Option[Map[String, Double]] = None,
                                shortKeys: Boolean = false,
                                overflow: Int = 0,
                                totalOverride: Option[Double] = None,
                                abbrevOverride: Option[Map[String, String]] = None,
                                keyOverride: Option[Map[String, String]] = None,
                                calibration: Option[(Double, Double, Int)] = None,
                                sidecar: Option[String] = None): String = {
    // abbrevOverride: the middle tier prints a SUBSET of the roster, and
    // auto-assignment is population-ordered — recomputing it over the
    // subset could assign different chars than the full roster (breaking
    // cross-round key matching in tools/bench_diff.py), so stdoutLine
    // computes the assignment ONCE over the full roster and passes it in
    val abbrev = abbrevOverride.getOrElse(
      if (shortKeys) abbrevFor(ts.map(_._1) ++ failed) else famAbbrev)
    def key(n: String): String = if (!shortKeys) n else
      keyOverride.flatMap(_.get(n)).getOrElse {
        val bare = n.stripPrefix("q_")
        val cut = bare.indexOf('_')
        if (cut < 0) bare
        else abbrev.get(bare.substring(0, cut))
          .fold(bare)(_ + bare.substring(cut))
      }
    val qKey = if (shortKeys) "q" else "queries"
    val qs = ts.map { case (k, v) => "\"" + key(k) + "\":" + fmt(v, dp) }
      .mkString("{", ",", "}")
    val med = medians.fold("") { m =>
      ts.map { case (k, _) => "\"" + key(k) + "\":" + fmt(m.getOrElse(k, 0.0), dp) }
        .mkString(",\"queries_median\":{", ",", "}")
    }
    val total = fmt(totalOverride.getOrElse(ts.map(_._2).sum), 2)
    val ovf = if (overflow > 0) s""","q_overflow":$overflow""" else ""
    // fixed-work host-speed calibration (r8 VERDICT item 3): two keys, so
    // a cross-round diff can divide out host-window noise instead of the
    // judge re-deriving it by hand. Always 2dp — sub-second resolution is
    // the whole point; ~30 chars against the stdout budget.
    // cal_parts names the calibration WORKLOAD vintage (its partition
    // count): bench_diff.py only divides by the cal ratio when both
    // artifacts ran the same-shaped calibration — r10's hard-coded 32
    // and a defaultParallelism!=32 run are different workloads, and
    // their ratio would conflate code vintage with host speed.
    val cal = calibration.fold("") { case (mn, md, parts) =>
      s""","cal_min":${fmt(mn, 2)},"cal_median":${fmt(md, 2)},"cal_parts":$parts""" }
    // the sidecar path on the line (VERDICT r16 item 1 fix-note): any
    // reader of the stdout line can find the full-roster 2dp + medians
    // artifact without knowing the SPARK_GRAFT_BENCH_OUT convention
    val side = sidecar.fold("")(p => s""","sidecar":"$p"""")
    val pf = s""","partial":$partial""" +
      failed.map("\"" + key(_) + "\"").mkString(""","failed":[""", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","$qKey":$qs$ovf$med$cal$side,"sf":"$sfDir"$pf}"""
  }

  /** The stdout emission with the budget guard.
    *
    * r17 FORMAT (VERDICT r16 items 1-2): the driver verifies per-query
    * perf by matching the line's keys against the full `q_*` roster
    * names — the r13-r16 compacted keys made `PERF_r*.json`'s
    * `per_query` EMPTY (`n_common: 0`) two rounds running even though
    * every number was on the line, so round-over-round and core-scaling
    * verification existed only by hand. FULL names now outrank the r13
    * "every query on the line" floor: the full-name 2dp line when it
    * fits the driver's ~1925-char tail window; otherwise the SLOWEST-K
    * full-named queries that fit (K by binary search — 82 of the
    * 164-query roster at r17 widths, everything at or above ~0.23s) with
    * `q_overflow` counting the elided fast tail and `value` still the
    * FULL roster total. An elided 0.1-0.2s query is 1-2 tail-window
    * quantization units of information; an unmatchable key is a lost
    * round of per-query evidence. The sidecar (its path now printed ON
    * the line) keeps the full roster at 2dp plus medians; the retired
    * compact-key tiers below stay only for r13-r16 artifact archaeology
    * (tools/bench_diff.py's expansion map reads those vintages).
    */
  private[graft] val stdoutBudget = 1895
  private[graft] def stdoutLine(snap: Seq[(String, Double)], failed: Seq[String],
                                sfBase: String, partial: Boolean,
                                calibration: Option[(Double, Double, Int)] = None,
                                sidecar: Option[String] = None): String = {
    val full = formatLine(snap, failed, sfBase, partial, dp = 2,
      calibration = calibration, sidecar = sidecar)
    if (full.length <= stdoutBudget) return full
    val total = snap.map(_._2).sum
    val byTime = snap.sortBy { case (n, v) => (-v, n) }
    def lineFor(k: Int): String =
      formatLine(byTime.take(k).sortBy(_._1), failed, sfBase, partial,
        dp = 2, overflow = snap.size - k, totalOverride = Some(total),
        calibration = calibration, sidecar = sidecar)
    // largest k whose line fits (monotone in k)
    var lo = 0; var hi = snap.size
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (lineFor(mid).length <= stdoutBudget) lo = mid else hi = mid - 1
    }
    if (lo > 0) lineFor(lo)
    else {
      val pf = s""","partial":$partial""" +
        failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
      val fb = s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":{},""" +
        s""""q_overflow":${snap.size},"sf":"$sfBase"$pf}"""
      // a huge failed list could overflow even the fallback: count instead
      if (fb.length <= stdoutBudget) fb
      else s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":{},""" +
        s""""q_overflow":${snap.size},"sf":"$sfBase","partial":$partial,""" +
        s""""failed":[],"failed_count":${failed.size}}"""
    }
  }

  /** Print the result line exactly once (normal end or shutdown hook). */
  private def emit(sfDir: String, partial: Boolean): Unit = lock.synchronized {
    if (printed) return
    val merged = (warmupTimings.asScala ++ timings.asScala).toMap // timed wins
    val snap = merged.toSeq.sortBy(_._1)
    if (snap.isEmpty) return // nothing measured: stay silent, don't lie
    val failed = failures.asScala.toSeq.sorted
    val cal = {
      val s = calSamples.asScala.toSeq.sorted
      if (s.isEmpty) None
      else Some((s.head,
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2,
        calParts.get()))
    }
    // The sidecar is not tail-window-bound, so it carries 2dp values AND
    // the per-query medians over the timed runs (min alone can't separate
    // a real regression from one lucky run on a ±40%-noise host).
    val medians = snap.map { case (n, fallback) =>
      val s = Option(samples.get(n)).map(_.asScala.toSeq.sorted).getOrElse(Nil)
      n -> (if (s.isEmpty) fallback // killed run: warmup fallback, like min
            else if (s.size % 2 == 1) s(s.size / 2)
            else (s(s.size / 2 - 1) + s(s.size / 2)) / 2)
    }.toMap
    val sidecar = formatLine(snap, failed, sfDir, partial, dp = 2,
      medians = Some(medians), calibration = cal)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    // FULL-ROSTER full-name map as a second stdout line, ahead of the
    // contract line (VERDICT r16 item 1): a full-log reader gets every
    // query under its real name even when the contract line elides the
    // fast tail; printed FIRST so the contract line stays the LAST (and
    // tail-window-resident) JSON line.
    println(sidecar)
    // contract line: sf as basename (the full testdata path is constant
    // and the tail window is precious), FULL q_* names (r17 — see
    // stdoutLine), sidecar path on the line
    val line = stdoutLine(snap, failed, new java.io.File(sfDir).getName, partial,
      cal, sidecar = Some(outPath))
    println(line)
    System.out.flush()
    // Belt and braces: sbt's logger decorates stdout ("[info] {...}"),
    // which has defeated the driver's parse two rounds running — also
    // write the bare line to a file nothing rewrites.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (sidecar + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    printed = true
  }

  /** Record an observed duration: best (lowest) per query for the
    * contract line, every timed sample for the sidecar median.
    */
  private def record(n: String, sec: Double): Unit = {
    timings.merge(n, sec, (a, b) => math.min(a, b))
    samples.computeIfAbsent(n, _ => new java.util.concurrent.CopyOnWriteArrayList[Double]())
      .add(sec)
  }

  /** The timed roster: every user-facing query. The `*_golden`
    * correctness companions re-run a base query only to pin its content
    * hash — timing them would double-count those operators in the total.
    * `q_health` is the constant one-row route probe (I7): timing it
    * measures nothing and the stdout line's tail-window budget is scarce.
    * `q_sim_neardup` is the BY-SPEC Θ(n²) exact-cosine validation tier
    * behind the ANN recall gates (RecallGateSpec) — it stays in the
    * correctness roster, but a deliberately quadratic verifier has no
    * place in a timed roster whose totals are read as the engine's scale
    * story (VERDICT r10/r11; roster change recorded in REGRESSIONS.md).
    */
  private val untimed = Set("q_health", "q_sim_neardup")
  private[graft] def benchQueryNames: Seq[String] =
    SparkEntry.queries.keys.toSeq
      .filterNot(_.endsWith("_golden")).filterNot(untimed).sorted

  /** r17 compute tier (VERDICT r16 item 3): the sf0.1 roster is
    * per-stage-overhead-bound — 8 cores BEAT 32 on the full r16 roster —
    * so kernel-level wins (and parallel-scalability regressions) are
    * invisible in the contract number. This tier re-times the heaviest
    * pure-compute kernels on a ×MULT self-multiplied copy of their
    * inputs (ids offset, the ScaleProbe recipe; documents/events only —
    * every listed query reads nothing else) and prints ONE extra
    * same-format JSON line ({"metric":"scale", "mult":M, ...}) BEFORE
    * the contract line, so the driver's 32-core and 8-core runs yield
    * per-query 8c/32c ratios at a volume where compute dominates.
    *
    * Honesty properties: the ×MULT corpus is INPUT staging into a
    * per-process temp dir, rebuilt from the parquet sources every run
    * and deleted after — never cached results; each query runs under the
    * same CacheLedger scope + clearCache discipline as the contract
    * pass; results are timing-only (never correctness-checked — the
    * oracle runs at real SFs). A wall budget stops LAUNCHING new queries
    * once spent (default 120s, SPARK_GRAFT_BENCH_SCALE_BUDGET) so the
    * tier cannot starve the driver's window — the 8-core run covers a
    * prefix of the same ordered list — and the contract line always
    * prints after (a SIGTERM mid-tier still emits it from the shutdown
    * hook, with partial=false once the contract roster finished).
    * SPARK_GRAFT_BENCH_SCALE=off disables; _MULT defaults to 8 —
    * measured (plans/r17/scale_ratio.txt): at ×4 every kernel's 8c/32c
    * ratio is ~1.0 (still overhead-bound, no signal), at ×8 the dedup
    * kernels reach 1.5-1.8 within ~28s/45s total at 32/8 cores, at ×16
    * they reach 2.3-2.9 but the 8-core leg blows the wall budget.
    */
  private val scaleQueries = Seq(
    "q_dedup_ngram", "q_text_winnowing", "q_dedup_containment",
    "q_text_langid_ngram", "q_dedup_keepers", "q_text_tfidf",
    "q_dedup_clusters", "q_text_bm25", "q_dedup_minhash",
    "q_sessionize_hotkey")

  private def runScaleTier(spark: SparkSession, sfDir: String,
                           noopSink: Boolean): Unit = {
    if (sys.env.get("SPARK_GRAFT_BENCH_SCALE").contains("off")) return
    val mult = sys.env.get("SPARK_GRAFT_BENCH_SCALE_MULT").map(_.toInt).getOrElse(8)
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_SCALE_BUDGET")
      .map(_.toDouble).getOrElse(120.0)
    try {
      import org.apache.spark.sql.functions._
      spark.sparkContext.setJobDescription(s"bench:scale-stage x$mult")
      val dir = java.nio.file.Files.createTempDirectory(s"bench_scale_x${mult}_")
      // multi-part staging on purpose: a single coalesced file would be
      // one scan task and serialize the very kernels this tier times
      val parts = spark.sparkContext.defaultParallelism
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until mult).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _).repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      (0 until mult).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L)))
        .reduce(_ unionByName _).repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val t0 = System.nanoTime()
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      val failedScale = scala.collection.mutable.ArrayBuffer.empty[String]
      for (n <- scaleQueries if (System.nanoTime() - t0) / 1e9 < budgetSec)
        CacheLedger.scoped {
          spark.catalog.clearCache()
          spark.sparkContext.setJobDescription(s"bench:scale:$n")
          val q0 = System.nanoTime()
          try {
            val df = SparkEntry.queries(n)(spark, dir.toString)
            if (noopSink) df.write.format("noop").mode("overwrite").save()
            else df.count()
            val t = (System.nanoTime() - q0) / 1e9
            out += n -> t
            System.err.println(f"[bench] scale x$mult $n%-24s $t%.2fs")
          } catch { case e: Throwable =>
            failedScale += n
            System.err.println(s"[bench] scale $n failed: ${e.getMessage}")
          }
        }
      if (out.nonEmpty) {
        val qs = out.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + fmt(v, 2) }
          .mkString("{", ",", "}")
        val fl = failedScale.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
        println(s"""{"metric":"scale","value":${fmt(out.map(_._2).sum, 2)},""" +
          s""""unit":"sec","queries":$qs,"mult":$mult,""" +
          s""""skipped":${scaleQueries.size - out.size - failedScale.size},""" +
          s""""failed":$fl,"sf":"${new java.io.File(sfDir).getName}x$mult"}""")
        System.out.flush()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    } catch { case e: Throwable =>
      // the tier is evidence, not the contract — never fail the bench
      System.err.println(s"[bench] scale tier skipped: ${e.getMessage}")
    }
  }

  /** Fixed-work pure-CPU host speedometer (r8 VERDICT item 3): 2^29
    * codegen'd 4-chained xxhash64 rows over an in-memory range, folded
    * with bit_xor (overflow-free under ANSI) — zero IO, zero data/SF
    * dependence, all `cpus` threads busy like a real query. Its seconds
    * measure ONLY host+JVM speed, so the cross-round ratio of
    * cal_median values is the host-noise factor tools/bench_diff.py
    * divides out — this box has swung bench totals ±40% between
    * midnight and noon windows on identical code (r6, r8).
    */
  private val calParts = new java.util.concurrent.atomic.AtomicInteger(0)

  private def calSample(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    spark.sparkContext.setJobDescription("bench:calibration")
    val t0 = System.nanoTime()
    val h = (1 to 4).foldLeft(col("id"))((c, _) => xxhash64(c))
    // one partition per session core (NOT a hard-coded 32): keeps "all
    // cpus threads busy" true under any SPARK_GRAFT_CPUS. The count is
    // recorded (cal_parts in the artifact) because it defines the
    // workload shape — ratios are only host-speed when both sides match.
    val parts = spark.sparkContext.defaultParallelism
    calParts.set(parts)
    spark.range(0, 1L << 29, 1, parts)
      .select(h.as("h"))
      .agg(expr("bit_xor(h)")).collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => emit(sfDir, partial = !rosterComplete)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // 75 queries × several codegen stages exceeded the default 100-entry
      // janino cache; evictions recompile mid-measurement. 4000 = headroom
      // for the 146-query r13 roster (a controlled 8000-cap run changed
      // NOTHING — the r13 q_tier_cdc drift was host-window, not eviction;
      // see REGRESSIONS.md r12→r13)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      // r16 gate (VERDICT r15 item 2): a whole-stage compile failure
      // (janino 64 KB blowup) must FAIL the query into failed:[] — the
      // r15 q_url_sitemaps fallback ran a whole round interpreted
      // (2-5x slower, recompiling per execution) with rc=0 and nothing
      // asserting on it. PlanAuditSpec runs the same gate roster-wide.
      .config("spark.sql.codegen.fallback", "false")
      // NOT set: spark.sql.adaptive.coalescePartitions.parallelismFirst=
      // false (the Spark tuning guide's production recommendation) was
      // measured in r16 and REGRESSED ~20% calibrated: it coalesces the
      // CPU-bound kernel shuffles (winnowing, shingle dedup, stream
      // dedup state) to one partition and serializes them — parallelism
      // first is the right default for this engine's compute-heavy
      // shuffles. See OPTIMIZATION_r16.md.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.register(spark)
    val names = benchQueryNames

    // Default timing sink is count(): comparable with the round-1 numbers
    // and with what a limit/aggregate consumer pays. count() lets Catalyst
    // prune computed projection columns (q_vec_quantize times as a near-
    // bare scan) — set SPARK_GRAFT_BENCH_SINK=noop for full-
    // materialization timing (the noop sink consumes every column; whole-
    // corpus projections then cost 2-4x more and the run takes ~2x wall).
    // Failures record nothing (a 50ms crash must not win the min() over
    // real runs) and surface in the JSON's "failed" list instead.
    val noopSink = sys.env.get("SPARK_GRAFT_BENCH_SINK").contains("noop")
    // scoped: the duration is computed INSIDE the block, so the cache
    // release at scope exit is excluded from the measurement (and the
    // timed pass's clearCache keeps doing the cross-run isolation)
    def runOne(n: String): Option[Double] = CacheLedger.scoped {
      // label the jobs (guide §1.5) so a UI/event-log postmortem maps
      // stages back to queries; thread-local, so pool warmup labels too
      spark.sparkContext.setJobDescription(s"bench:$n")
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (noopSink) df.write.format("noop").mode("overwrite").save()
        else df.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        failures.add(n)
        System.err.println(s"[bench] $n failed: ${e.getMessage}")
        None
      }
    }

    // Warmup on a pool: codegen + JIT. Durations are wall-clock under
    // contention (inflated, never deflated), so recording them as initial
    // timings is a safe pessimistic fallback for a killed run.
    val pool = Executors.newFixedThreadPool(8)
    val tasks = names.map(n => pool.submit(new Runnable {
      def run(): Unit = {
        runOne(n).foreach(t => warmupTimings.merge(n, t, (a, b) => math.min(a, b)))
        System.err.println(s"[bench] warm $n")
      }
    }))
    tasks.foreach(_.get())
    pool.shutdown()

    // Calibration brackets the timed pass — 1 discarded codegen warmup +
    // 3 samples here, 3 more after the last query — so the min/median in
    // the artifact reflect the host window the measurements actually ran
    // in, drift included.
    calSample(spark)
    (1 to 3).foreach(_ => calSamples.add(calSample(spark)))

    // Timed pass, serial for accurate latencies. The stderr line per query
    // makes a timeout postmortem show exactly where the run died.
    // clearCache first: several operators cache their (small) results and
    // internal indexes, and Spark's CacheManager matches cached plans by
    // canonical equality across separately-built invocations — without the
    // clear, a timed run after warmup is a cache LOOKUP, not the pipeline
    // compute, and the number overstates the engine. (Within one action the
    // operators' in-query caches still engage — that is design, not warmup
    // residue.) Codegen/JIT warmup survives the clear, which is the part
    // warmup exists for.
    val firstRun = names.flatMap { n =>
      spark.catalog.clearCache()
      runOne(n).map { t =>
        record(n, t)
        System.err.println(f"[bench] timed $n%-28s $t%.2fs")
        n -> t
      }
    }
    // Two more runs per query (3 timed samples): with a single sample the
    // sidecar median degenerates to a copy of min, which is exactly why
    // the r6 text-family inflation couldn't be classified as noise from
    // the artifact alone (r6 VERDICT item 1). Three samples make the
    // median a real central tendency and the min-median spread a
    // per-query noise estimate that tools/bench_diff.py feeds on. The
    // extra wall is ~one roster-sum (~40s at sf0.1) — cheap against a
    // round of unattributable drift.
    firstRun.foreach { case (n, _) =>
      (1 to 2).foreach { _ =>
        spark.catalog.clearCache()
        runOne(n).foreach(record(n, _))
      }
    }
    (1 to 3).foreach(_ => calSamples.add(calSample(spark)))
    rosterComplete = true

    // compute tier at ×MULT volume (prints its own "scale" line) runs
    // BEFORE emit so the contract line stays the LAST JSON line in the
    // driver's tail window
    runScaleTier(spark, sfDir, noopSink)

    emit(sfDir, partial = false)
    spark.stop()
  }
}
