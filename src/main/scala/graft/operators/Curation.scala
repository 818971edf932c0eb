package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation composition: quality filter → exact dedup
  * (keep the min id per content hash) → deterministic hash sample →
  * per-language report. The canonical "assemble a training corpus" chain,
  * shared by the benched query and the scale probe so the two can't drift.
  *
  * Scale shape: ONE corpus scan + ONE shuffle. Quality, token count and
  * the 16-byte content hash are scan-stage column expressions, and the
  * row is reduced to (id, lang, quality, n_tokens, md5) BEFORE the dedup
  * window — at 100 TB the shuffle moves ~40-byte rows, not documents;
  * the keep-row rank compiles to a map-side partial WindowGroupLimit.
  * Operator order is semantic, not just cost: the sample gate keys on the
  * KEPT doc's id, so sampling before dedup could drop a group's min
  * member and flip the keep decision.
  */
object Curation {

  def report(docs: DataFrame, minQuality: Double = 0.5, rate256: Int = 128,
             textCol: String = "text", idCol: String = "doc_id",
             langCol: String = "lang"): DataFrame = {
    // collision-free internal names: an input already carrying __ntok/
    // __fp/__rn would be silently overwritten (same class Sampling fixed)
    def free(stem: String): String = Iterator.from(0).map(i => s"$stem$i")
      .find(n => !docs.columns.contains(n)).get
    val (ntok, fp, rn) = (free("__graft_ntok"), free("__graft_fp"), free("__graft_rn"))
    val scored = TextOps.withQuality(docs, textCol, tokenCountCol = Some(ntok))
      .filter(col("quality") >= minQuality)
      .select(col(idCol), col(langCol), col("quality"),
        col(ntok).cast("long").as("n_tokens"),
        md5(col(textCol)).as(fp))
    val w = Window.partitionBy(fp).orderBy(col(idCol).asc)
    scored.withColumn(rn, row_number().over(w)).filter(col(rn) === 1)
      .filter(Sampling.hashGate(col(idCol), rate256))
      .groupBy(langCol)
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        // mean quality in exact MICRO-UNITS: quality is a 6dp multiple, so
        // round(q*1e6) is an exact integer, the long sum is
        // order-independent, and the single double division is
        // IEEE-identical across engines. round(avg(double), 4) can flip a
        // half-boundary under Spark's nondeterministic partial-agg order —
        // the same .xx5 flip the revenue queries hit with round(sum(),2).
        round(sum(round(col("quality") * 1000000).cast("long")).cast("double")
          / (count(lit(1)) * lit(1000000.0)), 4).as("mean_quality"))
      .orderBy(langCol)
  }

  /** The crawl pipeline composed end-to-end from raw pages: HTML
    * extraction (TextOps.htmlStripStages) → Unicode canonicalization
    * (NFC + cleanupStages) → quality gate → per-domain cap
    * (UrlOps.domainCap, the two-phase skew-safe top-k) → per-domain
    * rollup. Every stage is the published mirrorable formulation, so the
    * whole chain sits under one exact DuckDB oracle.
    *
    * Scale shape: extraction/normalization/quality are ONE scan stage of
    * codegen'd expressions; rows reduce to (id, url, quality, n_tokens)
    * before the cap's shuffles; the rollup aggregates the ≤ cap·domains
    * survivors. Mean quality uses the exact micro-unit trick from
    * [[report]].
    */
  def crawlReport(pages: DataFrame, urlCol: String = "url",
                  htmlCol: String = "html", idCol: String = "doc_id",
                  minQuality: Double = 0.3, maxPerDomain: Int = 3): DataFrame = {
    val ntok = "__graft_ntok"
    val extracted = pages.select(col(idCol), col(urlCol),
      TextOps.cleanupStages.foldLeft(TextOps.nfc(TextOps.stripHtml(col(htmlCol)))) {
        case (c, (p, r)) => regexp_replace(c, p, r)
      }.as("text"))
    val scored = TextOps.withQuality(extracted, tokenCountCol = Some(ntok))
      .filter(col("quality") >= minQuality)
      .select(col(idCol), col(urlCol), col("quality"),
        col(ntok).cast("long").as(ntok))
    UrlOps.domainCap(scored, urlCol, maxPerDomain,
        rankCol = "quality", idCol = idCol)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(ntok).as("n_tokens"),
        round(sum(round(col("quality") * 1000000).cast("long")).cast("double")
          / (count(lit(1)) * lit(1000000.0)), 4).as("mean_quality"))
      .orderBy("domain")
  }

  /** The FULL CCNet-ordered curation chain (Wenzek et al. 2020: extract →
    * dedup → language-ID → LM perplexity filter), composed end-to-end
    * from raw pages and gated the way a production crawl pipeline gates:
    *
    *   1. HTML extraction + NFC/cleanup (one codegen'd scan stage);
    *   2. exact dedup — keep the min-id doc per md5(text);
    *   3. language-ID gate — keep docs whose DETECTED language (the
    *      [[TextOps.langId]] lexicon argmax) is in `keepLangs`;
    *   4. reference-LM scoring ([[TextOps.lmScore]] against `ref`) and a
    *      CCNet-style percentile gate: exact `ntile(lmNtiles)` over
    *      (mean_nll asc, id) — TOTAL order — keeping buckets
    *      ≤ `lmKeepNtile` (the "head + middle" cut; tail = boilerplate
    *      the reference LM finds surprising);
    *   5. quality gate → per-domain cap → per-domain rollup, as in
    *      [[crawlReport]], plus the kept docs' mean LM score.
    *
    * Scale shape: extraction/fingerprint/quality/token-count/lang hits
    * are ONE scan of codegen'd expressions over the pages, consumed by
    * ONE fingerprint shuffle (rows ride whole — re-running the parse
    * chain for a 40-byte winners branch costs more than the shuffle;
    * see the inline note); the LM join is bigram-keyed shuffle_hash
    * (never broadcast — a real reference LM is corpus-scale); the
    * percentile is
    * [[Ranking.withNtile]]'s two-pass global rank, so no stage funnels
    * the corpus through one task. The curated row set is cached
    * (spillable, [[graft.CacheLedger]]-scoped) because the cap + rollup
    * replay it.
    */
  def crawlReportCurated(pages: DataFrame, ref: DataFrame,
                         urlCol: String = "url", htmlCol: String = "html",
                         idCol: String = "doc_id",
                         keepLangs: Seq[String] = Seq("en"),
                         lmNtiles: Int = 10, lmKeepNtile: Int = 7,
                         minQuality: Double = 0.3, maxPerDomain: Int = 3): DataFrame = {
    require(lmNtiles > 0 && lmKeepNtile > 0 && lmKeepNtile <= lmNtiles,
      s"lm gate must satisfy 0 < keep=$lmKeepNtile <= ntiles=$lmNtiles")
    val (ntok, fp, rn) = ("__graft_ntok", "__graft_fp", "__graft_rn")
    // 1. extract + canonicalize + score: one scan stage
    val extracted = pages.select(col(idCol), col(urlCol),
      TextOps.cleanupStages.foldLeft(TextOps.nfc(TextOps.stripHtml(col(htmlCol)))) {
        case (c, (p, r)) => regexp_replace(c, p, r)
      }.as("text"))
    // language-ID inline (the [[TextOps.langId]] lexicon argmax as a scan
    // column — same greatest-of-(hits, lang)-structs semantics), so
    // quality + token count + fingerprint + lang are ONE codegen'd pass
    val best = TextOps.langLexicons.map { case (lang, lex) =>
      struct(graft.functions.TextSignalExpressions
        .token_hit_cnt(col("text"), lex).as("h"), lit(lang).as("l"))
    }
    val scored = TextOps.withQuality(extracted, tokenCountCol = Some(ntok))
      .withColumn(fp, md5(col("text")))
      .withColumn("lang", when(greatest(best: _*).getField("h") === 0, lit("unk"))
        .otherwise(greatest(best: _*).getField("l")))
    // 2+3. exact dedup + language gate. The rows ride the fingerprint
    // shuffle whole here — the opposite trade from [[report]]'s 40-byte
    // winners pattern, deliberately: upstream is a WARC-parse + regex
    // extraction chain, so a winners-id branch would run that scan
    // TWICE (measured 2× on the benched pipeline), which at 100 TB
    // costs more CPU than one doc-sized shuffle costs network. The
    // window still compiles to a map-side partial WindowGroupLimit.
    val langed = scored
      .withColumn(rn, row_number().over(
        Window.partitionBy(fp).orderBy(col(idCol).asc)))
      .filter(col(rn) === 1).drop(rn, fp)
      .filter(col("lang").isin(keepLangs: _*))
      .trackedCache
    // 4. reference-LM percentile gate (exact ntile over a total order)
    val lm = TextOps.lmScore(langed.select(col(idCol), col("text")), ref,
      "text", idCol)
    val gated = Ranking.withNtile(
        langed.join(lm.hint("shuffle_hash"), Seq(idCol)),
        lmNtiles, Seq(col("mean_nll").asc, col(idCol).asc), "__graft_lm_bucket")
      .filter(col("__graft_lm_bucket") <= lmKeepNtile)
    // 5. quality gate → domain cap → rollup
    val kept = gated.filter(col("quality") >= minQuality)
      .select(col(idCol), col(urlCol), col("quality"),
        col(ntok).cast("long").as(ntok), col("mean_nll"))
    UrlOps.domainCap(kept, urlCol, maxPerDomain,
        rankCol = "quality", idCol = idCol)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(ntok).as("n_tokens"),
        round(sum(round(col("quality") * 1000000).cast("long")).cast("double")
          / (count(lit(1)) * lit(1000000.0)), 4).as("mean_quality"),
        // mean_nll is a 4dp-rounded double, so ×10⁴ is an exact integer —
        // the same order-independent micro-unit trick as mean_quality
        round(sum(round(col("mean_nll") * 10000).cast("long")).cast("double")
          / (count(lit(1)) * lit(10000.0)), 4).as("mean_doc_nll"))
      .orderBy("domain")
  }
}
