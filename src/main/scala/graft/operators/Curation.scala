package graft.operators

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
}
