package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol v0.9) — the crawl-frontier
  * stage after [[RobotsOps.directives]] surfaces the `Sitemap:` URLs:
  * parse fetched sitemap documents into their `<url>` / `<sitemap>`
  * entries, resolve `<sitemapindex>` indirection as a JOIN over the
  * fetched-document corpus (bounded by the protocol itself: an index
  * file may not list other index files, so resolution is exactly one
  * level — data-parallel, never a driver loop), and validate the
  * protocol's same-host rule per entry.
  *
  * Everything is regex/replace column expressions (no UDF, no XML
  * library): sitemap documents are machine-generated element soup with
  * a fixed tiny vocabulary (loc/lastmod/changefreq/priority), which is
  * precisely the case where anchored non-greedy extraction is correct —
  * and it keeps the whole chain exactly mirrorable in the DuckDB oracle.
  * The five XML predefined entities unescape after extraction
  * (`&amp;` LAST, so `&amp;lt;` round-trips as the literal `&lt;`).
  *
  * Scale shape: parsing is a map-only scan (entries explode per
  * document; a sitemap is protocol-capped at 50 MB / 50k URLs, so the
  * explode fan-out is bounded); index resolution is one hosts-scale
  * shuffle_hash join of index entries against the document corpus —
  * never a stats-elected broadcast (the RobotsOps pin).
  */
object SitemapOps {

  /** `<url>…</url>` / `<sitemap>…</sitemap>` blocks; (?s) because real
    * sitemaps put each child element on its own line.
    */
  private val EntryRe = "(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"

  private def fieldRe(tag: String) = s"(?s)<$tag>\\s*(.*?)\\s*</$tag>"

  /** Unescape the five XML predefined entities; `&amp;` last so escaped
    * ampersand sequences decode to the literal entity text.
    */
  def xmlUnescape(c: Column): Column =
    replace(replace(replace(replace(replace(
      c,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&apos;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Extract-and-unescape, applied ONCE per field in its own projection:
    * the r15 shape `nullif(xmlUnescape(regexp_extract(...)))` let
    * `nullif`'s analysis-time CASE expansion duplicate the whole 5-deep
    * replace chain in the SAME projection, and projection collapse fused
    * four of those duplicated chains plus the fixture concat and the
    * downstream distinct hashAgg into one >64 KB generated method —
    * whole-stage codegen failed and the stage silently ran interpreted.
    * Splitting extract/unescape (non-cheap, referenced twice by the
    * null-empty CASE) into a separate projection keeps CollapseProject
    * from re-inlining it (it refuses to duplicate non-cheap expressions),
    * so each generated method stays small and the stage compiles.
    */
  private def fieldRaw(tag: String): Column =
    xmlUnescape(regexp_extract(col("entry"), fieldRe(tag), 1))

  /** Parse sitemap documents `(host, sitemap_url, xml)` into one row per
    * entry: `(host, sitemap_url, kind, entry_idx, loc, lastmod,
    * changefreq, priority, same_host)`. `kind` is the document's root
    * element (`urlset` page lists, `sitemapindex` indexes); `entry_idx`
    * preserves document order; `same_host` is the protocol's location
    * rule — the entry's URL host equals the sitemap's host (cross-host
    * entries are surfaced, not dropped: governance decides, not the
    * parser). Documents with no recognizable root parse to zero rows.
    */
  def entries(docs: DataFrame, hostCol: String = "host",
              urlCol: String = "sitemap_url", xmlCol: String = "xml"): DataFrame = {
    val kind = when(col(xmlCol).rlike("(?s)<sitemapindex[\\s>]"), "sitemapindex")
      .when(col(xmlCol).rlike("(?s)<urlset[\\s>]"), "urlset")
    def emptyNull(name: String): Column =
      when(col(name) === "", lit(null)).otherwise(col(name)).as(name)
    docs
      .select(lower(col(hostCol)).as("host"), col(urlCol).as("sitemap_url"),
        kind.as("kind"),
        regexp_extract_all(col(xmlCol), lit(EntryRe), lit(1)).as("es"))
      .filter(col("kind").isNotNull)
      .select(col("host"), col("sitemap_url"), col("kind"),
        posexplode(col("es")).as(Seq("entry_idx", "entry")))
      // extract+unescape each field exactly once …
      .select(col("host"), col("sitemap_url"), col("kind"), col("entry_idx"),
        fieldRaw("loc").as("loc"), fieldRaw("lastmod").as("lastmod"),
        fieldRaw("changefreq").as("changefreq"),
        fieldRaw("priority").as("priority"))
      // … then null-out empties referencing only the (cheap) attribute
      .select(col("host"), col("sitemap_url"), col("kind"), col("entry_idx"),
        emptyNull("loc"), emptyNull("lastmod"), emptyNull("changefreq"),
        when(col("priority") === "", lit(null)).otherwise(col("priority"))
          .cast("double").as("priority"))
      .withColumn("same_host",
        lower(UrlOps.host(col("loc"))) === col("host"))
  }

  /** Page-URL entries with index indirection resolved as data: direct
    * `<urlset>` documents emit their entries (`via_index=false`), and
    * `<sitemapindex>` entries JOIN their `loc` back to the corpus to
    * parse the referenced documents (`via_index=true`). A referenced
    * document that is itself an index is NOT recursed — the protocol
    * forbids nested indexes, so its presence is a publisher bug, and
    * silent recursion would unbound the walk; its page entries still
    * surface through its own direct parse. Index entries whose `loc`
    * was never fetched simply produce no rows (the frontier's job is to
    * fetch them next, not the parser's to invent them).
    */
  def urlEntries(docs: DataFrame, hostCol: String = "host",
                 urlCol: String = "sitemap_url", xmlCol: String = "xml"): DataFrame = {
    import graft.CacheLedger.Tracked
    // parse the corpus ONCE; the index side joins back onto the already-
    // parsed entries instead of re-running the XML parse on joined
    // documents (one scan, not two — the crawlReportCurated lesson)
    val e = entries(docs, hostCol, urlCol, xmlCol).trackedCache
    val out = Seq("host", "sitemap_url", "entry_idx", "loc", "lastmod",
      "changefreq", "priority", "same_host")
    // loc is the protocol's one REQUIRED child — a <url> without one is
    // not an address, so it surfaces in entries() but never schedules
    val direct = e.filter(col("kind") === "urlset" && col("loc").isNotNull)
      .select(out.map(col): _*)
      .withColumn("via_index", lit(false))
    // one level by protocol: index → sitemap. Both sides are hosts-scale
    // (indexes list ≤50k sitemaps; the corpus is the fetched frontier) →
    // shuffle_hash, never a stats-elected broadcast. A referenced child
    // that parsed as an index contributes no urlset rows here — the
    // protocol forbids nested indexes, so there is no recursion to do.
    val viaIndex = e.filter(col("kind") === "sitemapindex")
      .select(col("loc").as("sitemap_url")).distinct()
      .join(direct.drop("via_index").hint("shuffle_hash"), Seq("sitemap_url"))
      .select(out.map(col): _*)
      .withColumn("via_index", lit(true))
    direct.unionByName(viaIndex)
  }

  /** Deterministic sitemap-corpus fixture over a (host) frame — all
    * content derived from the host string so the DuckDB oracle rebuilds
    * the expected parse with arithmetic. Per host: an INDEX at
    * `/sitemap.xml` listing two child sitemaps (the first with a
    * lastmod), and the two children at `/sm-{0,1}.xml` — each carrying a
    * full entry (loc with an `&amp;` entity, lastmod, changefreq,
    * priority), a minimal whitespace-padded-loc entry, and (child 1,
    * even-length hosts) a cross-host entry for the same-host rule.
    */
  def syntheticSitemaps(hosts: DataFrame, hostCol: String = "host"): DataFrame = {
    val h = col(hostCol)
    val header = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    val xmlns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    val index = concat(
      lit(s"$header<sitemapindex xmlns=\"$xmlns\">\n<sitemap><loc>https://"), h,
      lit("/sm-0.xml</loc><lastmod>2025-01-0"), ((length(h) % 9) + 1).cast("string"),
      lit("</lastmod></sitemap>\n<sitemap><loc>https://"), h,
      lit("/sm-1.xml</loc></sitemap>\n</sitemapindex>\n"))
    def child(k: Int): Column = concat(
      lit(s"$header<urlset xmlns=\"$xmlns\">\n<url><loc>https://"), h,
      lit(s"/p/$k-0?a=1&amp;b="), (length(h) % 7).cast("string"),
      lit(s"</loc><lastmod>2025-02-1$k</lastmod><changefreq>"),
      lit(if (k == 0) "daily" else "weekly"),
      lit("</changefreq><priority>0."), ((length(h) + k) % 10).cast("string"),
      lit(s"</priority></url>\n<url><loc> https://"), h, lit(s"/p/$k-1 </loc></url>\n"),
      if (k == 1)
        when(length(h) % 2 === 0,
          lit("<url><loc>https://cross.example/x</loc></url>\n")).otherwise(lit(""))
      else lit(""),
      lit("</urlset>\n"))
    val one = hosts.select(h.as("host"))
    one.select(col("host"),
        concat(lit("https://"), col("host"), lit("/sitemap.xml")).as("sitemap_url"),
        index.as("xml"))
      .unionByName(one.select(col("host"),
        concat(lit("https://"), col("host"), lit("/sm-0.xml")).as("sitemap_url"),
        child(0).as("xml")))
      .unionByName(one.select(col("host"),
        concat(lit("https://"), col("host"), lit("/sm-1.xml")).as("sitemap_url"),
        child(1).as("xml")))
  }
}
