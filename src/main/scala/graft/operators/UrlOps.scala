package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain operators for crawl-curation pipelines (per-domain caps are
  * the CCNet / RefinedWeb-style diversity control; URL canonicalization is
  * the dedup key for re-crawled pages). All parsing is pure RE2-compatible
  * column expressions over the RFC 3986 Appendix B grammar — codegen'd, no
  * UDFs, mirrorable verbatim in any RE2 engine for exact oracles — and the
  * per-domain cap is a two-phase top-k so one mega-domain (at crawl scale a
  * single host can hold 1e9 pages) never serializes onto one task.
  */
object UrlOps {

  /** RFC 3986 Appendix B, non-capturing variant: groups 1-5 are scheme,
    * authority, path, query, fragment. Every part is optional, so the
    * pattern matches ANY string — absent parts extract as '' in both Spark
    * and DuckDB, normalized to NULL by [[part]].
    */
  val uriRe = "^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?"

  /** Host inside an authority: strip optional userinfo, keep a bracketed
    * IPv6 literal whole, else stop at the port colon.
    */
  val hostRe = "^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]*)"

  val portRe = ":([0-9]+)$"

  private def nullIfEmpty(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  def scheme(url: Column): Column = nullIfEmpty(regexp_extract(url, uriRe, 1))
  def authority(url: Column): Column = nullIfEmpty(regexp_extract(url, uriRe, 2))
  def path(url: Column): Column = nullIfEmpty(regexp_extract(url, uriRe, 3))
  def query(url: Column): Column = nullIfEmpty(regexp_extract(url, uriRe, 4))
  def fragment(url: Column): Column = nullIfEmpty(regexp_extract(url, uriRe, 5))

  def host(url: Column): Column =
    nullIfEmpty(regexp_extract(regexp_extract(url, uriRe, 2), hostRe, 1))

  def port(url: Column): Column =
    nullIfEmpty(regexp_extract(regexp_extract(url, uriRe, 2), portRe, 1)).cast("long")

  /** eTLD+1 under the FULL Mozilla Public Suffix List (exact + wildcard +
    * exception rules — see [[PublicSuffix]]; the r13 28-entry subset is
    * retired). IP-literal hosts and hosts that ARE a public suffix pass
    * through unchanged, keeping the grouping key total.
    */
  def registrableDomain(hostCol: Column): Column = {
    val h = lower(hostCol)
    when(h.rlike("^\\[") || h.rlike("^([0-9]+\\.){3}[0-9]+$"), h)
      .otherwise(PublicSuffix.registrableDomain(h))
  }

  /** Canonical form for http(s) URLs — the dedup key for re-crawls:
    * lowercase scheme+host, default port dropped, empty path becomes "/",
    * fragment dropped (never sent to the server), query kept verbatim.
    * Non-hierarchical URLs (no authority) pass through unchanged.
    */
  def normalize(url: Column): Column = {
    val sch = lower(scheme(url))
    val h = lower(host(url))
    val p = port(url)
    val defaultPort = (sch === "http" && p === 80L) || (sch === "https" && p === 443L)
    val portPart = when(p.isNull || defaultPort, lit("")).otherwise(concat(lit(":"), p.cast("string")))
    val pathPart = when(path(url).isNull, lit("/")).otherwise(path(url))
    val queryPart = when(query(url).isNull, lit("")).otherwise(concat(lit("?"), query(url)))
    when(authority(url).isNull || scheme(url).isNull, url)
      .otherwise(concat(sch, lit("://"), h, portPart, pathPart, queryPart))
  }

  /** SURT — Sort-friendly URI Reordering Transform, the key every
    * web-archive index (CDX) sorts by: host labels reversed and
    * comma-joined (`com,example,www`), non-default port kept
    * (`:8080`), then `)` + path (`/` when empty) + `?query`. Same-site
    * URLs become neighbors under a plain byte sort, which is what makes
    * a range-partitioned global index work. Userinfo and fragment drop
    * (never part of resource identity); non-hierarchical URLs pass
    * through unchanged, keeping the key total.
    */
  def surt(url: Column): Column = {
    val h = lower(host(url))
    val p = port(url)
    val sch = lower(scheme(url))
    val defaultPort = (sch === "http" && p === 80L) || (sch === "https" && p === 443L)
    val portPart = when(p.isNull || defaultPort, lit(""))
      .otherwise(concat(lit(":"), p.cast("string")))
    val pathPart = when(path(url).isNull, lit("/")).otherwise(path(url))
    val queryPart = when(query(url).isNull, lit(""))
      .otherwise(concat(lit("?"), query(url)))
    when(h.isNull, url).otherwise(concat(
      array_join(reverse(split(h, "\\.")), ","), portPart, lit(")"),
      pathPart, queryPart))
  }

  /** All parts as one projection (one regex state machine pass per part —
    * still a scan-speed map; Catalyst subexpression-eliminates the shared
    * authority extract).
    */
  def parse(df: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    val u = col(urlCol)
    df.select(col(idCol),
      scheme(u).as("scheme"), host(u).as("host"), port(u).as("port"),
      path(u).as("path"), query(u).as("query"), fragment(u).as("fragment"),
      registrableDomain(host(u)).as("domain"),
      normalize(u).as("url_norm"))
  }

  /** Deterministic id-derived URLs over the documents table — the corpus
    * itself has no URL column, so (exactly like the synthetic-media
    * assemblies in [[Multimodal]]) the fixture is column arithmetic both
    * engines can replay: mixed-case schemes/hosts, userinfo, explicit
    * default and non-default ports, empty paths, queries, fragments, IPv4
    * hosts, two-level public suffixes, and the PSL's wildcard (`*.ck`)
    * and exception (`!www.ck`) rule classes all appear on arithmetic
    * schedules, so every branch of the parser and normalizer is hit.
    */
  def syntheticUrls(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def pick(opts: Seq[String], idx: Column): Column =
      element_at(array(opts.map(lit): _*), (idx + 1).cast("int"))
    val schemePart = pick(Seq("https", "http", "HTTPS", "https", "ftp"), id % 5)
    val user = when(id % 13 === 0, lit("u:p@")).otherwise(lit(""))
    val word = pick(Seq("example", "data", "crawl", "News", "archive", "mirror"), id % 6)
    val suffix = pick(Seq("com", "org", "co.uk", "io", "com.au", "net", "co.nz", "com.pl"),
      floor(id / 6).cast("long") % 8)
    val www = when(id % 3 === 0, lit("www.")).otherwise(lit(""))
    val hostPart = when(id % 17 === 0,
      concat(lit("192.168."), (id % 250).cast("string"), lit("."),
        ((id * 3) % 250).cast("string")))
      // PSL edge schedules: the `!www.ck` exception rule and the `*.ck`
      // wildcard rule, so full-list semantics sit under the exact oracle
      .when(id % 19 === 0, lit("www.ck"))
      .when(id % 19 === 7, concat(word, lit(".shop.ck")))
      .otherwise(concat(www, word, lit("."), suffix))
    val portPart = when(id % 7 === 0, lit(":8080"))
      .when(id % 7 === 1, lit(":443")).otherwise(lit(""))
    val pathPart = when(id % 11 === 0, lit(""))
      .otherwise(concat(lit("/a"), (id % 10).cast("string"), lit("/page-"), id.cast("string")))
    val queryPart = when(id % 3 === 0, concat(lit("?q="), id.cast("string"), lit("&x=1")))
      .otherwise(lit(""))
    val fragPart = when(id % 4 === 0, concat(lit("#sec"), (id % 5).cast("string")))
      .otherwise(lit(""))
    docs.select(id, col("n_chars"), col("text"),
      concat(schemePart, lit("://"), user, hostPart, portPart, pathPart,
        queryPart, fragPart).as("url"))
  }

  /** Keep at most `cap` documents per registrable domain, preferring high
    * `rankCol` (ties broken by `idCol` — a TOTAL order, which is what makes
    * the two-phase evaluation exact).
    *
    * Scale shape: a single window over `domain` sorts every row of the
    * biggest domain on one task — at crawl scale that's a 1e9-row task. So
    * phase 1 takes the local top-`cap` within (domain, salt) — after the
    * salted shuffle no task sees more than ~1/`salt` of a domain — and
    * phase 2 re-ranks the surviving ≤ cap·salt rows per domain. Any row in
    * the TRUE global top-cap is in its salt bucket's top-cap (the global
    * order restricted to a subset preserves rank bounds), so phase 2 sees
    * every true keeper: exact, never an approximation.
    */
  def domainCap(df: DataFrame, urlCol: String, cap: Int,
                rankCol: String, idCol: String = "doc_id",
                salt: Int = 32): DataFrame = {
    require(cap > 0 && salt > 0, s"cap=$cap salt=$salt must be positive")
    // `domain` and `rn` are OUTPUT columns of this operator — silently
    // overwriting a caller's same-named column would clobber their data
    require(!df.columns.contains("domain") && !df.columns.contains("rn"),
      "domainCap emits 'domain' and 'rn' columns — rename the input's")
    val dom = registrableDomain(host(col(urlCol)))
    val ord = Seq(col(rankCol).desc, col(idCol).asc)
    val local = Window.partitionBy(col("domain"), pmod(hash(col(idCol)), lit(salt)))
      .orderBy(ord: _*)
    val global = Window.partitionBy(col("domain")).orderBy(ord: _*)
    df.withColumn("domain", dom)
      .withColumn("rn", row_number().over(local)).filter(col("rn") <= cap)
      .withColumn("rn", row_number().over(global)).filter(col("rn") <= cap)
  }
}
