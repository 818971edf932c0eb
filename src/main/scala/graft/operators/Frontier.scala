package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl frontier — the scheduling operator that turns the discovery
  * tier into a fetch list. Composes the crawl stack end-to-end:
  * sitemap-discovered URLs ([[SitemapOps.urlEntries]], same-host rule
  * enforced), canonicalized ([[UrlOps.normalize]] — the re-crawl dedup
  * key) and deduplicated, minus the already-fetched history (sort-merge
  * anti-join — history grows forever, it is never broadcast), gated by
  * robots governance ([[RobotsOps.evaluate]], RFC 9309 group election +
  * longest match), capped per host with the two-phase skew-safe top-k
  * (the [[UrlOps.domainCap]] shape — a mega-host cannot serialize one
  * task), and scheduled politely: each kept URL gets a fetch offset of
  * `rank × Crawl-delay` for its host ([[RobotsOps.directives]]).
  *
  * Scale shape: one sitemap parse scan + bounded shuffles keyed on url
  * (dedup, anti-join, robots decision) and host (cap + delay join) —
  * every join pinned shuffle-capable (the rules/hosts sides are
  * hosts-scale, never a stats-elected broadcast; the history side is
  * corpus-scale, never broadcast either).
  */
object Frontier {

  /** Build the next-fetch list for `agent`.
    *
    * @param sitemapDocs fetched sitemap documents `(host, sitemap_url, xml)`
    * @param robots      robots corpus `(host, robots_txt)`
    * @param fetched     crawl history with a `url` column (any shape —
    *                    normalized here before the anti-join)
    * @param perHostCap  max URLs scheduled per host this cycle
    * @return `(host, url, rank, priority, lastmod, crawl_delay,
    *         fetch_offset_ms)` — rank is 1-based per host in
    *         (priority DESC NULLS LAST, lastmod DESC NULLS LAST, url)
    *         order; fetch_offset_ms = (rank−1) × Crawl-delay × 1000
    *         (0 when the host publishes no delay).
    */
  def frontier(sitemapDocs: DataFrame, robots: DataFrame, fetched: DataFrame,
               agent: String, perHostCap: Int = 10, salt: Int = 32): DataFrame = {
    require(perHostCap > 0 && salt > 0, s"cap=$perHostCap salt=$salt must be positive")
    import graft.CacheLedger.Tracked
    // robots is consumed twice (rules for the gate, directives for the
    // delay schedule) — cache the hosts-scale corpus once
    val robotsC = robots.trackedCache
    // discovery: same-host entries only (the protocol's location rule is
    // the frontier's admission rule), direct-parse lane only so each
    // document's entries count once however many indexes reference it
    val cand = SitemapOps.urlEntries(sitemapDocs)
      .filter(col("same_host") && !col("via_index"))
      .select(col("host"), UrlOps.normalize(col("loc")).as("url"),
        col("lastmod"), col("priority"))
      .groupBy("host", "url")
      .agg(max("priority").as("priority"), max("lastmod").as("lastmod"))
    // history anti-join: both sides url-keyed and unbounded → sort-merge.
    // Cached: consumed by the robots evaluation AND the allowed join —
    // uncached, the sitemap parse + dedup + anti-join chain re-runs
    // three times (with the robots cache above: 8.8s → 2.7s at sf0.1)
    val fresh = cand.join(
      fetched.select(UrlOps.normalize(col("url")).as("url"))
        .hint("shuffle_merge"),
      Seq("url"), "left_anti")
      .trackedCache
    // robots gate: the real parse + election + longest-match chain
    val verdicts = RobotsOps.evaluate(fresh, RobotsOps.rules(robotsC), agent,
      urlCol = "url", idCol = "url")
    val allowed = fresh.join(
      verdicts.filter(col("allowed")).select(col("url")).hint("shuffle_hash"),
      Seq("url"))
    // per-host cap, two-phase (salted local top-k, then exact global) —
    // the domainCap skew shape: a 50M-URL host pre-prunes in parallel
    val ord = Seq(col("priority").desc_nulls_last,
      col("lastmod").desc_nulls_last, col("url").asc)
    val local = Window.partitionBy(col("host"), pmod(hash(col("url")), lit(salt)))
      .orderBy(ord: _*)
    val global = Window.partitionBy(col("host")).orderBy(ord: _*)
    val capped = allowed
      .withColumn("rank", row_number().over(local)).filter(col("rank") <= perHostCap)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= perHostCap)
    // politeness schedule: rank × the host's elected Crawl-delay
    val delays = RobotsOps.directives(robotsC, agent)
      .select(col("host"), col("crawl_delay"))
    capped.join(delays.hint("shuffle_hash"), Seq("host"), "left")
      .select(col("host"), col("url"), col("rank").cast("long").as("rank"),
        col("priority"), col("lastmod"), col("crawl_delay"),
        ((col("rank") - 1) * coalesce(col("crawl_delay"), lit(0.0)) * 1000.0)
          .cast("long").as("fetch_offset_ms"))
  }

  /** The recrawl tier — [[frontier]]'s companion for URLs ALREADY in
    * the history: a fetch is STALE when the publisher's sitemap
    * advertises a `lastmod` strictly newer than the recorded fetch
    * time (the signal the protocol exists to provide; entries without
    * a lastmod never mark stale — absence of evidence schedules
    * nothing). Timestamps compare as ISO-8601 date strings — the
    * protocol's own format, lexicographically ordered, no timezone
    * arithmetic to diverge on. One url-keyed sort-merge join against
    * the history (corpus-scale, never broadcast), same-host and
    * direct-lane rules as [[frontier]].
    *
    * @param fetched history `(url, fetched_at)` — fetched_at an
    *                ISO-8601 date/timestamp string
    * @return `(host, url, lastmod, fetched_at)` — one row per stale
    *         fetch, the set a recrawl cycle feeds back into its queue
    */
  def staleFetches(sitemapDocs: DataFrame, fetched: DataFrame,
                   urlCol: String = "url", fetchedAtCol: String = "fetched_at"): DataFrame = {
    val cand = SitemapOps.urlEntries(sitemapDocs)
      .filter(col("same_host") && !col("via_index") && col("lastmod").isNotNull)
      .select(col("host"), UrlOps.normalize(col("loc")).as("url"), col("lastmod"))
      .groupBy("host", "url").agg(max("lastmod").as("lastmod"))
    cand.join(
        fetched.select(UrlOps.normalize(col(urlCol)).as("url"),
          col(fetchedAtCol).as("fetched_at")).hint("shuffle_merge"),
        Seq("url"))
      .filter(col("lastmod") > col("fetched_at"))
      .select(col("host"), col("url"), col("lastmod"), col("fetched_at"))
  }

  /** Frontier-shaped robots fixture (host-string arithmetic, oracle-
    * replayable): every host's `*` group disallows the `/p/1-` prefix
    * with Crawl-delay len%5; EVEN-length hosts add a `graftbot` group
    * (disallow exactly `/p/0-1`, Crawl-delay len%7) which REPLACES the
    * `*` group for that agent — so the gate, the election, and the
    * delay all vary by host parity against [[SitemapOps
    * .syntheticSitemaps]]' `/p/{k}-{i}` paths.
    */
  def syntheticFrontierRobots(hosts: DataFrame, hostCol: String = "host"): DataFrame = {
    val h = col(hostCol)
    val base = concat(
      lit("User-agent: *\nDisallow: /p/1-*\nCrawl-delay: "),
      (length(h) % 5).cast("string"), lit("\n"))
    val bot = concat(
      lit("User-agent: graftbot\nDisallow: /p/0-1\nCrawl-delay: "),
      (length(h) % 7).cast("string"), lit("\n"))
    hosts.select(h.as("host"),
      when(length(h) % 2 === 0, concat(base, bot)).otherwise(base).as("robots_txt"))
  }
}
