package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt governance (RFC 9309) — the crawl-compliance stage between
  * URL discovery and fetch: parse a corpus of robots.txt files into their
  * rule groups, then evaluate a URL column against them for a given
  * product token. Everything is RE2-/CASE-/LIKE-mirrorable column
  * expressions (no UDF), so the whole parse→match→decide chain sits under
  * an exact DuckDB oracle.
  *
  * Semantics implemented per RFC 9309:
  *   - groups: consecutive `User-agent:` lines share one group; rules
  *     attach to the group in force; rules before any group are ignored;
  *   - group election: if any group names the crawler's product token,
  *     ONLY those rules apply; otherwise the `*` groups apply;
  *   - rule match: byte-literal prefix match on the URL path where `*`
  *     matches any run and a TRAILING `$` anchors the end (compiled to
  *     SQL LIKE: `*`→`%`, literal `%`/`_`/`\` escaped, non-anchored
  *     patterns get a trailing `%` — LIKE semantics are identical across
  *     engines, which is what makes the oracle exact);
  *   - decision: the matching rule with the LONGEST pattern wins; a
  *     length tie prefers allow; no matching rule (or no robots.txt for
  *     the host) → allowed. Empty-valued `Disallow:` lines match nothing
  *     and are dropped at parse (the "allow all" idiom).
  *
  * Scale shape: parsing is per-host windows over exploded lines (a
  * robots.txt is KB-scale, hosts are high-cardinality — per-task load is
  * one host's lines, no hot key); evaluation is a host-keyed shuffle join
  * of URLs × elected rules followed by a per-URL longest-match window.
  * Rules-per-host is protocol-bounded (RFC 9309 caps parseable size at
  * 500 KiB), so the join fan-out is bounded; nothing broadcasts the URL
  * side.
  */
object RobotsOps {

  /** Compile a robots path pattern to a SQL LIKE pattern (escape char
    * `\`): the published mirrorable formulation — literal `\`, `%`, `_`
    * escaped in that order, `*` becomes `%`, a trailing `$` anchors
    * (no trailing `%`), else prefix semantics append `%`.
    */
  def likePattern(p: Column): Column = {
    val anchored = p.endsWith("$")
    val body = when(anchored, substring(p, lit(1), length(p) - 1)).otherwise(p)
    val escaped = replace(replace(replace(replace(
      body,
      lit("\\"), lit("\\\\")),
      lit("%"), lit("\\%")),
      lit("_"), lit("\\_")),
      lit("*"), lit("%"))
    when(anchored, escaped).otherwise(concat(escaped, lit("%")))
  }

  /** Comment-stripped `field: value` lines with group ids: the shared
    * front half of [[rules]] and [[directives]]. `gid` counts group
    * starts (a `User-agent` line following a non-`User-agent` line);
    * lines before any group carry gid 0.
    */
  private def lineFrame(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("idx", "raw")))
      .select(col("host"), col("idx"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .select(col("host"), col("idx"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):(.*)$", 1))).as("field"),
        trim(regexp_extract(col("line"), "^([^:]+):(.*)$", 2)).as("value"))
    val byLine = Window.partitionBy("host").orderBy("idx")
    lines
      .withColumn("is_ua", col("field") === "user-agent")
      .withColumn("gid", sum((col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(byLine), lit(false))).cast("int"))
        .over(byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def agentsOf(marked: DataFrame): DataFrame =
    marked.filter(col("is_ua") && col("value") =!= "")
      .select(col("host"), col("gid"), lower(col("value")).as("agent"))

  /** Parse robots.txt bodies into rules: `(host, agent, rule_idx, allow,
    * pattern, like_pat)`, one row per (governing agent × rule). Comments
    * strip at `#`; fields are case-insensitive; `rule_idx` is the line
    * index (the deterministic final tiebreak in [[evaluate]]).
    */
  def rules(robots: DataFrame, hostCol: String = "host",
            txtCol: String = "robots_txt"): DataFrame = {
    val marked = lineFrame(robots, hostCol, txtCol)
    val ruleRows = marked
      .filter(col("field").isin("allow", "disallow") && col("value") =!= "" &&
        col("gid") > 0)
      .select(col("host"), col("gid"), col("idx").as("rule_idx"),
        (col("field") === "allow").as("allow"), col("value").as("pattern"))
    // both sides are hosts-scale → shuffle_hash, never a stats-elected
    // broadcast (the same pin as evaluate's joins)
    ruleRows.join(agentsOf(marked).hint("shuffle_hash"), Seq("host", "gid"))
      .select(col("host"), col("agent"), col("rule_idx"), col("allow"),
        col("pattern"), likePattern(col("pattern")).as("like_pat"))
  }

  /** The non-rule directives a polite crawler reads: per host, the
    * `Crawl-delay` governing `agent` (same group election as
    * [[evaluate]]: the named agent's groups if any, else `*`; multiple
    * lines → the minimum; unparseable values drop) and the `Sitemap`
    * lines (position-independent per the sitemaps protocol), sorted and
    * comma-joined for a deterministic single-row-per-host shape. Hosts
    * with neither get NULL delay / zero sitemaps.
    */
  def directives(robots: DataFrame, agent: String,
                 hostCol: String = "host", txtCol: String = "robots_txt"): DataFrame = {
    val agentLc = agent.toLowerCase
    val marked = lineFrame(robots, hostCol, txtCol)
    val sitemaps = marked.filter(col("field") === "sitemap" && col("value") =!= "")
      .groupBy("host")
      .agg(count(lit(1)).as("n_sitemaps"),
        array_join(array_sort(collect_list(col("value"))), ",").as("sitemaps"))
    val delayRows = marked
      .filter(col("field") === "crawl-delay" && col("gid") > 0 &&
        col("value").try_cast("double").isNotNull) // ANSI-safe: bad values drop
      .select(col("host"), col("gid"), col("value").try_cast("double").as("delay"))
      .join(agentsOf(marked).hint("shuffle_hash"), Seq("host", "gid"))
      .filter(col("agent").isin(agentLc, "*"))
      .withColumn("is_spec", (col("agent") === agentLc).cast("int"))
    val elected = delayRows
      .withColumn("max_spec", max(col("is_spec")).over(Window.partitionBy("host")))
      .filter(col("is_spec") === col("max_spec"))
      .groupBy("host").agg(min(col("delay")).as("crawl_delay"))
    robots.select(col(hostCol).as("host"))
      .join(elected.hint("shuffle_hash"), Seq("host"), "left")
      .join(sitemaps.hint("shuffle_hash"), Seq("host"), "left")
      .select(col("host"), col("crawl_delay"),
        coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"),
        coalesce(col("sitemaps"), lit("")).as("sitemaps"))
  }

  /** Evaluate each URL against the rules for `agent`: output
    * `(idCol, host, path, allowed, matched_pattern)` — `matched_pattern`
    * is NULL when the default (no matching rule / no robots) applied.
    */
  def evaluate(urls: DataFrame, rulesDf: DataFrame, agent: String,
               urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    val agentLc = agent.toLowerCase
    val u = urls.select(col(idCol),
      lower(UrlOps.host(col(urlCol))).as("host"),
      coalesce(UrlOps.path(col(urlCol)), lit("/")).as("path"))
    // group election per host: the named agent's groups if any, else *
    val cand = rulesDf.filter(col("agent").isin(agentLc, "*"))
      .withColumn("is_spec", (col("agent") === agentLc).cast("int"))
    val elected = cand
      .withColumn("max_spec", max(col("is_spec")).over(Window.partitionBy("host")))
      .filter(col("is_spec") === col("max_spec"))
      .select(col("host"), col("rule_idx"), col("allow"),
        col("pattern"), col("like_pat"))
    // longest-match decision per URL (length tie → allow, then line order).
    // Both joins pin shuffle_hash: the rules side is HOSTS-scale (a real
    // crawl has millions of robots.txt files) and the matched side is
    // URL-scale — a broadcast elected from bench-size stats would OOM at
    // the real corpus (the domainCap/lmScore precedent).
    val win = Window.partitionBy(col(idCol))
      .orderBy(length(col("pattern")).desc, col("allow").desc, col("rule_idx").asc)
    val matched = u.join(elected.hint("shuffle_hash"), Seq("host"))
      .filter(like(col("path"), col("like_pat"), lit("\\")))
      .withColumn("__rn", row_number().over(win)).filter(col("__rn") === 1)
      .select(col(idCol), col("allow"), col("pattern"))
    u.join(matched.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol), col("host"), col("path"),
        coalesce(col("allow"), lit(true)).as("allowed"),
        col("pattern").as("matched_pattern"))
  }

  /** Deterministic robots fixture over a (host) frame — policy derived
    * from the host string itself so the DuckDB oracle can rebuild it:
    * every host gets a `*` group (block /a1/, re-allow its page-1 pages,
    * block paths ending in 7); EVEN-length hosts add a `graftbot` group
    * (block /a2/, re-allow its pages, block paths ending in 3) which,
    * for that agent, REPLACES the `*` group per the election rule. A
    * stray pre-group rule and a comment exercise the parser's ignore
    * paths; a top-level `Sitemap` and per-group `Crawl-delay` lines
    * (len%5 for `*`, len%7 for the bot group) feed [[directives]].
    */
  def syntheticRobots(hosts: DataFrame, hostCol: String = "host"): DataFrame = {
    val h = col(hostCol)
    val base = concat(
      lit("Sitemap: https://"), h, lit("/sitemap.xml\n"),
      lit("Disallow: /ignored-pregroup/\n# crawl policy for "), h,
      lit("\nUser-agent: *\nDisallow: /a1/\nAllow: /a1/page-1*\nDisallow: /*7$\n"),
      lit("Crawl-delay: "), (length(h) % 5).cast("string"), lit("\n"))
    val botGroup = concat(
      lit("User-agent: graftbot\nDisallow: /a2/\nAllow: /a2/page-*\nDisallow: /*3$\n"),
      lit("Crawl-delay: "), (length(h) % 7).cast("string"), lit("\n"))
    hosts.select(h.as("host"),
      when(length(h) % 2 === 0, concat(base, botGroup)).otherwise(base)
        .as("robots_txt"))
  }
}
