package graft

import graft.operators.RobotsOps
import org.apache.spark.sql.functions._

class RobotsOpsSpec extends SparkSuite {
  import spark.implicits._

  private val robots =
    """# policy
      |Disallow: /pregroup-ignored/
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/press-*
      |Disallow: /*.json$
      |Disallow:
      |
      |User-agent: GraftBot
      |User-agent: otherbot
      |Disallow: /bot-only/
      |Allow: /
      |""".stripMargin

  private def rulesDf = RobotsOps.rules(
    Seq(("example.com", robots)).toDF("host", "robots_txt"))

  private def verdict(agent: String, path: String): (Boolean, String) = {
    val urls = Seq((1L, s"https://example.com$path")).toDF("doc_id", "url")
    val r = RobotsOps.evaluate(urls, rulesDf, agent).collect().head
    (r.getAs[Boolean]("allowed"), Option(r.getAs[String]("matched_pattern")).getOrElse(""))
  }

  test("parse: groups, shared user-agent lines, comments, pre-group and empty rules ignored") {
    val rs = rulesDf.collect()
    // * group: 3 rules (the empty Disallow drops); bot group: 2 rules × 2 agents
    assert(rs.count(_.getAs[String]("agent") == "*") == 3)
    assert(rs.count(_.getAs[String]("agent") == "graftbot") == 2)
    assert(rs.count(_.getAs[String]("agent") == "otherbot") == 2)
    assert(!rs.exists(_.getAs[String]("pattern").contains("pregroup")))
    assert(!rs.exists(_.getAs[String]("pattern") == ""))
  }

  test("group election: a named group REPLACES *, unknown agents fall back to *") {
    // GraftBot's own group allows everything except /bot-only/
    assert(verdict("GraftBot", "/private/data")._1)
    assert(verdict("GraftBot", "/bot-only/x") == ((false, "/bot-only/")))
    // an agent with no group uses *
    assert(verdict("randombot", "/private/data") == ((false, "/private/")))
    assert(verdict("randombot", "/open/page")._1)
  }

  test("longest match wins; allow beats disallow on a length tie") {
    // /private/press-release: Allow /private/press-* (16) > Disallow /private/ (9)
    assert(verdict("randombot", "/private/press-release") == ((true, "/private/press-*")))
    // longest-match is decisive even against the $ rule: press-* (16)
    // outranks /*.json$ (8), so the json press kit stays allowed
    assert(verdict("randombot", "/private/press-kit.json") ==
      ((true, "/private/press-*")))
  }

  test("dollar anchors the end; * spans any run; LIKE specials stay literal") {
    assert(verdict("randombot", "/api/feed.json") == ((false, "/*.json$")))
    assert(verdict("randombot", "/api/feed.json/live")._1) // $ means END only
    // a literal dot in the rule must not match 'xjson'
    assert(verdict("randombot", "/api/feedxjson")._1)
    val rs = RobotsOps.rules(Seq(("h", "User-agent: *\nDisallow: /100%_done/"))
      .toDF("host", "robots_txt"))
    val urls1 = Seq((1L, "https://h/100%_done/x"), (2L, "https://h/100Y_done/x"))
      .toDF("doc_id", "url")
    val out = RobotsOps.evaluate(urls1, rs, "any")
      .orderBy("doc_id").select("allowed").as[Boolean].collect()
    assert(out.toSeq == Seq(false, true)) // % and _ literal, not wildcards
  }

  test("directives: crawl-delay group election, sitemaps position-independent") {
    val txt =
      """Sitemap: https://example.com/b.xml
        |User-agent: *
        |Disallow: /x/
        |Crawl-delay: 10
        |User-agent: GraftBot
        |Crawl-delay: 2
        |Crawl-delay: nonsense
        |Sitemap: https://example.com/a.xml
        |""".stripMargin
    val robots = Seq(("example.com", txt), ("bare.org", "User-agent: *\nDisallow: /p/\n"))
      .toDF("host", "robots_txt")
    val bot = RobotsOps.directives(robots, "graftbot")
      .orderBy("host").collect()
    // bare.org: no delay, no sitemaps
    assert(bot(0).getAs[String]("host") == "bare.org" &&
      bot(0).isNullAt(1) && bot(0).getAs[Long]("n_sitemaps") == 0L)
    // example.com: the named group's delay (2), both sitemaps sorted
    assert(bot(1).getAs[Double]("crawl_delay") == 2.0)
    assert(bot(1).getAs[Long]("n_sitemaps") == 2L &&
      bot(1).getAs[String]("sitemaps") ==
        "https://example.com/a.xml,https://example.com/b.xml")
    // an agent with no group falls back to * (delay 10)
    val star = RobotsOps.directives(robots, "randombot")
      .filter(col("host") === "example.com").collect().head
    assert(star.getAs[Double]("crawl_delay") == 10.0)
  }

  test("defaults: no matching rule and no robots.txt for the host are both allowed") {
    assert(verdict("GraftBot", "/anything/else")._1) // bot group's Allow: / matches all
    val noRobots = Seq((9L, "https://unknown-host.org/x")).toDF("doc_id", "url")
    val r = RobotsOps.evaluate(noRobots, rulesDf, "GraftBot").collect().head
    assert(r.getAs[Boolean]("allowed") && r.getAs[String]("matched_pattern") == null)
  }
}
