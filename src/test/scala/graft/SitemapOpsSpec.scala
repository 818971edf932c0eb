package graft

import graft.operators.SitemapOps
import org.apache.spark.sql.functions._

class SitemapOpsSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (String, String, String)*) =
    rows.toSeq.toDF("host", "sitemap_url", "xml")

  test("urlset entries: order, entities, whitespace-trimmed loc, missing fields") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a.com/p?x=1&amp;y=&lt;2&gt;</loc><lastmod>2024-06-01</lastmod><changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>  https://a.com/q  </loc></url>
        |</urlset>""".stripMargin
    val e = SitemapOps.entries(docs(("a.com", "https://a.com/sm.xml", xml)))
      .orderBy("entry_idx").collect()
    assert(e.length == 2)
    assert(e(0).getAs[String]("kind") == "urlset")
    assert(e(0).getAs[String]("loc") == "https://a.com/p?x=1&y=<2>")
    assert(e(0).getAs[String]("lastmod") == "2024-06-01")
    assert(e(0).getAs[String]("changefreq") == "daily")
    assert(e(0).getAs[Double]("priority") == 0.8)
    assert(e(0).getAs[Boolean]("same_host"))
    assert(e(1).getAs[String]("loc") == "https://a.com/q")
    assert(e(1).isNullAt(e(1).fieldIndex("lastmod")) &&
      e(1).isNullAt(e(1).fieldIndex("priority")))
  }

  test("same-host rule: cross-host entries surface flagged, not dropped") {
    val xml = "<urlset><url><loc>https://other.net/x</loc></url>" +
      "<url><loc>https://A.COM/ok</loc></url></urlset>"
    val e = SitemapOps.entries(docs(("a.com", "https://a.com/sm.xml", xml)))
      .orderBy("entry_idx").collect()
    assert(!e(0).getAs[Boolean]("same_host"))
    assert(e(1).getAs[Boolean]("same_host")) // host compare is case-blind
  }

  test("index resolution is a join: referenced children parse, missing fetches drop") {
    val idx = "<sitemapindex><sitemap><loc>https://a.com/sm-1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.com/never-fetched.xml</loc></sitemap></sitemapindex>"
    val child = "<urlset><url><loc>https://a.com/page</loc></url></urlset>"
    val d = docs(
      ("a.com", "https://a.com/sitemap.xml", idx),
      ("a.com", "https://a.com/sm-1.xml", child))
    val u = SitemapOps.urlEntries(d).collect()
    // the child's single entry appears twice: direct + via the index
    assert(u.length == 2)
    assert(u.map(_.getAs[Boolean]("via_index")).toSet == Set(true, false))
    assert(u.forall(_.getAs[String]("loc") == "https://a.com/page"))
    assert(u.forall(_.getAs[String]("sitemap_url") == "https://a.com/sm-1.xml"))
  }

  test("nested index is not recursed (protocol forbids index → index)") {
    val top = "<sitemapindex><sitemap><loc>https://a.com/mid.xml</loc></sitemap></sitemapindex>"
    val mid = "<sitemapindex><sitemap><loc>https://a.com/leaf.xml</loc></sitemap></sitemapindex>"
    val leaf = "<urlset><url><loc>https://a.com/deep</loc></url></urlset>"
    val d = docs(
      ("a.com", "https://a.com/sitemap.xml", top),
      ("a.com", "https://a.com/mid.xml", mid),
      ("a.com", "https://a.com/leaf.xml", leaf))
    val u = SitemapOps.urlEntries(d).collect()
    // leaf's entry surfaces via its own direct parse AND via mid's index
    // reference — but NOT a third time through top → mid recursion
    assert(u.count(!_.getAs[Boolean]("via_index")) == 1)
    assert(u.count(_.getAs[Boolean]("via_index")) == 1)
  }

  test("unrecognized root yields zero rows, not a crash") {
    val d = docs(("a.com", "https://a.com/x", "<html><body>not a sitemap</body></html>"))
    assert(SitemapOps.entries(d).count() == 0)
    assert(SitemapOps.urlEntries(d).count() == 0)
  }

  test("fixture round-trips: every host contributes both children twice") {
    val hosts = Seq("alpha.com", "beta.org").toDF("host")
    val u = SitemapOps.urlEntries(SitemapOps.syntheticSitemaps(hosts))
    // per host: child 0 has 2 entries, child 1 has 2 (+1 cross on even
    // length); ×2 for direct+via-index
    val perHost = u.groupBy("host").count().collect()
      .map(r => r.getAs[String]("host") -> r.getAs[Long]("count")).toMap
    assert(perHost("alpha.com") == 2 * (2 + 2)) // len 9, odd: no cross entry
    assert(perHost("beta.org") == 2 * (2 + 3))  // len 8, even: cross entry
    val cross = u.filter(!col("same_host")).collect()
    assert(cross.length == 2 && cross.forall(_.getAs[String]("host") == "beta.org"))
  }
}
