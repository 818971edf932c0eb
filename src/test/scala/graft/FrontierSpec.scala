package graft

import graft.operators.{Frontier, SitemapOps}
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSuite {
  import spark.implicits._

  // one even-length host (graftbot group elected) + one odd (the * group)
  private val hosts = Seq("even.org", "odd.net").toDF("host") // len 8, 7

  private def run(fetched: Seq[String] = Nil, cap: Int = 10) =
    Frontier.frontier(
      SitemapOps.syntheticSitemaps(hosts),
      Frontier.syntheticFrontierRobots(hosts),
      fetched.toDF("url"), "GraftBot", perHostCap = cap)

  test("robots election gates by host parity; schedule uses the elected delay") {
    val out = run().collect()
      .map(r => (r.getAs[String]("host"), r.getAs[String]("url"),
        r.getAs[Long]("rank"), r.getAs[Double]("crawl_delay"),
        r.getAs[Long]("fetch_offset_ms")))
    val even = out.filter(_._1 == "even.org")
    val odd = out.filter(_._1 == "odd.net")
    // even host: graftbot group REPLACES * → /p/1-* allowed, /p/0-1 blocked
    assert(even.map(_._2).exists(_.contains("/p/1-0")))
    assert(!even.map(_._2).exists(_.endsWith("/p/0-1")))
    // odd host: * group → /p/1-* blocked, /p/0-1 allowed
    assert(odd.map(_._2).exists(_.endsWith("/p/0-1")))
    assert(!odd.map(_._2).exists(_.contains("/p/1-")))
    // delays: even len 8 → 8%7=1s; odd len 7 → 7%5=2s; offset=(rank-1)×delay
    assert(even.forall(e => e._4 == 1.0 && e._5 == (e._3 - 1) * 1000L))
    assert(odd.forall(e => e._4 == 2.0 && e._5 == (e._3 - 1) * 2000L))
  }

  test("fetched history is removed after normalization") {
    // history stored with an explicit default port: normalize must
    // still match the sitemap loc form
    val loc = "https://even.org:443/p/1-0?a=1&b=1" // len("even.org")%7 = 1
    val out = run(fetched = Seq(loc)).collect().map(_.getAs[String]("url"))
    assert(!out.exists(_.contains("even.org/p/1-0")), out.mkString(", "))
    assert(out.exists(_.contains("even.org/p/1-1"))) // sibling survives
  }

  test("per-host cap keeps the priority order; rank is dense from 1") {
    val out = run(cap = 1).collect()
    val byHost = out.groupBy(_.getAs[String]("host"))
    assert(byHost.values.forall(_.length == 1))
    assert(out.forall(_.getAs[Long]("rank") == 1L))
    // rank 1 on each host is the highest-priority candidate (priority
    // desc nulls last): the k-0 full entries carry priorities, bare
    // locs carry null — a null must never outrank a value
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("priority"))))
  }

  test("staleFetches: lastmod-newer marks stale; no lastmod, fresh, unknown never do") {
    val sm = SitemapOps.syntheticSitemaps(hosts)
    // even.org k=0 lastmod is 2025-02-10; k=1 is 2025-02-11; the bare
    // /p/k-1 entries carry no lastmod at all
    val fetched = Seq(
      ("https://even.org/p/0-0?a=1&b=1", "2025-01-01"),  // stale (10 > 01-01)
      ("https://even.org:443/p/1-0?a=1&b=1", "2025-06-01"), // fresh (normalized match)
      ("https://even.org/p/0-1", "2020-01-01"),          // no lastmod → never stale
      ("https://odd.net/unknown", "2020-01-01"))         // not in any sitemap
      .toDF("url", "fetched_at")
    val out = Frontier.staleFetches(sm, fetched).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("url") == "https://even.org/p/0-0?a=1&b=1")
    assert(out.head.getAs[String]("lastmod") == "2025-02-10")
    assert(out.head.getAs[String]("fetched_at") == "2025-01-01")
  }

  test("the history anti-join is sort-merge, never a broadcast") {
    val plan = run(fetched = Seq("https://x.com/a")).queryExecution
      .executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
      "frontier history anti-join must be sort-merge")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
