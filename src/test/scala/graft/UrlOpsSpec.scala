package graft

import graft.operators.UrlOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def parse1(url: String): Map[String, Any] = {
    val row = UrlOps.parse(Seq((1L, url)).toDF("doc_id", "url")).collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("full URL: every part extracted, userinfo stripped from host") {
    val p = parse1("https://u:pw@www.Example.co.uk:8443/a/b?q=1&x=2#frag")
    assert(p("scheme") == "https")
    assert(p("host") == "www.Example.co.uk")
    assert(p("port") == 8443L)
    assert(p("path") == "/a/b")
    assert(p("query") == "q=1&x=2")
    assert(p("fragment") == "frag")
    assert(p("domain") == "example.co.uk")
    assert(p("url_norm") == "https://www.example.co.uk:8443/a/b?q=1&x=2")
  }

  test("bracketed IPv6 host keeps brackets, port still splits") {
    val p = parse1("http://[2001:db8::1]:8080/x")
    assert(p("host") == "[2001:db8::1]")
    assert(p("port") == 8080L)
    assert(p("domain") == "[2001:db8::1]")
  }

  test("minimal URL: absent parts are NULL, empty path normalizes to /") {
    val p = parse1("HTTP://EXAMPLE.COM")
    assert(p("scheme") == "HTTP")
    assert(p("host") == "EXAMPLE.COM")
    assert(p("port") == null && p("path") == null &&
      p("query") == null && p("fragment") == null)
    assert(p("domain") == "example.com")
    assert(p("url_norm") == "http://example.com/")
  }

  test("default ports drop in the canonical form, non-default stay") {
    assert(parse1("https://a.com:443/p")("url_norm") == "https://a.com/p")
    assert(parse1("http://a.com:80/p")("url_norm") == "http://a.com/p")
    assert(parse1("http://a.com:443/p")("url_norm") == "http://a.com:443/p")
  }

  test("fragment always drops from the canonical form; query survives") {
    assert(parse1("https://a.com/p?k=v#sec")("url_norm") == "https://a.com/p?k=v")
  }

  test("no-authority and protocol-relative URLs pass through normalize unchanged") {
    assert(parse1("mailto:x@y.com")("url_norm") == "mailto:x@y.com")
    assert(parse1("//cdn.a.com/lib.js")("url_norm") == "//cdn.a.com/lib.js")
  }

  test("registrable domain: two-level suffixes, bare domains, IPs, single labels") {
    val cases = Seq(
      "deep.sub.example.co.uk" -> "example.co.uk",
      "www.example.com" -> "example.com",
      "example.com" -> "example.com",
      "localhost" -> "localhost",
      "192.168.4.250" -> "192.168.4.250",
      "news.site.com.au" -> "site.com.au")
    val got = cases.map(_._1).toDF("h")
      .select(UrlOps.registrableDomain(col("h"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("public suffix list: official-algorithm cases (exact, wildcard, exception, private, IDN)") {
    val cases = Seq(
      // a host that IS a public suffix passes through (operator contract)
      "com" -> "com", "co.nz" -> "co.nz", "kawasaki.jp" -> "kawasaki.jp",
      // full-list exact rules the r13 28-entry subset missed
      "example.co.nz" -> "example.co.nz", "www.example.co.nz" -> "example.co.nz",
      "example.com.pl" -> "example.com.pl", "b.example.com.pl" -> "example.com.pl",
      "example.co.il" -> "example.co.il", "www.example.co.il" -> "example.co.il",
      // 3-label exact rule (ide.kyoto.jp)
      "b.ide.kyoto.jp" -> "b.ide.kyoto.jp", "a.b.ide.kyoto.jp" -> "b.ide.kyoto.jp",
      // wildcard *.ck: any single label under ck is itself public...
      "test.ck" -> "test.ck", "b.test.ck" -> "b.test.ck", "a.b.test.ck" -> "b.test.ck",
      // ...except the !www.ck exception, which makes www.ck registrable
      "www.ck" -> "www.ck", "www.www.ck" -> "www.ck",
      // wildcard + exception pair: *.kawasaki.jp / !city.kawasaki.jp
      "test.kawasaki.jp" -> "test.kawasaki.jp",
      "b.test.kawasaki.jp" -> "b.test.kawasaki.jp",
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "www.city.kawasaki.jp" -> "city.kawasaki.jp",
      // private-section rules (blogspot.com, uk.com)
      "foo.blogspot.com" -> "foo.blogspot.com",
      "www.foo.blogspot.com" -> "foo.blogspot.com",
      "example.uk.com" -> "example.uk.com", "www.example.uk.com" -> "example.uk.com",
      // 4-label wildcard (*.compute.amazonaws.com)
      "z.compute.amazonaws.com" -> "z.compute.amazonaws.com",
      "b.z.compute.amazonaws.com" -> "b.z.compute.amazonaws.com",
      "a.b.z.compute.amazonaws.com" -> "b.z.compute.amazonaws.com",
      // IDN rule 公司.cn indexed under its punycode form xn--55qx5d.cn
      "foo.xn--55qx5d.cn" -> "foo.xn--55qx5d.cn",
      "www.foo.xn--55qx5d.cn" -> "foo.xn--55qx5d.cn",
      // case folds before matching
      "WWW.Example.CO.NZ" -> "example.co.nz")
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), UrlOps.registrableDomain(col("h")).as("d"))
      .as[(String, String)].collect().toMap
    for ((h, want) <- cases) assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
  }

  test("domainCap equals the single-window reference and is salt-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = UrlOps.syntheticUrls(docs)
    def keys(salt: Int): Set[Long] =
      UrlOps.domainCap(urls, "url", cap = 3, rankCol = "n_chars", salt = salt)
        .select("doc_id").as[Long].collect().toSet
    val twoPhase = keys(32)
    // plain single window — the semantic definition
    val ref = urls.withColumn("domain", UrlOps.registrableDomain(UrlOps.host(col("url"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("domain").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") <= 3).select("doc_id").as[Long].collect().toSet
    assert(twoPhase == ref)
    assert(keys(1) == twoPhase && keys(7) == twoPhase)
    // and every domain is actually capped
    val perDomain = UrlOps.domainCap(urls, "url", cap = 3, rankCol = "n_chars")
      .groupBy("domain").count().as[(String, Long)].collect()
    assert(perDomain.nonEmpty && perDomain.forall(_._2 <= 3))
  }

  test("synthetic fixture hits the parser branch matrix") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = UrlOps.parse(UrlOps.syntheticUrls(docs)).cache()
    try {
      assert(p.filter(col("port") === 443L).count() > 0)     // explicit default port
      assert(p.filter(col("port") === 8080L).count() > 0)
      assert(p.filter(col("path").isNull).count() > 0)       // empty path
      assert(p.filter(col("query").isNull).count() > 0)
      assert(p.filter(col("fragment").isNotNull).count() > 0)
      assert(p.filter(col("host").rlike("^192\\.168\\.")).count() > 0)
      assert(p.filter(col("domain").endsWith(".co.uk")).count() > 0)
      assert(p.filter(col("scheme") === "HTTPS").count() > 0) // case normalization fodder
    } finally p.unpersist()
  }

  test("surt: reversed labels, port defaulting, path/query, passthrough") {
    import spark.implicits._
    val got = Seq(
      "https://WWW.Example.COM/a/b?x=1",   // mixed case, default 443
      "http://example.com:8080/z",         // non-default port kept
      "https://example.com:443",           // default port dropped, empty path
      "http://192.168.1.2/x",              // IPv4: labels still reverse
      "mailto:someone@example.com")        // no authority: passthrough
      .toDF("url")
      .select(graft.operators.UrlOps.surt(col("url"))).as[String].collect()
    assert(got(0) == "com,example,www)/a/b?x=1")
    assert(got(1) == "com,example:8080)/z")
    assert(got(2) == "com,example)/")
    assert(got(3) == "2,1,168,192)/x")
    assert(got(4) == "mailto:someone@example.com")
  }
}
