package graft.tools

import graft.SparkEntry
import graft.model.Canon
import graft.operators.{Multimodal, UrlOps, SitemapOps, Curation, Frontier, RobotsOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 optimization probe: attribute the expensive queries' seconds to
  * their sub-stages (fixture assembly vs parse vs operator chain) under
  * the bench session config, so each optimization targets the actual
  * cost. `sbt "runMain graft.tools.R16Probe [sfDir]"`. Each measurement
  * runs twice; read the second (steady-state) number.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        body
        val s = (System.nanoTime() - t0) / 1e9
        if (round == 2) println(f"[probe] $label%-46s $s%8.2f s")
      }
      System.out.flush()
    }

    val docs = Canon.documents(spark, sfDir)
    docs.count()

    // --- crawl fixture chain
    val urls = UrlOps.syntheticUrls(docs)
    time("urls: syntheticUrls count")(urls.count())
    time("warc fixture: synth(urls) noop")(
      noop(graft.sources.WarcIngest.syntheticWarcFromDocuments(urls)))
    val stage = java.nio.file.Files.createTempDirectory("r16_urlwarc_").toString
    graft.sources.WarcIngest.syntheticWarcFromDocuments(urls)
      .write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    time("warc parse: records(inline fixture) noop")(
      noop(graft.sources.WarcIngest.records(
        graft.sources.WarcIngest.syntheticWarcFromDocuments(urls))))
    time("warc parse: records(staged parquet) noop")(
      noop(graft.sources.WarcIngest.records(staged)))

    def recsOf(media: DataFrame): DataFrame =
      graft.sources.WarcIngest.records(media)
        .filter(col("ok") && col("http_status") === 200)
        .select(regexp_extract(col("record_id"), "urn:doc:([0-9]+)", 1)
          .cast("long").as("doc_id"),
          col("target_uri").as("url"), col("body").as("html"))
    time("crawl_pipeline from inline fixture")(
      noop(Curation.crawlReport(recsOf(
        graft.sources.WarcIngest.syntheticWarcFromDocuments(urls)))))
    time("crawl_pipeline from staged parquet")(
      noop(Curation.crawlReport(recsOf(staged))))
    time("crawl_curated from staged parquet")(
      noop(Curation.crawlReportCurated(recsOf(staged),
        ref = docs.filter(col("lang") === "en"))))
    // curated sub-stages from staged records
    val extracted = recsOf(staged).select(col("doc_id"), col("url"),
      TextOps.cleanupStages.foldLeft(TextOps.nfc(TextOps.stripHtml(col("html")))) {
        case (c, (p, r)) => regexp_replace(c, p, r)
      }.as("text"))
    time("  curated stage: extract only")(noop(extracted))
    time("  curated stage: extract+quality")(
      noop(TextOps.withQuality(extracted, tokenCountCol = Some("__ntok"))))

    // --- frontier fixture chain
    val hosts = urls.select(lower(UrlOps.host(col("url"))).as("host"))
      .filter(col("host").isNotNull).distinct()
    time("hosts distinct count")(hosts.count())
    time("sitemaps fixture: synth(hosts) noop")(noop(SitemapOps.syntheticSitemaps(hosts)))
    val smStage = java.nio.file.Files.createTempDirectory("r16_sitemaps_").toString
    SitemapOps.syntheticSitemaps(hosts).write.mode("overwrite").parquet(smStage)
    val smStaged = spark.read.parquet(smStage)
    def fetchedOf(h: DataFrame): DataFrame = h.filter(length(col("host")) % 3 === 0)
      .select(concat(lit("https://"), col("host"), lit("/p/0-0?a=1&b="),
        (length(col("host")) % 7).cast("string")).as("url"))
    time("frontier from inline fixtures") {
      import graft.CacheLedger
      CacheLedger.scoped {
        import graft.CacheLedger.Tracked
        val h = hosts.trackedCache
        noop(Frontier.frontier(SitemapOps.syntheticSitemaps(h),
          Frontier.syntheticFrontierRobots(h), fetchedOf(h), "GraftBot", perHostCap = 2))
      }
    }
    time("frontier from staged sitemaps") {
      import graft.CacheLedger
      CacheLedger.scoped {
        import graft.CacheLedger.Tracked
        val h = smStaged.select(col("host")).distinct().trackedCache
        noop(Frontier.frontier(smStaged,
          Frontier.syntheticFrontierRobots(h), fetchedOf(h), "GraftBot", perHostCap = 2))
      }
    }
    time("url_robots from inline fixtures")(
      noop(RobotsOps.evaluate(urls,
        RobotsOps.rules(RobotsOps.syntheticRobots(hosts)), "GraftBot")))

    // --- multimodal pixel fixture
    time("pixel fixture: syntheticPixelMedia noop")(
      noop(Multimodal.syntheticPixelMedia(docs)))
    val pxStage = java.nio.file.Files.createTempDirectory("r16_pixels_").toString
    Multimodal.syntheticPixelMedia(docs).write.mode("overwrite").parquet(pxStage)
    val pxStaged = spark.read.parquet(pxStage)
    time("resizePixels from inline fixture")(
      noop(Multimodal.resizePixels(Multimodal.syntheticPixelMedia(docs), 4, 4)))
    time("resizePixels from staged parquet")(
      noop(Multimodal.resizePixels(pxStaged, 4, 4)))
    time("audio decode from inline fixture")(
      noop(Multimodal.decodeAudio(Multimodal.syntheticAudioFromDocuments(docs))))

    // --- curated sub-stages (from the staged records — isolates the
    // curation chain itself). Each stage scoped so tracked caches release.
    {
      import graft.CacheLedger
      import graft.CacheLedger.Tracked
      import org.apache.spark.sql.expressions.Window
      val best = TextOps.langLexicons.map { case (lang, lex) =>
        struct(graft.functions.TextSignalExpressions
          .token_hit_cnt(col("text"), lex).as("h"), lit(lang).as("l"))
      }
      def langedOf(): DataFrame = {
        val scored = TextOps.withQuality(extracted, tokenCountCol = Some("__graft_ntok"))
          .withColumn("__graft_fp", md5(col("text")))
          .withColumn("lang", when(greatest(best: _*).getField("h") === 0, lit("unk"))
            .otherwise(greatest(best: _*).getField("l")))
        scored.withColumn("__graft_rn", row_number().over(
            Window.partitionBy("__graft_fp").orderBy(col("doc_id").asc)))
          .filter(col("__graft_rn") === 1).drop("__graft_rn", "__graft_fp")
          .filter(col("lang").isin("en"))
      }
      time("  curated: langed chain (no cache)")(CacheLedger.scoped(noop(langedOf())))
      time("  curated: lmScore(langed)")(CacheLedger.scoped {
        val langed = langedOf().trackedCache
        noop(TextOps.lmScore(langed.select(col("doc_id"), col("text")),
          docs.filter(col("lang") === "en"), "text", "doc_id"))
      })
      time("  curated: full (scoped)")(CacheLedger.scoped(
        noop(Curation.crawlReportCurated(recsOf(staged),
          ref = docs.filter(col("lang") === "en")))))
    }

    // --- store CDC (scoped like the bench so caches release per run)
    time("q_store_cdc full query")(graft.CacheLedger.scoped(
      noop(SparkEntry.queries("q_store_cdc")(spark, sfDir))))
    time("q_tier_cdc full query")(graft.CacheLedger.scoped(
      noop(SparkEntry.queries("q_tier_cdc")(spark, sfDir))))

    // --- dedup clusters (scoped — unscoped numbers were cache-tainted)
    time("q_dedup_clusters full")(graft.CacheLedger.scoped(
      noop(SparkEntry.queries("q_dedup_clusters")(spark, sfDir))))
    time("q_dedup_keepers full")(graft.CacheLedger.scoped(
      noop(SparkEntry.queries("q_dedup_keepers")(spark, sfDir))))

    spark.stop()
  }
}
