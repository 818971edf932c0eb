package graft.tools

import graft.GraftSession
import graft.model.Canon
import graft.operators.{Dedup, Events, Windowing}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ×100 evidence for the two spill-heaviest families (r6 VERDICT item
  * 8): the ×10 probe is green, but the 100 TB claim extrapolates two
  * orders of magnitude — this probe buys one more decade on exactly the
  * paths whose failure mode is memory, under a deliberately CONSTRAINED
  * pool, asserting the outcome is spill-not-OOM.
  *
  *  - **pair dedup** (`ngramJaccardPairs`): the ×100 corpus is built
  *    with a per-replica substitution cipher (`translate` through a
  *    rotated alphabet), so replicas carry DISTINCT shingles — content
  *    grows ×100 without the self-duplication artifact that makes every
  *    pair family's OUTPUT quadratic (at ×10 the self-dup corpus flips
  *    every position duplicated; a cipher corpus measures the JOIN at
  *    scale, which is what breaks at 100 TB, not the report size).
  *    Replicas sharing a rotation (100/26 ≈ 4 of each) stay exact
  *    copies: a bounded band of true pairs proves the path still FINDS
  *    duplicates.
  *  - **containment + IVF clusters** (r8, r7 VERDICT item 4): the same
  *    distinct-content discipline applied to `containmentPairs` (cipher
  *    corpus) and `semanticClustersIvf` (per-replica dimension shift on
  *    the embeddings — norm-preserving, cosine-decorrelating), so both
  *    families' ×100 rows measure their joins, not self-dup output.
  *  - **two-pass windowing** (`sessionizeScalable` under total skew —
  *    all extra events on ONE user — and `withPrevious` on a 5-key
  *    timeline): the range-partition + boundary-stitch machinery whose
  *    pid-pinned frame persists corpus-scale by design; at ×100 it MUST
  *    spill, and results must stay row-countable.
  *
  * Spill vs OOM is observed directly: a TaskEnd listener accumulates
  * memory/disk spill bytes; the probe prints them per family and exits
  * nonzero on any failure. Run:
  *   SPARK_DRIVER_MEM=4g SPARK_GRAFT_MEM_FRACTION=0.2 \
  *     sbt "runMain graft.tools.Scale100Probe 100"
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    // optional 2nd arg: comma-separated family filter (rerun one family
    // without paying for the rest)
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    def wanted(name: String): Boolean = only.forall(_.exists(name.contains))
    // fewer concurrent tasks than the bench default: the pool constraint
    // divides across RUNNING tasks, and a 32-way local run under a
    // fraction-capped 4 GB heap leaves tasks under Spark's per-task page
    // minimums — that manifests as executor OOM (a crash), which is
    // exactly what this probe exists to rule out at FEASIBLE settings
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val builder = GraftSession.builder(s"local[$cpus]", cpus)
    sys.env.get("SPARK_GRAFT_MEM_FRACTION")
      .foreach(f => builder.config("spark.memory.fraction", f))
    val spark = builder.getOrCreate()
    graft.Graft.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    println(s"[x100] mult=$mult heap=${Runtime.getRuntime.maxMemory() >> 20}MB " +
      s"fraction=${sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "default")} sf=$dir")

    @volatile var memSpilled = 0L
    @volatile var diskSpilled = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          memSpilled += m.memoryBytesSpilled; diskSpilled += m.diskBytesSpilled
        }
    })

    // substitution cipher per replica: distinct content, identical shape.
    // 26 rotations; replicas i and i+26 collide into exact copies — the
    // deliberate bounded true-duplicate band.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val docsBig: DataFrame = (0 until mult).map { i =>
      Canon.documents(spark, dir)
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
        .withColumn("text", translate(col("text"), alpha, rot(i)))
    }.reduce(_ unionByName _)

    val evr = Canon.eventsRaw(spark, dir)
    val evrSkew: DataFrame = (evr +: (1 until mult).map { i =>
      evr.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", lit(7L)) // ALL extra volume on one user
        .withColumn("ts_us", col("ts_us") + lit(i.toLong * 7L))
    }).reduce(_ unionByName _)

    var failed = false
    def probe(name: String)(f: => Long): Unit = if (wanted(name)) {
      val m0 = memSpilled; val d0 = diskSpilled
      val t0 = System.nanoTime()
      try {
        val rows = f
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[x100] $name%-18s rows=$rows%12d wall=$secs%8.1fs " +
          s"spill_mem=${(memSpilled - m0) >> 20}MB spill_disk=${(diskSpilled - d0) >> 20}MB")
        if (rows <= 0) { println(s"[x100] FAIL $name: no rows"); failed = true }
      } catch { case e: Throwable =>
        println(s"[x100] FAIL $name: ${e.getClass.getSimpleName} ${e.getMessage}")
        e.printStackTrace()
        var c = e.getCause
        while (c != null) { println(s"[x100] caused by: $c"); c.getStackTrace.take(8).foreach(f => println(s"    at $f")); c = c.getCause }
        failed = true
      }
    }

    probe("dedup_pairs_x100") {
      Dedup.ngramJaccardPairs(docsBig, 3, 0.6).count()
    }
    // r8 (r7 VERDICT item 4): the same distinct-content discipline for
    // the two families whose ×10 headline ratios were driven by the
    // self-dup corpus artifact (×13 ivf, ×5.9 containment), so their
    // ×100 rows measure the JOIN, not the quadratic report.
    probe("containment_x100") {
      Dedup.containmentPairs(docsBig, 0.8).count()
    }
    // embeddings analog of the substitution cipher: a per-replica
    // circular shift of the dimensions (norm-preserving, cosine to other
    // shifts ~random), so replicas carry DISTINCT vectors; replicas
    // sharing a shift (mult/dim of each) stay exact copies — the bounded
    // true-duplicate band that proves the path still finds near-dups.
    val emb = Canon.embeddings(spark, dir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // localCheckpoint: a PRODUCTION ×100 corpus is one parquet scan leaf;
    // this synthetic one is a 100-way expression union, and the IVF
    // pipeline references its corpus several times (both join sides, the
    // verify rejoin, union-find rounds) — a logical plan rendered as a
    // TREE re-expands the shared scaffold at every reference, and cache
    // naming/explain WALK that tree: at ×100 the walk alone burned
    // minutes of driver CPU. Materializing the scaffold to a LogicalRDD
    // leaf (~110 MB) makes the probe measure the OPERATOR, exactly as a
    // parquet-backed corpus would.
    val embBig: DataFrame = (0 until mult).map { i =>
      val k = i % dim
      val shifted = if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k))
      emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
        .withColumn("embedding", shifted)
    }.reduce(_ unionByName _).localCheckpoint(true)
    // cells GROW with the corpus (constant ~625-vector cells — the
    // documented SemDeDup sizing): candidates stay Θ(n·cellsize), not
    // Θ(n²/8). The default cells=8 is the sf0.1 bench sizing; reusing it
    // at ×100 would be a 3e10-candidate self-inflicted quadratic.
    probe("ivf_clusters_x100") {
      Dedup.semanticClustersIvf(embBig, tau = 0.4, cells = 8 * mult).count()
    }
    // r8: the DISTRIBUTED union-find tier (pointer-jumping label
    // propagation, eager-localCheckpoint rounds) forced over the full
    // ×100 pair graph — the driver tier would normally absorb this edge
    // count, so localEdges=0 makes the loop itself carry the ×100 load:
    // per-round plan size must stay constant (the r8 checkpoint fix) and
    // the rounds must converge. ~819k verified pairs → 1.6M directed
    // edges through O(log diameter) join+aggregate rounds.
    probe("clusters_dist_x100") {
      Dedup.clustersFromPairs(Dedup.ngramJaccardPairs(docsBig, 3, 0.6),
        localEdges = 0L).count()
    }
    probe("sessionize_skew") {
      Events.sessionizeScalable(evrSkew, gapUs = 1800000000L).count()
    }
    probe("two_pass_lag") {
      Windowing.withPrevious(
        evrSkew.select(col("user_id") % 5 as "series", col("ts_us"),
          col("event_id"), col("user_id")),
        Seq("series"), Seq("ts_us", "event_id"), Seq("user_id")).count()
    }

    println(if (failed) "[x100] RESULT: FAIL" else "[x100] RESULT: OK — spill-not-OOM at x" + mult)
    spark.stop()
    if (failed) sys.exit(1)
  }
}
