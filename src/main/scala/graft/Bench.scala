package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{ConcurrentHashMap, Executors}
import scala.jdk.CollectionConverters._

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Built to survive an external timeout (round 1 died rc=124 with no
  * output — sbt launch + compile + serial warmup overran the window):
  *   - the warmup pass runs on a thread pool (Spark interleaves the jobs,
  *     overlapping per-query codegen/planning with execution — the same
  *     ~3x wall win Verify.scala measured), and each warmup duration is
  *     recorded as a pessimistic fallback timing;
  *   - a JVM shutdown hook prints the JSON line from whatever has been
  *     measured so far, so even a SIGTERM'd run yields a parseable
  *     artifact (run/fork := true → sbt forwards the TERM to this JVM);
  *   - the timed pass is serial (accurate latencies) and refines each
  *     entry via min(); a second timed run happens only for queries whose
  *     first run exceeded 1s — sub-second queries don't need one.
  *
  * Warmup-first because the first execution of each plan shape pays
  * JIT + whole-stage-codegen (janino) compilation, a per-process constant
  * rather than a per-data cost; the timed pass reports steady-state
  * throughput, which is what scales with data volume.
  */
object Bench {
  private val timings = new ConcurrentHashMap[String, Double]()
  // warmup durations: fallback ONLY (used by emit when a query has no
  // timed entry, e.g. the run was SIGTERM'd mid-pass). Never min()'d
  // against timed numbers — a warmup run can be cache-assisted by a
  // sibling thread's shared subplan cache and undercut honest compute.
  private val warmupTimings = new ConcurrentHashMap[String, Double]()
  private val failures = ConcurrentHashMap.newKeySet[String]()
  @volatile private var printed = false
  private val lock = new Object

  /** The driver-contract JSON line (exposed for the format unit test —
    * a malformed line silently costs a whole round's perf evidence).
    *
    * Values are rendered at centisecond resolution with trailing zeros
    * trimmed: the driver's log-tail capture is a 2000-char window and
    * r3's full-precision line (1983 chars) + sbt's trailing "[success]"
    * line overran it, truncating the line's head — three rounds of
    * parsed:null. 2dp keeps a 78-query line ~1.75KB with headroom for
    * growth; sub-10ms differences are noise on a host with ±40%
    * run-to-run variance anyway.
    */
  private def fmt(v: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // "0.20" -> "0.2", "1.00" -> "1" (still legal JSON)
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
  }

  private[graft] def formatLine(ts: Seq[(String, Double)], failed: Seq[String],
                                sfDir: String, partial: Boolean): String = {
    val qs = ts.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = fmt(ts.map(_._2).sum)
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","partial":$partial,"failed":$fl}"""
  }

  /** Print the result line exactly once (normal end or shutdown hook). */
  private def emit(sfDir: String, partial: Boolean): Unit = lock.synchronized {
    if (printed) return
    val merged = (warmupTimings.asScala ++ timings.asScala).toMap // timed wins
    val snap = merged.toSeq.sortBy(_._1)
    if (snap.isEmpty) return // nothing measured: stay silent, don't lie
    val line = formatLine(snap, failures.asScala.toSeq.sorted, sfDir, partial)
    println(line)
    System.out.flush()
    // Belt and braces: sbt's logger decorates stdout ("[info] {...}"),
    // which has defeated the driver's parse two rounds running — also
    // write the bare line to a file nothing rewrites.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    printed = true
  }

  /** Record an observed duration, keeping the best (lowest) per query. */
  private def record(n: String, sec: Double): Unit =
    timings.merge(n, sec, (a, b) => math.min(a, b))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(sfDir, partial = true)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // 75 queries × several codegen stages exceed the default 100-entry
      // janino cache; evictions recompile mid-measurement
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.register(spark)
    val names = SparkEntry.queries.keys.toSeq.sorted

    // Default timing sink is count(): comparable with the round-1 numbers
    // and with what a limit/aggregate consumer pays. count() lets Catalyst
    // prune computed projection columns (q_vec_quantize times as a near-
    // bare scan) — set SPARK_GRAFT_BENCH_SINK=noop for full-
    // materialization timing (the noop sink consumes every column; whole-
    // corpus projections then cost 2-4x more and the run takes ~2x wall).
    // Failures record nothing (a 50ms crash must not win the min() over
    // real runs) and surface in the JSON's "failed" list instead.
    val noopSink = sys.env.get("SPARK_GRAFT_BENCH_SINK").contains("noop")
    def runOne(n: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (noopSink) df.write.format("noop").mode("overwrite").save()
        else df.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        failures.add(n)
        System.err.println(s"[bench] $n failed: ${e.getMessage}")
        None
      }
    }

    // Warmup on a pool: codegen + JIT. Durations are wall-clock under
    // contention (inflated, never deflated), so recording them as initial
    // timings is a safe pessimistic fallback for a killed run.
    val pool = Executors.newFixedThreadPool(8)
    val tasks = names.map(n => pool.submit(new Runnable {
      def run(): Unit = {
        runOne(n).foreach(t => warmupTimings.merge(n, t, (a, b) => math.min(a, b)))
        System.err.println(s"[bench] warm $n")
      }
    }))
    tasks.foreach(_.get())
    pool.shutdown()

    // Timed pass, serial for accurate latencies. The stderr line per query
    // makes a timeout postmortem show exactly where the run died.
    // clearCache first: several operators cache their (small) results and
    // internal indexes, and Spark's CacheManager matches cached plans by
    // canonical equality across separately-built invocations — without the
    // clear, a timed run after warmup is a cache LOOKUP, not the pipeline
    // compute, and the number overstates the engine. (Within one action the
    // operators' in-query caches still engage — that is design, not warmup
    // residue.) Codegen/JIT warmup survives the clear, which is the part
    // warmup exists for.
    val firstRun = names.flatMap { n =>
      spark.catalog.clearCache()
      runOne(n).map { t =>
        record(n, t)
        System.err.println(f"[bench] timed $n%-28s $t%.2fs")
        n -> t
      }
    }
    // Second run only where it matters: one-off GC pauses / recompiles
    // land on whichever query follows a heavy one, but sub-second queries
    // are already dominated by fixed overhead — skip their re-run.
    firstRun.filter(_._2 > 1.0).foreach { case (n, _) =>
      spark.catalog.clearCache()
      runOne(n).foreach(record(n, _))
    }

    emit(sfDir, partial = false)
    spark.stop()
  }
}
