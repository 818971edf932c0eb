package graft.tools

import graft.{CacheLedger, GraftSession}
import graft.model.Canon
import graft.operators.{Ranking, TextOps}
import org.apache.spark.sql.functions._

/** The two-pass operators (Windowing/Ranking/Events) persist their
  * pid-pinned range frame MEMORY_AND_DISK for the duration of the query —
  * a corpus-scale footprint by design (the price of stable partition ids
  * across AQE consumer branches). This probe runs the two heaviest users
  * of that machinery (the q_text_pack and q_ntile_quality shapes) on a
  * ×MULT self-multiplied corpus under a CONSTRAINED driver heap and
  * reports the persisted bytes, proving the frame SPILLS to disk instead
  * of OOMing when it outgrows the storage-memory pool.
  *
  * Run capped (SPARK_DRIVER_MEM feeds build.sbt's forked -Xmx;
  * SPARK_GRAFT_MEM_FRACTION shrinks the unified memory pool below the
  * cache size so the spill path provably executes — parquet-compressed
  * columnar cache blocks are small enough at probe scale that a plain
  * heap cap never pressures them):
  *   SPARK_DRIVER_MEM=700m SPARK_GRAFT_MEM_FRACTION=0.01 \
  *     sbt "runMain graft.tools.PersistFootprintProbe 100"
  *
  * Exit code is nonzero if either query fails or returns no rows, so the
  * probe is green/red without reading the output. Expected footprint is
  * arithmetic, documented in SCALE.md: rows × bytes/row of the PROJECTED
  * frame (callers pre-project — q_text_pack persists (doc_id, chunk_id,
  * n_tokens) ≈ 24 B/row + row overhead; q_ntile_quality persists
  * (doc_id, quality) ≈ 16 B/row + overhead).
  */
object PersistFootprintProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val heapMb = Runtime.getRuntime.maxMemory() >> 20
    val frac = sys.env.get("SPARK_GRAFT_MEM_FRACTION")
    val builder = GraftSession.builder("local[8]", 8)
    frac.foreach(f => builder.config("spark.memory.fraction", f))
    val spark = builder.getOrCreate()
    graft.Graft.register(spark)
    println(s"[footprint] heap=${heapMb}MB memory.fraction=${frac.getOrElse("default")}")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = (0 until mult).map(i =>
        Canon.documents(spark, dir)
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionByName _)

    var failed = false
    def probe(name: String, requireSpill: Boolean = false)(run: => Long): Unit = {
      try {
        val t0 = System.nanoTime()
        val n = run // the two-pass persist materializes inside
        val sec = (System.nanoTime() - t0) / 1e9
        val infos = spark.sparkContext.getRDDStorageInfo
        val mem = infos.map(_.memSize).sum
        val disk = infos.map(_.diskSize).sum
        val parts = infos.map(_.numCachedPartitions).sum
        println(f"[footprint] $name%-16s mult=${mult}x heap=${heapMb}MB " +
          f"rows_out=$n%d cachedParts=$parts memMB=${mem / 1048576.0}%8.1f " +
          f"diskMB=${disk / 1048576.0}%8.1f spilled=${disk > 0} ${sec}%6.1fs")
        if (n <= 0) failed = true
        if (requireSpill && disk == 0) {
          println(s"[footprint] $name expected DISK spill but the cache fit in memory")
          failed = true
        }
      } catch { case e: Throwable =>
        failed = true
        println(s"[footprint] $name FAILED: ${e.getMessage}")
      } finally CacheLedger.releaseAll() // the probe inspects, THEN releases
    }

    probe("text_pack") {
      TextOps.packChunks(
        TextOps.chunks(docs, 32, 8).select("doc_id", "chunk_id", "n_tokens"),
        256L, Seq(col("doc_id").asc, col("chunk_id").asc)).count()
    }
    probe("ntile_quality") {
      Ranking.withNtile(TextOps.qualityScore(docs), 10,
          Seq(col("quality").desc, col("doc_id").asc), "decile")
        .groupBy("decile").agg(count(lit(1)).as("n_docs"))
        .count()
    }
    // The spill demonstration: the projected frames above parquet-compress
    // far below any sane storage pool, so ALSO run the pack with the chunk
    // TEXT riding along (the wide-caller shape the Windowing scaladoc
    // warns about). With SPARK_GRAFT_MEM_FRACTION shrinking the unified
    // pool below the cache size, MEMORY_AND_DISK must overflow its blocks
    // to DISK and still finish with correct output — the "degrades by
    // spilling, not failing" claim, executed.
    if (frac.isDefined) probe("text_pack_wide", requireSpill = true) {
      TextOps.packChunks(
        TextOps.chunks(docs, 32, 8), // keeps the `chunk` text column
        256L, Seq(col("doc_id").asc, col("chunk_id").asc)).count()
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
