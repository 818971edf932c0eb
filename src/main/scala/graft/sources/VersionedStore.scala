package graft.sources

import graft.model.Canon._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned shard store with time travel — the reference's Git-backed
  * history (one Irmin commit per write, `/root/reference/src/shard.re:26-34`,
  * one store commit per request `src/main.re:17`) re-expressed in the open
  * table-format idiom (the Delta/Iceberg public design): an ordered chain
  * of tiny manifest files, each naming the data directories live at that
  * version, committed by atomic rename. Data directories are immutable
  * once committed; every mutation writes NEW parquet dirs plus a NEW
  * manifest, so each historical version stays readable forever (time
  * travel) and readers never block on writers.
  *
  * Concurrency contract: SINGLE WRITER — faithful to the reference, whose
  * global request mutex serializes every mutation (`src/main.re:225-227`).
  * Readers are safe at any moment: a manifest is either absent or
  * complete (the commit rename is atomic on HDFS and POSIX filesystems;
  * object stores substitute a conditional put — same public pattern).
  *
  * 100 TB story: manifests are KB-sized regardless of data volume (they
  * name directories, not files, so there is no O(files) driver-side
  * listing cost at commit time); an append writes only its delta; a
  * version read lists only that version's dirs. History cost is bounded
  * by MUTATION COUNT, never data size, and `compact` rewrites the live
  * set into one dir without touching history.
  *
  * The manifest format is deliberately line-oriented text (`op <op>` then
  * one `dir <name>` per live directory) — no JSON parser in the commit
  * path, trivially diffable, and versioned by file name (`v%08d.txt`).
  */
object VersionedStore {

  /** One committed version: `dirs` are the data directories (relative to
    * `root/data/`) whose union is the store content at `version`.
    */
  case class Commit(version: Int, op: String, dirs: Seq[String])

  private val MANIFESTS = "_manifests"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** The committed chain, oldest first. In-flight temp files (dot-prefixed,
    * no final name) never match the manifest pattern, so a concurrent
    * reader can list at any time.
    */
  def versions(spark: SparkSession, root: String): Seq[Commit] = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, MANIFESTS)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .filter(_.matches("v\\d{8}\\.txt")).sorted
      .map { n =>
        val in = fs.open(new Path(dir, n))
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        Commit(n.stripPrefix("v").stripSuffix(".txt").toInt,
          lines.head.stripPrefix("op "), lines.tail.map(_.stripPrefix("dir ")))
      }
  }

  private def nextVersion(spark: SparkSession, root: String): Int =
    versions(spark, root).lastOption.map(_.version).getOrElse(0) + 1

  private def commitAt(spark: SparkSession, root: String, v: Int,
                       op: String, dirs: Seq[String]): Int = {
    val fs = fsOf(spark, root)
    val mdir = new Path(root, MANIFESTS)
    fs.mkdirs(mdir)
    val tmp = new Path(mdir, f".v$v%08d.tmp")
    val out = fs.create(tmp, true)
    try out.write((s"op $op" +: dirs.map("dir " + _)).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new Path(mdir, f"v$v%08d.txt")),
      s"manifest commit rename failed for version $v (concurrent writer?)")
    v
  }

  /** Write `df` as a fresh immutable data dir for version `v`; returns the
    * dir name, or None when the frame was empty (an empty partitioned
    * parquet write emits no schema-bearing files, so an empty mutation
    * commits a manifest without a data dir — still a real version).
    */
  private def writeData(df: DataFrame, root: String, v: Int, op: String): Option[String] = {
    val name = f"d$v%08d-$op"
    df.withColumn("day", date_format(timestamp_micros(col(TS_US)), "yyyy-MM-dd"))
      .sortWithinPartitions(col(SERIES), col(TS_US))
      .write.partitionBy(SERIES, "day")
      .option("maxRecordsPerFile", ShardStore.maxRecordsPerFile)
      .mode(SaveMode.Overwrite).parquet(s"$root/data/$name")
    val fs = fsOf(df.sparkSession, root)
    val it = fs.listFiles(new Path(s"$root/data/$name"), true)
    var hasData = false
    while (!hasData && it.hasNext)
      hasData = it.next().getPath.getName.endsWith(".parquet")
    if (hasData) Some(name) else None
  }

  /** Append canonical datapoints as a new version (delta write: only the
    * new rows touch disk; the manifest carries the parent's dirs forward).
    */
  def append(df: DataFrame, root: String): Int = {
    val spark = df.sparkSession
    val v = nextVersion(spark, root)
    val d = writeData(df, root, v, "append")
    val parent = versions(spark, root).lastOption.map(_.dirs).getOrElse(Seq.empty)
    commitAt(spark, root, v, "append", parent ++ d)
  }

  /** D1 delete as a version: rewrite survivors into one fresh dir; the
    * deleted rows remain readable at every earlier version.
    */
  def deleteRewrite(survivors: DataFrame, root: String): Int = {
    val spark = survivors.sparkSession
    val v = nextVersion(spark, root)
    val d = writeData(survivors, root, v, "delete")
    commitAt(spark, root, v, "delete", d.toSeq)
  }

  /** File-hygiene compaction as a version: collapse the live dir set to
    * one (repartitioned by series), bit-identical content, history intact.
    */
  def compact(spark: SparkSession, root: String): Int = {
    val v = nextVersion(spark, root)
    val d = writeData(read(spark, root).repartition(col(SERIES)), root, v, "compact")
    commitAt(spark, root, v, "compact", d.toSeq)
  }

  /** Read the store at its latest version. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    readAt(spark, root, vs.last.version)
  }

  /** Time travel: the store exactly as of version `v`. */
  def readAt(spark: SparkSession, root: String, v: Int): DataFrame = {
    val vs = versions(spark, root)
    val c = vs.find(_.version == v).getOrElse(throw new IllegalArgumentException(
      s"version $v not committed (have ${vs.map(_.version).mkString(",")})"))
    val canon = Seq(col(SERIES), col(TS_US), col(TAG), col(VALUE), col(RID))
    if (c.dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else c.dirs.map(d => spark.read.parquet(s"$root/data/$d").select(canon: _*))
      .reduce(_ unionByName _)
  }
}
