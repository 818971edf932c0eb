package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: Spark 4 removed the public
  * Column(Expression) constructor (Connect refactor); extensions that add
  * native expressions need this one hop. Lives under org.apache.spark.sql
  * for package-private access — the conventional pattern for third-party
  * Catalyst expression libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Deterministic release of `Dataset.localCheckpoint` blocks.
  *
  * `Dataset.unpersist` only talks to the SQL `CacheManager`; a local
  * checkpoint's blocks belong to the UNDERLYING RDD (the `LogicalRDD` leaf
  * the checkpoint rewrote the plan to), so without this hop superseded
  * checkpoints linger until the ContextCleaner happens to GC the RDD.
  * Walking the analyzed plan's leaves and unpersisting their RDDs drops the
  * blocks promptly; any later attempt to recompute the released checkpoint
  * fails loudly (checkpoint block not found) rather than silently
  * recomputing stale lineage — exactly the failure mode a retired
  * immutable snapshot should have.
  */
object CheckpointBridge {
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

/** The file set a plan would ACTUALLY scan, post-partition-pruning (one
  * entry per scan that selects the file, so a file read by two scans
  * appears twice). `Dataset.inputFiles` ignores partition filters, and a
  * plan's string form truncates scan locations — this walks the physical
  * scans' `selectedPartitions` (descending through AQE wrappers), the
  * ground truth the scan-narrowing specs pin their IO claims on.
  */
object ScanBridge {
  def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
      case other =>
        other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
