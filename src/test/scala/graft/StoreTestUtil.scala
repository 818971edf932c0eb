package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared store-spec helpers (consolidated r11 — three copies had
  * already drifted on the empty-frame null guard). */
object StoreTestUtil {
  /** Order-independent content fingerprint over the canonical payload
    * minus tags: (row count, sum of per-row hashes). Empty frame →
    * (0, 0). The tag-inclusive variant lives with the versioned-store
    * specs, which assert tag fidelity too. */
  def fp(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      sum(hash(col("series"), col("ts_us"), col("value"), col("rid")).cast("long"))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Number of .parquet files under a directory tree. */
  def parquetFiles(p: String): Int = {
    // listFiles is null (not empty) on an unreadable or concurrently
    // removed dir — e.g. a _temporary dir vanishing mid-walk
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(p))
  }
}
