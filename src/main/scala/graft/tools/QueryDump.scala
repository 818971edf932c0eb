package graft.tools

import graft.{CacheLedger, Graft, GraftSession, SparkEntry}

/** Dump a subset of SparkEntry.queries (plus their oracle SQL) in the
  * exact Verify layout — for iterating on ONE oracle without paying for
  * the full roster. Run:
  *   sbt "runMain graft.tools.QueryDump q_a,q_b <sfDir> <outDir>"
  * then: python3 tools/check_oracle.py <sfDir> <outDir>
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val Array(namesArg, sfDir, outDir) = args
    val names = namesArg.split(",").toSeq
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    Graft.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      CacheLedger.scoped {
        SparkEntry.queries(n)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$n")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
