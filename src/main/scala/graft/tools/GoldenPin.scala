package graft.tools

import graft.{CacheLedger, Graft, GraftSession, SparkEntry}

/** Prints the pinned-content-hash value for one or more `goldenBases`
  * queries at the driver's verify scale — the number that goes into
  * `SparkEntry.goldenHashes`. Run:
  *   sbt "runMain graft.tools.GoldenPin q_dedup_keepers_lsh [sfDir]"
  * The hash is order-independent (see SparkEntry.contentHash), so the
  * local[4]-vs-local[32] parallelism difference cannot move it; pin at
  * sf0.01 because that is the scale the driver verifies at.
  */
object GoldenPin {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GoldenPin <query>[,<query>...] [sfDir]")
    val names = args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    Graft.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val base = s"${n}_golden"
      val fn = SparkEntry.queries.getOrElse(base,
        sys.error(s"$base not in SparkEntry.queries — is $n in goldenBases?"))
      val h = CacheLedger.scoped { fn(spark, dir).collect()(0).getString(0) }
      println(s"""[golden] "$n" -> "$h"""")
    }
    spark.stop()
  }
}
