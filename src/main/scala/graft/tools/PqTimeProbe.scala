package graft.tools

import graft.{CacheLedger, Graft, GraftSession}
import graft.CacheLedger.Tracked
import graft.operators.Similarity
import org.apache.spark.sql.functions._

object PqTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    Graft.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.model.Canon.embeddings(spark, "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqtime] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    println(s"[pqtime] corpus rows=${df.count()}")
    val books = Similarity.trainPqCached(df, 4, 16, 2)
    val enc1 = Similarity.pqEncodeResidual(df, books.take(1))
    val enc2 = Similarity.pqEncodeResidual(df, books)
    // force full evaluation without cache machinery
    for (pass <- 1 to 2) {
      t(s"lv1 noop write p$pass")(enc1.write.format("noop").mode("overwrite").save())
      t(s"lv2 noop write p$pass")(enc2.write.format("noop").mode("overwrite").save())
    }
    t("lv2 agg(sum of first code)")(
      enc2.agg(sum(element_at(col("codes"), 1))).head())
    CacheLedger.scoped {
      t("lv2 persist build")({ val c = enc2.trackedCache; c.count(); c })
    }
    spark.stop()
  }
}
