package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted aggregation == plain groupBy on a skewed corpus") {
    // 90% of rows share one hot key
    val df = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }.toDF("k", "v")
    val plain = df.groupBy("k").agg(
      sum($"v").as("sum_v"), count($"v").as("count_v"),
      min($"v").as("min_v"), max($"v").as("max_v"), avg($"v").as("mean_v"))
      .orderBy("k").collect()
    val salted = Skew.saltedAggregate(df, Seq("k"),
      Seq("v" -> "sum", "v" -> "count", "v" -> "min", "v" -> "max", "v" -> "mean"))
      .orderBy("k").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(p.getDouble(1) == s.getDouble(1))   // sum exact (integer-valued)
      assert(p.getLong(2) == s.getLong(2))       // count
      assert(p.getDouble(3) == s.getDouble(3))   // min
      assert(p.getDouble(4) == s.getDouble(4))   // max
      assert(math.abs(p.getDouble(5) - s.getDouble(5)) < 1e-9) // mean
    }
  }

  test("unsupported aggregate rejected") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("k"), Seq("v" -> "median"))
    }
  }
}
