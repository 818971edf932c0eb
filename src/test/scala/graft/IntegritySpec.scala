package graft

import graft.operators.{Integrity, TextOps}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the corpus-QA operators added in round 6:
  * referential integrity, token commonness, n-gram novelty.
  */
class IntegritySpec extends SparkSuite {
  import spark.implicits._

  test("integrity report: counts, dup ids, orphans both ways") {
    // left: ids 1,2,2,3 (2 duplicated); right: ids 2,4,4 (4 duplicated)
    val l = Seq(1L, 2L, 2L, 3L).toDF("doc_id")
    val r = Seq(2L, 4L, 4L).toDF("vec_id")
    val row = Integrity.report(l, r, "doc_id", "vec_id").head()
    assert(row.getAs[Long]("n_left") == 4)
    assert(row.getAs[Long]("n_left_ids") == 3)
    assert(row.getAs[Long]("n_left_dup_ids") == 1)   // id 2
    assert(row.getAs[Long]("n_left_orphans") == 2)   // ids 1, 3
    assert(row.getAs[Long]("n_right") == 3)
    assert(row.getAs[Long]("n_right_ids") == 2)
    assert(row.getAs[Long]("n_right_dup_ids") == 1)  // id 4
    assert(row.getAs[Long]("n_right_orphans") == 1)  // id 4
  }

  test("integrity report: aligned tables report zero dup ids and orphans") {
    val l = Seq(1L, 2L, 3L).toDF("doc_id")
    val r = Seq(3L, 1L, 2L).toDF("vec_id")
    val row = Integrity.report(l, r, "doc_id", "vec_id").head()
    assert(row.getAs[Long]("n_left_orphans") == 0)
    assert(row.getAs[Long]("n_right_orphans") == 0)
    assert(row.getAs[Long]("n_left_dup_ids") == 0)
    assert(row.getAs[Long]("n_right_dup_ids") == 0)
  }

  test("commonness: mean global token frequency, empty docs dropped") {
    val docs = Seq(
      (1L, "a a b"),   // a appears 3x globally, b 2x -> (3+3+2)/3
      (2L, "a b c"),   // (3+2+1)/3 = 2.0
      (3L, "")         // no tokens -> no row
    ).toDF("doc_id", "text")
    val m = TextOps.commonness(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m.keySet == Set(1L, 2L))
    assert(m(1L) == ((3L, math.rint(8.0 / 3 * 1e6) / 1e6)))
    assert(m(2L) == ((3L, 2.0)))
  }

  test("novelty: fraction of distinct 3-grams with corpus df == 1") {
    val docs = Seq(
      (1L, "w x y z"),      // grams: "w x y","x y z" — both shared with doc 2
      (2L, "w x y z q"),    // adds "y z q" (unique) -> novelty 1/3
      (3L, "r s t u"),      // grams all unique -> novelty 1.0
      (4L, "p q")           // < 3 tokens -> no row
    ).toDF("doc_id", "text")
    val m = TextOps.ngramNovelty(docs, n = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m.keySet == Set(1L, 2L, 3L))
    assert(m(1L) == ((2L, 0L, 0.0)))
    assert(m(2L) == ((3L, 1L, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(m(3L) == ((2L, 2L, 1.0)))
  }
}
