package graft

import graft.functions.{SketchExpressions, TagExpressions, VectorExpressions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Library entry points: register graft's native expressions for SQL use.
  *
  * Either call [[Graft.register]] on an existing session, or build the
  * session with `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object Graft {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> { es => VectorExpressions.CosineSim(es(0), es(1)) },
    "dot_product" -> { es => VectorExpressions.DotProduct(es(0), es(1)) },
    "tag_lookup" -> { es => graft.functions.TagLookup(es(0), es(1)) },
    "simhash64" -> { es => SketchExpressions.SimHash64(es.head) },
    "minhash_sig" -> { es =>
      es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
          SketchExpressions.MinHashSig(es.head, k)
        case other =>
          throw new IllegalArgumentException(s"minhash_sig k must be an int literal, got $other")
      }
    })

  /** Register all graft SQL functions + optimizer rules on the session.
    * (extraOptimizations attaches to an already-built session; the
    * GraftExtensions class covers spark.sql.extensions-configured builds.)
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.InferTimePredicates)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.InferTimePredicates
    }
    // InferFiltersFromGenerate adds `size(arr) > 0 AND isnotnull(arr)`
    // below every explode; predicate pushdown then substitutes the
    // generator input's FULL defining expression into those filters at the
    // scan. For this library every exploded array is a computed sketch
    // (shingles, signatures, buckets, fingerprints), so the "free" filter
    // re-runs the expensive chain per row — measured 3× the whole
    // tokenize+shingle pipeline per document. The filters never save work
    // here (Generate already skips empty inputs), so exclude the rule.
    val ruleName = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val existing = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .filter(_.nonEmpty)
    if (!existing.exists(_.contains(ruleName)))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        (existing.toSeq :+ ruleName).mkString(","))
  }
}

/** `spark.sql.extensions`-compatible injector.
  *
  * NOTE: the extensions API cannot set SQL confs, so sessions built this
  * way should ALSO set
  * `spark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate`
  * (see [[Graft.register]] for why) — or simply call `Graft.register`
  * on the built session, which is idempotent and sets it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.InferTimePredicates)
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSim].getName, "cosine_sim"),
      (es: Seq[Expression]) => VectorExpressions.CosineSim(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => VectorExpressions.DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("tag_lookup"),
      new ExpressionInfo(classOf[graft.functions.TagLookup].getName, "tag_lookup"),
      (es: Seq[Expression]) => graft.functions.TagLookup(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SketchExpressions.SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SketchExpressions.SimHash64(es.head)))
  }
}
