package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native first-match tag lookup (reference `src/shard.re:116-120`,
  * `List.assoc_opt` semantics).
  *
  * The composable formulation `get(filter(tag, ...), 0).value` routes
  * through interpreted higher-order functions and breaks the enclosing
  * whole-stage-codegen span — measurable on the reference's hottest path
  * (every xargs tag filter). This expression generates a primitive loop
  * over the ARRAY<STRUCT<name,value>> and stays fused in the stage.
  *
  * Null semantics match the composed form exactly: null array → null,
  * no match → null, matched-but-null value → null (so filters drop
  * untagged points, reference `shard.re:123-124`).
  */
case class TagLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "tag_lookup"

  override def nullSafeEval(tagArr: Any, nameAny: Any): Any = {
    val arr = tagArr.asInstanceOf[ArrayData]
    val name = nameAny.asInstanceOf[UTF8String]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val entry = arr.getStruct(i, 2)
        if (!entry.isNullAt(0) && entry.getUTF8String(0).equals(name)) {
          return if (entry.isNullAt(1)) null else entry.getUTF8String(1)
        }
      }
      i += 1
    }
    null
  }

  // first match can be null-valued → the expression is nullable even for
  // non-null inputs; emit custom codegen with its own null tracking
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val entry = ctx.freshName("entry")
    val body =
      s"""
         |boolean ${ev.isNull} = true;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  int $n = ${leftGen.value}.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!${leftGen.value}.isNullAt($i)) {
         |      org.apache.spark.sql.catalyst.InternalRow $entry = ${leftGen.value}.getStruct($i, 2);
         |      if (!$entry.isNullAt(0) && $entry.getUTF8String(0).equals(${rightGen.value})) {
         |        if (!$entry.isNullAt(1)) {
         |          ${ev.isNull} = false;
         |          ${ev.value} = $entry.getUTF8String(1);
         |        }
         |        break;
         |      }
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(code = leftGen.code + rightGen.code + code"$body")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TagExpressions {
  def tag_lookup(tag: Column, name: Column): Column =
    ColumnBridge.column(TagLookup(ColumnBridge.expression(tag), ColumnBridge.expression(name)))
}
