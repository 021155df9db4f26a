package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dense-vector kernels for the embedding operators.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * never enters whole-stage codegen — every element bounces through
  * the interpreted lambda evaluator, which dominated the pair-join
  * hot path of the similarity queries. This is the preferred
  * alternative from the build brief: a native codegen'd Catalyst
  * expression.
  *
  * Accumulation is a strict left-to-right double sum — bit-identical
  * to the fold it replaces and to DuckDB's `list_dot_product`, so the
  * oracle comparisons are unaffected.
  */
object Vec {
  /** Left-to-right dot product; caller guarantees equal lengths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Codegen'd dot product over two array<double> columns. Mismatched
  * lengths yield NULL — the same contract as `aggregate(zip_with(...))`,
  * whose null-padding poisons the sum (relied on by callers that
  * probe for dimension bugs).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else Vec.dot(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Vec.dot($a, $b);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}
