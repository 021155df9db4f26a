package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Two-sided Student-t p-value as a native Catalyst expression so the
  * post-aggregation projection stays inside whole-stage codegen (a
  * Scala UDF here would break the codegen span for every dhdt row).
  */
case class TPValue(left: Expression, right: Expression)
    extends BinaryExpression {

  // children are cast to double by the Column wrappers in
  // graft.functions (AbstractDataType is private[sql] in Spark 4,
  // so ExpectsInputTypes is not available to third-party packages)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "t_pvalue"

  override protected def nullSafeEval(t: Any, df: Any): Any =
    StudentT.pvalueTwoSided(t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, df) => s"graft.functions.StudentT.pvalueTwoSided($t, $df)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TPValue =
    copy(left = newLeft, right = newRight)
}

/** Student-t CDF (same codegen rationale as [[TPValue]]). */
case class TCdf(left: Expression, right: Expression)
    extends BinaryExpression {

  // children are cast to double by the Column wrappers in
  // graft.functions (AbstractDataType is private[sql] in Spark 4,
  // so ExpectsInputTypes is not available to third-party packages)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "t_cdf"

  override protected def nullSafeEval(t: Any, df: Any): Any =
    StudentT.cdf(t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, df) => s"graft.functions.StudentT.cdf($t, $df)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TCdf =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization — the canonicalization pass a dedup
  * pipeline runs before hashing (decomposed "e"+U+0301 and
  * precomposed U+00E9 must collide). Spark has no built-in; a native
  * expression keeps it inside whole-stage codegen at scan speed.
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    TextNorm.nfc(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Kernel for [[NfcNormalize]]: the isNormalized fast path returns the
  * input UTF8String untouched for already-NFC text (all-ASCII — the
  * overwhelming majority of a web corpus), so the String round-trip is
  * paid only on rows that actually need recomposition.
  */
object TextNorm {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}
