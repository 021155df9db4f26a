package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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
  /** Exact-fold squared distance of the quantized long vector's slice
    * [off, off + s.length) to the integer centroid (cnt, s):
    * acc += dbl(cnt*v[d] - s[d])^2 / dbl(cnt^2), strictly left to
    * right — the bit-identical twin of the aggregate(zip_with) fold
    * it replaces and of DuckDB's list_reduce replay.
    */
  def centroidDist(v: ArrayData, off: Int, cnt: Long, s: Array[Long]): java.lang.Double = {
    val cc = (cnt * cnt).toDouble
    var acc = 0.0
    var d = 0
    while (d < s.length) {
      // a null ELEMENT (quantize maps null->null and only null whole
      // vectors are pre-filtered) must poison the distance exactly
      // like the HOF twin (null * y nulls the aggregate fold) — NOT
      // silently read 0 out of the slot
      if (v.isNullAt(off + d)) return null
      val t = (cnt * v.getLong(off + d) - s(d)).toDouble
      acc += t * t / cc
      d += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Left-to-right dot product; caller guarantees equal lengths and
    * no null elements (the codegen fast path when both inputs are
    * statically `containsNull = false`).
    */
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

  /** General path: null on length mismatch OR any null element — the
    * same poisoning the `aggregate(zip_with(...))` fold exhibits
    * (null * y nulls the sum), so swapping the kernel in never turns
    * a null into garbage.
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Codegen'd dot product over two array<double> columns. Mismatched
  * lengths and null elements yield NULL — the same contract as
  * `aggregate(zip_with(...))`, whose null-padding poisons the sum
  * (relied on by callers that probe for dimension bugs).
  *
  * Declares its input types so the analyzer inserts casts (e.g. the
  * catalog's `array<float>` embeddings) or rejects non-numeric arrays
  * at analysis time, instead of `ArrayData.getDouble` silently reading
  * 8-byte doubles out of 4-byte float slots.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType, containsNull = true),
      ArrayType(DoubleType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (mayHaveNullElems) Vec.dotOrNull(x, y)
    else if (x.numElements() != y.numElements()) null
    else Vec.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (mayHaveNullElems) {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("vecDot")
        s"""
           |java.lang.Double $r = graft.functions.Vec.dotOrNull($a, $b);
           |if ($r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $r.doubleValue();
           |}
         """.stripMargin
      })
    } else {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.Vec.dot($a, $b);
           |}
         """.stripMargin
      })
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Codegen'd integer-centroid squared distance — replaces the
  * `aggregate(zip_with(...))` fold in the k-means / PQ ASSIGNMENT hot
  * path (k x dim interpreted lambda bounces per row; the HOF also
  * splits the whole-stage-codegen span of the scan). The kernel runs
  * the BIT-IDENTICAL left-to-right IEEE sequence the fold ran — one
  * long multiply-subtract, one double square, one division, one add
  * per dimension — so the DuckDB list_reduce oracles are unaffected
  * (pinned in KernelEquivalenceSpec). `offset` addresses a PQ
  * subspace slice directly, eliminating the per-row slice() copy.
  *
  * Null contract — identical to the HOF twin: a null VECTOR yields
  * null via the standard null-safe wrapper; a null ELEMENT poisons
  * the fold to null (zip_with's null-padding semantics), never a
  * silently-wrong distance.
  */
case class CentroidDist(child: Expression, offset: Int, cnt: Long, s: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_dist"

  override protected def nullSafeEval(v: Any): Any =
    Vec.centroidDist(v.asInstanceOf[ArrayData], offset, cnt, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("centSums", s, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("centDist")
      s"""
         |java.lang.Double $r =
         |  graft.functions.Vec.centroidDist($c, $offset, ${cnt}L, $sRef);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDist =
    copy(child = newChild)
}
