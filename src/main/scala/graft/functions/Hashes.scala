package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Signature kernels for the near-dup operators.
  *
  * Both replace interpreted higher-order-function formulations whose
  * cost was quadratic in disguise: the HOF minhash re-hashed every
  * shingle STRING once per permutation (32x) and the HOF simhash
  * re-hashed every token once per bit (64x), all through the lambda
  * interpreter. Here each string is hashed exactly once with the same
  * xxhash64 primitives Spark's built-in uses, then the cheap integer
  * mixing runs in a compiled loop.
  *
  * Hash-family equivalence with the HOF versions they replace (so
  * existing signatures/candidates are bit-identical):
  *   - minhash perm j of shingle s:  `xxhash64(s, j)` =
  *     XXH64.hashInt(j, XXH64.hashUTF8String(s, 42L))
  *   - simhash token hash: `xxhash64(t)` = XXH64.hashUTF8String(t, 42L)
  */
object Hashes {

  /** sig[j] = min over shingles of xxhash64(shingle, j), j < numPerms.
    * Null elements are skipped (treated as absent from the set).
    */
  def minhashSig(shingles: ArrayData, numPerms: Int): ArrayData = {
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) { i += 1 }
      else {
      val base = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
      var j = 0
      while (j < numPerms) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** 64-bit simhash: per bit, sign of the sum of ±1 votes from each
    * token's xxhash64 bit (empty input → all bits set, like the fold).
    */
  def simhash64(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) { i += 1 }
      else {
      val h = XXH64.hashUTF8String(toks.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Word n-gram shingles: out[i] = toks[i] + " " + ... + toks[i+n-1];
    * empty when the document has fewer than n tokens. Null tokens are
    * skipped entirely (concat_ws semantics). One pass, each
    * token touched n times — versus the HOF
    * `transform(sequence(...), i => concat_ws(element_at(toks, i+o)))`
    * formulation it replaces, whose interpreted lambda re-evaluated
    * the full tokenization tree for EVERY element_at of EVERY shingle
    * (measured ~1.8 ms/doc on 54-token docs — 100x this kernel).
    */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements() - n + 1
    if (total <= 0) return new GenericArrayData(new Array[Any](0))
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[Any](total)
    var i = 0
    while (i < total) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) {
        // concatWs skips null inputs natively — pass null through so a
        // null token yields "a b", not the "a  b" an empty string would
        parts(j) =
          if (toks.isNullAt(i + j)) null
          else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact set-Jaccard |A∩B| / |A∪B| over two string arrays in ONE
    * hash-set pass — same value as
    * `size(array_intersect(a,b)) / size(array_union(a,b))` (both
    * dedupe), without materializing either result array. 0.0 when the
    * union is empty.
    */
  def jaccardSim(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) { if (!a.isNullAt(i)) setA.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0
    var onlyB = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (!b.isNullAt(i)) {
        val s = b.getUTF8String(i)
        if (seenB.add(s)) {
          if (setA.contains(s)) inter += 1 else onlyB += 1
        }
      }
      i += 1
    }
    val union = setA.size() + onlyB
    if (union > 0) inter.toDouble / union else 0.0
  }
}

/** Codegen'd MinHash signature over an array<string> shingle set.
  * Declared input type so the analyzer casts or rejects non-string
  * arrays instead of `getUTF8String` reading garbage.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(arr: Any): Any =
    Hashes.minhashSig(arr.asInstanceOf[ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashes.minhashSig($c, $numPerms)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Codegen'd 64-bit SimHash over an array<string> token list. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(arr: Any): Any =
    Hashes.simhash64(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashes.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Codegen'd word n-gram shingles over an array<string> token list. */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(arr: Any): Any =
    Hashes.shingles(arr.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashes.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Shingles =
    copy(child = c)
}

/** Codegen'd exact set-Jaccard over two array<string> columns.
  * NULL when either ARRAY is null (BinaryExpression contract; the
  * `Text.jaccard` wrapper coalesces to 0.0 to preserve the original
  * declarative contract); null ELEMENTS are skipped (sets ignore them).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true),
      ArrayType(StringType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hashes.jaccardSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashes.jaccardSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}
