package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter membership kernel shared by the codegen expression
  * and the bitset builder. The filter is a plain `long[]` bitset with
  * Kirsch-Mitzenmacher double hashing: probe i tests bit
  * `(h1 + i*h2) & (mBits-1)` (mBits a power of two), with h1/h2 both
  * produced by Spark's built-in `xxhash64` — the SQL side that SETS
  * the bits computes the identical long arithmetic with `transform(
  * sequence(...))`, so membership is exactly replayable and a set
  * element can never probe to an unset bit (no false negatives by
  * construction).
  */
object BloomKernel {

  /** All-k-bits-set membership probe. `bits.length` must be a power
    * of two (enforced at build time by [[wordsFor]]).
    */
  def mightContain(bits: Array[Long], h1: Long, h2: Long, k: Int): Boolean = {
    val mask = (bits.length.toLong << 6) - 1
    var i = 0
    while (i < k) {
      val pos = (h1 + i.toLong * h2) & mask
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitset word count for `numBits`; requires a positive power of
    * two so the probe can mask instead of mod.
    */
  def wordsFor(numBits: Int): Int = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    numBits >>> 6
  }

  /** The k probe positions for (h1, h2) — the BUILD side of the
    * filter. Shares the exact wrapping long arithmetic with
    * [[mightContain]]; a SQL-side `h1 + i*h2` would throw under ANSI
    * mode on the (routine, harmless) two's-complement overflow.
    */
  def probes(h1: Long, h2: Long, k: Int, numBits: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val mask = numBits.toLong - 1
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = (h1 + i.toLong * h2) & mask; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Codegen probe-position generator (build-side twin of
  * [[BloomContains]]): array of the k bit positions for the xxhash64
  * pair, in the kernel's own wrapping arithmetic.
  */
case class BloomProbes(left: Expression, right: Expression,
    k: Int, numBits: Int) extends BinaryExpression {
  require(k >= 1 && k <= 16, s"k in [1,16] required, got $k")
  graft.functions.BloomKernel.wordsFor(numBits) // validate power of two

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "bloom_probes"

  override protected def nullSafeEval(h1: Any, h2: Any): Any =
    BloomKernel.probes(h1.asInstanceOf[Long], h2.asInstanceOf[Long], k, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h1, h2) =>
      s"graft.functions.BloomKernel.probes($h1, $h2, $k, $numBits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbes =
    copy(left = newLeft, right = newRight)
}

/** Codegen Bloom membership test over precomputed xxhash64 pair
  * columns. The bitset rides the expression as a reference object
  * (same pattern as [[CentroidDist]]'s centroid table), so the probe
  * stays inside whole-stage codegen at scan speed — the shape that
  * lets a 100-TB corpus scan discard non-matching shingles before any
  * join machinery sees them.
  */
case class BloomContains(left: Expression, right: Expression,
    bits: Array[Long], k: Int) extends BinaryExpression {
  require(k >= 1 && k <= 16, s"k in [1,16] required, got $k")
  // the probe masks with (bits.length*64 - 1); a non-power-of-two
  // bitset would probe wrong positions and return silent false
  // negatives — reject hand-built bitsets here, not just in the
  // builder (round-11 advice). Validate the WORD count directly:
  // reconstructing numBits via an Int shift overflows at 2^25 words
  // (256 MB) and would spuriously reject valid large filters
  // (round-12 advice).
  require(bits.length >= 1 && (bits.length & (bits.length - 1)) == 0,
    s"bitset word count must be a power of two, got ${bits.length}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(h1: Any, h2: Any): Any =
    BloomKernel.mightContain(bits, h1.asInstanceOf[Long], h2.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, (h1, h2) =>
      s"graft.functions.BloomKernel.mightContain($bitsRef, $h1, $h2, $k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
