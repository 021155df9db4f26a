package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram-overlap gate every
  * training-data pipeline runs before training: flag corpus documents
  * sharing any length-n token shingle with a held-out benchmark/eval
  * set (the GPT-3/PaLM-style 13-gram check, parameterized n).
  *
  * Scale shape: the benchmark side is TINY by nature (an eval set vs a
  * 100 TB corpus), so its distinct shingles are broadcast and the
  * corpus is NEVER shuffled — explode corpus shingles, broadcast-hash
  * join, map-side partial count. Cost is one scan of the corpus at
  * shingle fan-out, zero wide exchanges of corpus data.
  */
object Contamination {

  /** Corpus docs that share >= 1 distinct n-gram shingle with any
    * benchmark doc: (idCol, n_hit_shingles). Docs with no overlap are
    * absent (the pipeline drops or audits only the flagged tail).
    */
  def contaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchShingles = bench
      .select(explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .distinct()
    corpus
      .select(col(idCol),
        explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .join(broadcast(benchShingles), "sh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).cast("int").as("n_hit_shingles"))
  }

  /** Typed OR-merge bitset aggregator: input is a bit position, state
    * is the `long[]` bitset. Associative/commutative/duplicate-
    * tolerant, so the filter build is one map-side-combined
    * aggregation no matter how the eval set is partitioned.
    */
  final class BitsetAgg(numBits: Int) extends
      org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    private val words = graft.functions.BloomKernel.wordsFor(numBits)
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >>> 6).toInt) |= 1L << (pos & 63); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The xxhash64 pair every Bloom site derives positions from:
    * h1 = xxhash64(sh), h2 = xxhash64(sh, 1). Probe i's bit is
    * `(h1 + i*h2) & (numBits-1)` — build AND probe sides both run
    * [[graft.functions.BloomKernel]]'s wrapping long arithmetic
    * (via the BloomProbes / BloomContains codegen expressions), so an
    * inserted shingle can never probe unset bits.
    */
  private def hashPair(sh: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    (xxhash64(sh), xxhash64(sh, lit(1L)))

  /** Build the eval set's shingle Bloom filter as one distributed
    * aggregation (map-side-combined OR of per-partition bitsets); the
    * single collected row is `numBits/8` bytes — 128 KiB at the 2^20
    * default — independent of eval-set size.
    */
  private[graft] def buildBloom(bench: DataFrame, textCol: String, n: Int,
      numBits: Int, k: Int): Array[Long] = {
    val (h1, h2) = hashPair(col("sh"))
    val positions = bench
      .select(explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .distinct()
      // probe positions via the kernel's own wrapping arithmetic —
      // a SQL h1 + i*h2 would throw under ANSI on benign overflow
      .select(explode(graft.functions.bloom_probes(h1, h2, k, numBits))
        .as("pos"))
    val agg = new BitsetAgg(numBits)
    val rows = positions.select(udaf(agg).apply(col("pos"))).collect()
    if (rows.isEmpty || rows(0).isNullAt(0)) agg.zero
    else rows(0).getAs[scala.collection.Seq[Long]](0).toArray
  }

  /** [[contaminated]] with a Bloom prefilter on the corpus scan — the
    * 100-TB shape: the eval set's distinct shingles become a fixed
    * 128 KiB bitset probed by a codegen expression INSIDE the corpus
    * scan's whole-stage-codegen span, so virtually every clean shingle
    * dies before the broadcast join materializes a probe row. The
    * exact broadcast join still runs behind the filter (Bloom false
    * positives only enlarge the verify set, never the answer), so the
    * result is bit-identical to [[contaminated]] — same oracle.
    * Selectivity is observable: `graft.bloom` reports shingles scanned
    * vs shingles surviving the prefilter.
    */
  def contaminatedBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bits = buildBloom(bench, textCol, n, numBits, k)
    val benchShingles = bench
      .select(explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .distinct()
    val (h1, h2) = hashPair(col("sh"))
    corpus
      .select(col(idCol),
        explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .observe("graft.bloom",
        count(lit(1L)).as("shingles_scanned"),
        sum(when(graft.functions.bloom_contains(h1, h2, bits, k), 1L)
          .otherwise(0L)).as("shingles_past_bloom"))
      .filter(graft.functions.bloom_contains(h1, h2, bits, k))
      .join(broadcast(benchShingles), "sh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).cast("int").as("n_hit_shingles"))
  }
}
