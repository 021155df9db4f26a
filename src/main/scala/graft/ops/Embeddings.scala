package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, mirroring what a 100 TB training-data pipeline needs:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *     query set against the full corpus; one scan, no shuffle of the
  *     corpus, a partial top-k per partition then a tiny final sort.
  *   - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH — corpus
  *     bucketed once by signature; queries probe only their bucket, so
  *     the candidate set (and the shuffle) shrinks by ~2^bits. The
  *     scale path when the query set is itself large.
  */
object Embeddings {

  /** Exact dot product: codegen'd left-to-right double accumulation
    * (graft.functions.VecDot) — bit-identical to the
    * aggregate/zip_with fold it replaces, but inside whole-stage
    * codegen instead of the interpreted lambda evaluator (~5x on the
    * pair-join hot path). NULL on length mismatch, like the fold.
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Exact cosine top-k of `corpus` rows for each query row.
    * `queries` must be small (it is broadcast); corpus streams.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos",
        cosine(col(vecCol).cast("array<double>"), col(qVecCol).cast("array<double>")))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cos"))
  }

  /** Deterministic random hyperplanes: `bits` planes in `dim`
    * dimensions from a fixed-seed Gaussian — identical on every
    * executor and every run.
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector under the given planes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val d = dot(vec.cast("array<double>"), lit(p))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** (table, bucket) pairs under `tables` independent plane sets —
    * multi-table LSH: a pair is a candidate if it collides in ANY
    * table, recall 1-(1-p^bits)^tables for per-bit agreement p.
    */
  def lshTableBuckets(vec: Column, dim: Int, bits: Int, tables: Int,
      seed: Long = 7L): Column = {
    val all = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(vec, hyperplanes(dim, bits, seed + t)).as("bucket"))
    }
    array(all: _*)
  }

  /** Approximate top-k via multi-table LSH: corpus exploded into
    * (table, bucket) keys once, queries probe their buckets — an equi
    * join on (table, bucket), never a cross join. `tables`×`bits`
    * trades recall against candidate volume: for strongly-clustered
    * corpora few tables suffice; for weakly-correlated vectors raise
    * tables. No broadcast hint on either side: AQE broadcasts a small
    * query set at runtime on its own, and a large one (the case this
    * path exists for) must shuffle-join rather than OOM the driver.
    *
    * `dim` must equal the actual embedding length — on mismatch
    * zip_with would null-pad, dot() would return null, and every
    * vector would hash to bucket 0 in every table, silently
    * degenerating candidate generation to all-pairs. The guard below
    * raises instead.
    */
  def annTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String,
      k: Int, bits: Int = 4, tables: Int = 8,
      seed: Long = 7L, dim: Int = 64): DataFrame = {
    val tb = (v: Column) => lshTableBuckets(v, dim, bits, tables, seed)
    // assert_true yields NULL on pass; keeping it inside a Filter (not
    // a projected-then-dropped column) means pruning can't remove it.
    val dimGuard = (v: Column) => assert_true(size(v) === dim,
      lit(s"embedding length != declared dim=$dim")).isNull
    val c = corpus.filter(dimGuard(col(vecCol)))
      .select(col(idCol), col(vecCol), explode(tb(col(vecCol))).as("tb"))
    val q = queries.filter(dimGuard(col(qVecCol)))
      .select(col(qIdCol), col(qVecCol), explode(tb(col(qVecCol))).as("tb"))
    val cand = c.join(q, "tb")
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(qVecCol), col(idCol), col(vecCol))
      .dropDuplicates(qIdCol, idCol)
    val scored = cand.withColumn("cos",
      cosine(col(vecCol).cast("array<double>"), col(qVecCol).cast("array<double>")))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cos"))
  }
}
