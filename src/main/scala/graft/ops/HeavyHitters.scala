package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters — the mergeable frequency summary of the
  * sketch family (next to KMV for distinct counts and the t-digest for
  * quantiles): k counters track candidate frequent items over a stream
  * of any length with the classic deterministic guarantee
  *
  *   count(x) - n/k  <=  est(x)  <=  count(x)
  *
  * so every item with true frequency above n/k is GUARANTEED present
  * in the sketch. Merging follows Agarwal et al., "Mergeable summaries"
  * (PODS'12): add counters pairwise, then subtract the (k+1)-th
  * largest counter from all and drop the non-positive — the n/k error
  * bound is preserved under arbitrary merge trees, which is exactly
  * what a 1000-executor partial aggregation does to the state.
  *
  * Approximation is HONEST the same way the t-digest's is
  * ([[TDigest.groupedQuantileBounds]]): the public query gate
  * ([[heavyHittersGated]]) re-joins the sketch against the exact
  * counts and emits, for every TRUE heavy hitter, booleans proving the
  * guarantee held (present in the sketch; estimate within
  * [exact - n/k, exact]) — the oracle pins the bound as hard pass/fail
  * on a deterministic output, while the raw (partitioning-dependent)
  * estimates stay out of the hash.
  *
  * Scale shape: the sketch is ONE map-side-combined aggregate over the
  * token stream (O(k) state per partial); the exact-count verify is
  * test-scale machinery — production reads just the sketch.
  */
object HeavyHitters {

  /** Sketch state: parallel (term, count) arrays with a fill pointer
    * (insertion buffers with spare capacity, the [[TDigest.TDState]]
    * discipline — only the first `n` slots are live; reduce mutates in
    * place, never copies the arrays per row) plus the exact number of
    * items processed (drives the n/k bound).
    */
  final case class MGState(terms: Array[String], counts: Array[Long],
      n: Int, processed: Long)

  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, MGState, Map[String, Long]] {
    require(k >= 1, s"k >= 1 required, got $k")

    override def zero: MGState =
      MGState(new Array[String](k), new Array[Long](k), 0, 0L)

    override def reduce(s: MGState, x: String): MGState = {
      var i = 0
      var found = -1
      while (i < s.n && found < 0) {
        if (s.terms(i) == x) found = i
        i += 1
      }
      if (found >= 0) {
        s.counts(found) += 1
      } else if (s.n < k) {
        s.terms(s.n) = x
        s.counts(s.n) = 1
        return s.copy(n = s.n + 1, processed = s.processed + 1)
      } else {
        // full and unseen: decrement every counter, compact zeros —
        // the textbook O(k) miss step (k is a small constant)
        var w = 0
        var r = 0
        while (r < s.n) {
          if (s.counts(r) > 1) {
            s.terms(w) = s.terms(r)
            s.counts(w) = s.counts(r) - 1
            w += 1
          }
          r += 1
        }
        java.util.Arrays.fill(
          s.terms.asInstanceOf[Array[AnyRef]], w, s.n, null)
        return s.copy(n = w, processed = s.processed + 1)
      }
      s.copy(processed = s.processed + 1)
    }

    override def merge(a: MGState, b: MGState): MGState = {
      val m = scala.collection.mutable.HashMap[String, Long]()
      var i = 0
      while (i < a.n) { m(a.terms(i)) = m.getOrElse(a.terms(i), 0L) + a.counts(i); i += 1 }
      i = 0
      while (i < b.n) { m(b.terms(i)) = m.getOrElse(b.terms(i), 0L) + b.counts(i); i += 1 }
      val entries = m.toArray
      val keep =
        if (entries.length <= k) entries
        else {
          // subtract the (k+1)-th largest counter from all, keep the
          // positive remainder (at most k entries by construction)
          val sortedCounts = entries.map(_._2).sorted(Ordering[Long].reverse)
          val sub = sortedCounts(k)
          entries.collect { case (t, c) if c > sub => (t, c - sub) }
        }
      MGState(keep.map(_._1), keep.map(_._2), keep.length,
        a.processed + b.processed)
    }

    override def finish(s: MGState): Map[String, Long] =
      (0 until s.n).map(i => s.terms(i) -> s.counts(i)).toMap

    override def bufferEncoder: org.apache.spark.sql.Encoder[MGState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MGState]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: the candidate map (term -> estimate) for `value`. */
  def misra_gries(value: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k)).apply(value)

  /** Hard-gated heavy hitters over a string column: for every TRUE
    * heavy hitter (exact count * k > n — the strict n/k threshold),
    * emit the exact count plus booleans proving the Misra-Gries
    * guarantee held: `ok_present` (the sketch kept a counter for it)
    * and `ok_bounds` (estimate in [exact - n/k, exact], checked in
    * exact integer cross-multiplication). The emitted SET and every
    * emitted value are partitioning-independent, so the output is
    * oracle-hashable even though the sketch's internal estimates are
    * not.
    *
    * Output: (term, n_exact, ok_present, ok_bounds).
    */
  def heavyHittersGated(df: DataFrame, valueCol: String, k: Int)
      : DataFrame = {
    // ONE corpus-wide aggregate: the 1-row (sketch map, total) pair is
    // broadcast whole and probed per exact group via element_at, so the
    // Misra-Gries pass is planned (and executed) exactly once — two
    // broadcast subtrees over the same uncached agg are not guaranteed
    // to reuse the exchange (round-12 advice).
    val sketch = df.agg(misra_gries(col(valueCol), k).as("_mg"),
      count(col(valueCol)).as("_n"))
    val exact = df.groupBy(col(valueCol).as("term"))
      .agg(count(lit(1)).as("n_exact"))
    // the heavy-hitter SET comes from the exact side (deterministic);
    // a sketch that broke the guarantee shows up as ok_* = false, it
    // can never shrink the emitted set
    exact
      .crossJoin(broadcast(sketch))
      .withColumn("_est", element_at(col("_mg"), col("term")))
      .filter(col("n_exact") * k > col("_n"))
      .select(col("term"), col("n_exact"),
        col("_est").isNotNull.as("ok_present"),
        (col("_est").isNotNull &&
          col("_est") <= col("n_exact") &&
          (col("n_exact") - col("_est")) * k <= col("_n"))
          .as("ok_bounds"))
  }
}
