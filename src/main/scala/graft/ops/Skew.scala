package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for aggregations whose per-key STATE is
  * large. Sum/count/min-style aggs don't need this — Spark's partial
  * aggregation already pre-combines hot keys map-side into O(1) state.
  * The problem case is set/list-building aggregation (collect_set,
  * top-k state, sketch state): partial agg still ships one large
  * partial per map task to ONE reducer per key, so a key holding 10%
  * of a 100 TB table serializes through a single task.
  *
  * saltedSetAgg runs the standard two-phase cure: phase 1 groups by
  * (key, salt) — `salt` deterministic from a payload hash, so the hot
  * key's state is built by `salts` independent reducers — and phase 2
  * merges the per-salt partials (flatten + re-distinct), whose input
  * is at most `salts` rows per key regardless of data volume. The
  * result is EXACTLY the unsalted aggregation (sets are
  * order-independent; the final sort_array pins presentation), so the
  * same DuckDB oracle gates both shapes.
  */
object Skew {

  /** Per-key sorted distinct set of `valueCol`, built skew-safely:
    * (key, salt) pre-aggregation, then a salts-bounded merge.
    * Output: (keyCol, sorted array column named `asCol`).
    */
  def saltedSetAgg(df: DataFrame, keyCol: String, valueCol: String,
      asCol: String, salts: Int = 16): DataFrame = {
    require(salts >= 1)
    // deterministic salt from the VALUE (not random — reruns and
    // retries must land each row in the same partial)
    val salt = pmod(xxhash64(col(valueCol)), lit(salts))
    df.groupBy(col(keyCol), salt.as("_salt"))
      .agg(collect_set(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sort_array(array_distinct(flatten(collect_list(col("_partial")))))
        .as(asCol))
  }
}
