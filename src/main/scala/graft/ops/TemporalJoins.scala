package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, in shuffle-minimal
  * formulations: the backward as-of join (point-in-time lookup) and
  * the interval/range join (facts vs [start, end) windows).
  *
  * Both refuse the naive shapes Spark would otherwise plan — a range
  * predicate alone becomes a broadcast nested-loop join; a per-key
  * subquery becomes a driver loop — and express the semantics as ONE
  * hash shuffle plus narrow work, the only shapes that survive 100 TB.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the single most
    * recent right row with the same key and `right.time <= left.time`
    * (ties match). Unmatched left rows keep null matched columns —
    * i.e. the LEFT ASOF JOIN of DuckDB/Pandas `merge_asof` semantics.
    *
    * Formulation: tag both sides, union, and run ONE window over
    * (key) ordered by (time, side) where `last(..., ignoreNulls)`
    * carries the latest right payload forward into each left row.
    * Cost is a single hash shuffle on the key plus an in-partition
    * sort — no range join (Spark plans those as O(n·m) broadcast
    * nested loops), no per-key collect. Skewed keys split like any
    * other window partition under AQE.
    *
    * Precondition: right rows are unique per (key, time); duplicate
    * right timestamps make "the" match ambiguous (DuckDB's ASOF JOIN
    * carries the same caveat).
    *
    * Reference analogue: pandas-style temporal alignment of cycle
    * tables (deepicedrain atl11_play.py uses index-aligned joins);
    * re-expressed as a scalable dataflow rather than indexed lookup.
    *
    * @param rightCols right payload columns carried onto left rows,
    *                  emitted as `prefix + name`; the matched right
    *                  time is emitted as `prefix + time`.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      time: String, rightCols: Seq[String], prefix: String = "matched_")
      : DataFrame = {
    require(!rightCols.contains(time), "rightCols must not repeat the time column")
    val leftPayload = left.columns.filterNot(c => c == key || c == time).toSeq
    val matchedNames = (rightCols :+ time).map(prefix + _)
    require(matchedNames.intersect(left.columns.toSeq).isEmpty,
      s"matched output columns ${matchedNames.mkString(", ")} collide with " +
        "left columns — pass a different prefix")
    // the internal tag/struct/match columns are reserved: an input
    // column with the same name would be silently shadowed mid-plan
    val reserved = Seq("__side", "__r", "__m")
    val clash = (left.columns ++ right.columns).toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with asofBackward's " +
        "reserved internal names (__side, __r, __m) — rename them first")
    // The matched right row travels as ONE nullable struct (time +
    // payload): null marks "no right row here" (left rows), while a
    // right row whose PAYLOAD VALUE is null still carries a non-null
    // struct — so last(ignoreNulls) picks the latest right ROW
    // atomically and a null payload in it stays null, instead of
    // being silently backfilled from an older row (which per-column
    // last(ignoreNulls) would do).
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(time, right.schema(time).dataType) +:
        rightCols.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // Right rows sort BEFORE left rows at an equal timestamp (side 0
    // vs 1) so a tie is visible to the left row's frame. A null right
    // TIME is never a match (ASOF semantics — DuckDB/pandas agree):
    // unfiltered it would sort nulls-first and its non-null struct
    // would "match" every left row before the first real right row.
    // A null right KEY is likewise never a match (an equi-condition
    // never matches NULL) — but Window.partitionBy groups null keys
    // into one partition, so unfiltered null-key right rows would
    // match null-key left rows; left null-key rows keep LEFT-join
    // all-null matched columns.
    val taggedRight = right
      .filter(col(time).isNotNull && col(key).isNotNull)
      .select(
      Seq(col(key), col(time), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(time) +: rightCols.map(col): _*).as("__r"): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(time), lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select(Seq(col(key), col(time), col("__side")) ++
        leftPayload.map(col) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__m"): _*)
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++ leftPayload.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(s"$prefix$c")) :+
        col("__m").getField(time).as(s"$prefix$time"): _*)
  }

  /** Interval (range) join: fact rows joined to every interval with
    * `start <= factTime < end` on the same LongType axis.
    *
    * Formulation: discretize the axis into buckets of `bucketWidth`
    * (choose >= the longest interval), fan each interval out to the
    * few buckets it covers, map each fact row to its ONE bucket, and
    * equi-join on the bucket key with the exact range predicate
    * re-applied. Catalyst then picks hash vs broadcast like any
    * equi-join, instead of the broadcast nested-loop a bare BETWEEN
    * predicate forces. Facts are never duplicated (one bucket each);
    * overlapping intervals are still found because every interval
    * covering the fact also covers the fact's bucket (guaranteed by
    * bucketWidth >= interval length... intervals spanning k buckets
    * emit k rows, k <= ceil(len/width)+1).
    */
  def intervalJoin(facts: DataFrame, intervals: DataFrame,
      factTime: String, start: String, end: String, bucketWidth: Long)
      : DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // the joined output carries BOTH sides' columns unqualified, so a
    // shared name would come out ambiguous; and the bucket keys are
    // reserved internal names
    val shared = facts.columns.toSeq.intersect(intervals.columns.toSeq)
    require(shared.isEmpty,
      s"facts and intervals share columns ${shared.mkString(", ")} — " +
        "the join output would be ambiguous; project/rename them first")
    val reserved = Seq("__fbucket", "__ibucket")
    val clash = (facts.columns ++ intervals.columns).toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with intervalJoin's " +
        "reserved bucket names — rename them first")
    // bucket index via the `div` integral division (truncating, same
    // as the previous expr-string formulation) built with Column
    // arithmetic, so odd column names (spaces, dots) don't need
    // backtick quoting and can't break parsing
    def bucketOf(c: org.apache.spark.sql.Column) =
      call_function("div", c, lit(bucketWidth))
    // drop empty/inverted intervals BEFORE the fan-out: end <= start
    // can match nothing, but sequence() would otherwise count DOWN
    // from start's bucket — one corrupt row exploding ~1e13 bucket
    // rows is an executor OOM, not a no-op
    val iv = intervals.filter(col(end) > col(start)).withColumn("__ibucket",
      explode(sequence(
        bucketOf(col(start)),
        bucketOf(col(end) - 1))))
    val f = facts.withColumn("__fbucket", bucketOf(col(factTime)))
    f.join(iv, col("__fbucket") === col("__ibucket") &&
        col(factTime) >= col(start) && col(factTime) < col(end))
      .drop("__fbucket", "__ibucket")
  }
}
