package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide <-> long layout converters — the Spark re-expression of the
  * reference's `ndarray_to_parquet` wide export and `wide_to_long`
  * (/root/reference/deepicedrain/extraload.py:54-128, 176-200).
  *
  * The engine's canonical layout is LONG (one row per (key, cycle)):
  * natural for groupBy/window and scale-free. Wide is a presentation
  * layout; both converters are single-shuffle plans (pivot = one hash
  * aggregate; unpivot/stack = a generator, no shuffle at all).
  */
object Extraload {

  /** long -> wide: one row per key, per-cycle columns `{value}_{c}`.
    * Cycles must be enumerated up front (they are small and known:
    * <= 9 in the reference) so the pivot does NOT need the extra
    * cycle-discovery job and the output schema is deterministic.
    */
  def longToWide(
      df: DataFrame,
      key: String,
      cycleCol: String,
      valueCols: Seq[String],
      cycles: Seq[Int]): DataFrame = {
    require(valueCols.nonEmpty && cycles.nonEmpty,
      "longToWide needs at least one value column and one cycle")
    val aggs = for (v <- valueCols; c <- cycles)
      yield max(when(col(cycleCol) === c, col(v))).as(s"${v}_$c")
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** wide -> long: per-cycle columns back to (key, cycle, values...)
    * rows, dropping rows where all value columns are null (the
    * reference's dropna at extraload.py:200). Uses stack(), a
    * generator — zero shuffle.
    */
  def wideToLong(
      df: DataFrame,
      key: String,
      cycleCol: String,
      valueCols: Seq[String],
      cycles: Seq[Int]): DataFrame = {
    val tuples = cycles.map { c =>
      (Seq(lit(c)) ++ valueCols.map(v => col(s"${v}_$c"))): Seq[Column]
    }
    val n = cycles.size
    val stackArgs: Seq[Column] = lit(n) +: tuples.flatten
    val names = Seq(cycleCol) ++ valueCols
    val exploded = df.select(col(key),
      stack(stackArgs: _*).as(names))
    exploded.na.drop("all", valueCols)
  }
}
