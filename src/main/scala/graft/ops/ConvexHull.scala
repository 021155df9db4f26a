package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Hull vertex (schema: x, y). */
case class Pt(x: Double, y: Double)

/** Convex hull as a typed Aggregator — the reference's
  * MultiPoint(...).convex_hull lake-boundary step
  * (/root/reference/atlxi_lake.py:242-245) as a first-class grouped
  * aggregate: partial buffers are PRUNED to their own hull whenever
  * they exceed `PruneAt` (hull(A ∪ B) = hull(hull(A) ∪ B)), so
  * executor memory is bounded by hull size, not group size, and the
  * partial/final merge tree stays cheap at any scale.
  */
object ConvexHull {

  private val PruneAt = 512

  /** Monotone-chain convex hull; vertices in counter-clockwise order
    * starting from the lexicographically smallest point, collinear
    * points dropped. For < 3 distinct points returns them sorted.
    */
  def hull(pts: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val sorted = pts.distinct.sorted
    if (sorted.length <= 2) return sorted
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Double, Double)]): List[(Double, Double)] = {
      var acc = List.empty[(Double, Double)]
      for (p <- ps) {
        while (acc.lengthCompare(2) >= 0 && cross(acc.tail.head, acc.head, p) <= 0)
          acc = acc.tail
        acc = p :: acc
      }
      acc.reverse
    }
    val lower = half(sorted)
    val upper = half(sorted.reverse)
    lower.init ++ upper.init
  }

  class HullAgg extends Aggregator[(Double, Double), Seq[Pt], Seq[Pt]] {
    override def zero: Seq[Pt] = Nil
    private def prune(b: Seq[Pt]): Seq[Pt] =
      if (b.length > PruneAt) hull(b.map(p => (p.x, p.y))).map(t => Pt(t._1, t._2)) else b
    override def reduce(b: Seq[Pt], p: (Double, Double)): Seq[Pt] =
      prune(Pt(p._1, p._2) +: b)
    override def merge(a: Seq[Pt], b: Seq[Pt]): Seq[Pt] = prune(a ++ b)
    override def finish(b: Seq[Pt]): Seq[Pt] =
      hull(b.map(p => (p.x, p.y))).map(t => Pt(t._1, t._2))
    override def bufferEncoder: Encoder[Seq[Pt]] = ExpressionEncoder[Seq[Pt]]()
    override def outputEncoder: Encoder[Seq[Pt]] = ExpressionEncoder[Seq[Pt]]()
  }

  /** Column function: convex_hull(x, y) -> array<struct<x,y>>. */
  val convex_hull = udaf(new HullAgg)
}
