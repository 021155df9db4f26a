package graft

import org.apache.spark.sql.Row

/** Structure assertions for the composed lake-finder pipeline, run
  * through the declared query on sf0.001.
  */
class LakeFinderSpec extends SparkSpec {

  test("lake finder: 3 draining + 2 filling lakes, ring stats populated") {
    val rows: Array[Row] =
      SparkEntry.queries("lake_finder_pipeline")(spark, sf001).collect()
    assert(rows.length == 5, s"expected 5 lakes, got ${rows.length}")
    val bySign = rows.groupBy(_.getAs[Int]("sign"))
    assert(bySign(-1).length == 3, "3 draining lakes")
    assert(bySign(1).length == 2, "2 filling lakes")
    // draining labels are negative, filling positive
    assert(rows.forall(r =>
      math.signum(r.getAs[Long]("lake_label").toDouble) == r.getAs[Int]("sign")))
    // every lake has background ring points and a populated outer median
    assert(rows.forall(_.getAs[Long]("n_ring") > 0), "donut ring must catch background")
    assert(rows.forall(!_.isNullAt(rows.head.fieldIndex("outer_med"))))
    // inner medians match flow direction
    assert(rows.forall(r => r.getAs[Double]("inner_med") * r.getAs[Int]("sign") > 0))
    // refgtracks is a sorted |-joined set
    assert(rows.forall(_.getAs[String]("refgtracks").contains("|")))
    // the inner vs outer contrast is strong on this construction
    assert(rows.forall(_.getAs[Boolean]("is_active")))
  }
}
