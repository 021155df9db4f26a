package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** KMV sketch contracts: (1) below k distinct values the sketch IS the
  * exact set; (2) above k the estimate lands within the theoretical
  * error band (rel std err ~ 1/sqrt(k-2), asserted at 4 sigma); (3)
  * the estimate is invariant to physical partitioning — k-min of a
  * set does not depend on merge order.
  */
class SketchesSpec extends SparkSpec {

  test("fewer distinct values than k: exact count returned") {
    val sess = spark
    import sess.implicits._
    val df = (0 until 1000).map(i => s"v${i % 37}").toDF("v")
    val r = Sketches.kmvDistinct(df, "v", k = 256).head
    assert(r.getAs[Long]("k_actual") == 37L)
    assert(r.getAs[Long]("est_distinct") == 37L)
    assert(r.getAs[Long]("exact_distinct") == 37L)
  }

  test("null inputs are excluded, not counted") {
    val sess = spark
    import sess.implicits._
    val df = (Seq("a", "b", null, "c") ++ Seq(null)).toDF("v")
    val r = Sketches.kmvDistinct(df, "v", k = 8).head
    assert(r.getAs[Long]("k_actual") == 3L)
    assert(r.getAs[Long]("est_distinct") == 3L)
  }

  test("KmvAgg: reduce/merge over arbitrary splits equals the direct top-k (randomized)") {
    val k = 16
    val agg = new graft.ops.Sketches.KmvAgg(k)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 100) {
      val n = 1 + rnd.nextInt(200)
      // duplicates on purpose: the sketch must count each value once
      val values = Array.fill(n)(rnd.nextLong().abs % 64)
      val truth = values.distinct.sorted.take(k)
      // arbitrary split into 1..6 chunks, each reduced independently,
      // then merged in random order — the result must not depend on
      // the split or the merge order
      val chunks = values.grouped(1 + rnd.nextInt(6)).toArray
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials.toSeq).foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == truth.toSeq,
        s"trial $trial: merged=${merged.toSeq} truth=${truth.toSeq}")
      val s = agg.finish(merged)
      assert(s.k_actual == truth.length)
      if (truth.nonEmpty) assert(s.kth_min_u == truth.last)
    }
  }

  test("estimate within 4 sigma of truth at n >> k; partition-invariant") {
    val sess = spark
    import sess.implicits._
    val n = 20000
    val df = (0 until n).map(i => s"item-$i").toDF("v")
    val k = 256
    val r = Sketches.kmvDistinct(df, "v", k).head
    val est = r.getAs[Long]("est_distinct")
    val sigma = n / math.sqrt(k - 2)
    assert(math.abs(est - n) < 4 * sigma, s"est=$est n=$n sigma=$sigma")
    val r1 = Sketches.kmvDistinct(df.repartition(13), "v", k).head
    assert(r1.getAs[Long]("est_distinct") == est)
    assert(r1.getAs[Long]("kth_min_u") == r.getAs[Long]("kth_min_u"))
  }
}
