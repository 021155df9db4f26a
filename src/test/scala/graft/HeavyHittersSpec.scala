package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  test("reduce path: k counters, decrement-on-miss, exact when <= k distinct") {
    val agg = new HeavyHitters.MisraGriesAgg(3)
    var s = agg.zero
    // a a a b b c  with k=3: all three fit, counts exact
    Seq("a", "a", "a", "b", "b", "c").foreach(x => s = agg.reduce(s, x))
    val m = agg.finish(s)
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(s.processed == 6L)
    // a miss on a full sketch decrements everything and evicts zeros
    s = agg.reduce(s, "d")
    val m2 = agg.finish(s)
    assert(m2 == Map("a" -> 2L, "b" -> 1L), m2.toString)
    assert(s.processed == 7L)
  }

  test("guarantee holds on skewed random data across partitionings and merge trees") {
    val sess = spark
    import sess.implicits._
    // zipf-ish: item i appears ~ N/(i+1) times; n = sum
    val rows = (0 until 40).flatMap(i =>
      Seq.fill(2000 / (i + 1))(s"t$i"))
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val k = 8
    Seq(1, 7, 32).foreach { parts =>
      val df = rows.toDF("term").repartition(parts)
      val out = HeavyHitters.heavyHittersGated(df, "term", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
          r.getBoolean(3)))
      val expected = exact.filter { case (_, c) => c * k > n }.keySet
      assert(out.map(_._1).toSet == expected, s"parts=$parts")
      out.foreach { case (t, c, present, bounds) =>
        assert(c == exact(t))
        assert(present, s"$t missing from sketch at parts=$parts")
        assert(bounds, s"$t estimate outside [exact - n/k, exact] at parts=$parts")
      }
    }
  }

  test("merge subtracts the (k+1)-th largest and preserves the bound") {
    val agg = new HeavyHitters.MisraGriesAgg(2)
    var a = agg.zero
    Seq("x", "x", "x", "y").foreach(v => a = agg.reduce(a, v))
    var b = agg.zero
    Seq("z", "z", "y").foreach(v => b = agg.reduce(b, v))
    val m = agg.merge(a, b)
    assert(m.processed == 7L)
    val est = agg.finish(m)
    // combined exact: x=3, y=2, z=2; k=2 -> subtract 3rd largest (2)
    assert(est.keySet.subsetOf(Set("x", "y", "z")))
    est.foreach { case (t, e) =>
      val exact = Map("x" -> 3L, "y" -> 2L, "z" -> 2L)(t)
      assert(e <= exact && exact - e <= m.processed / 2,
        s"$t est $e outside bound vs exact $exact")
    }
  }
}
