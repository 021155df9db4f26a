package graft

import org.apache.spark.sql.functions._

import graft.ops.TDigest

class TDigestSpec extends SparkSpec {

  test("compress respects the k1 capacity rule and conserves weight") {
    val n = 10000
    val means = Array.tabulate(n)(i => (i * 37 % n).toDouble)
    val weights = Array.fill(n)(1.0)
    val (cm, cw) = TDigest.compress(means, weights, delta = 100.0)
    assert(cm.length < 200, s"${cm.length} centroids at delta=100")
    assert(math.abs(cw.sum - n) < 1e-9)
    assert(cm.sameElements(cm.sorted), "centroid means must stay sorted")
  }

  test("quantile estimates on uniform data stay within rank 0.01 at delta=200") {
    val n = 50000
    // deterministic pseudo-shuffled uniform values
    val xs = Array.tabulate(n)(i => ((i.toLong * 2654435761L) % n).toDouble)
    var st = (Array.emptyDoubleArray, Array.emptyDoubleArray)
    xs.grouped(1000).foreach { chunk =>
      st = TDigest.compress(st._1 ++ chunk,
        st._2 ++ Array.fill(chunk.length)(1.0), 200.0)
    }
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = TDigest.quantile(st._1, st._2, q)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.01, s"q=$q est=$est rank=$rank")
    }
  }

  test("merge order does not break the rank guarantee") {
    val n = 20000
    val xs = Array.tabulate(n)(i => math.pow((i * 7919 % n).toDouble / n, 3))
    val halves = xs.grouped(n / 4).toSeq
    // digest each quarter independently, merge pairwise in a skewed order
    val ds = halves.map { h =>
      TDigest.compress(h, Array.fill(h.length)(1.0), 200.0)
    }
    val merged = ds.reduce { (a, b) =>
      TDigest.compress(a._1 ++ b._1, a._2 ++ b._2, 200.0)
    }
    val sorted = xs.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val est = TDigest.quantile(merged._1, merged._2, q)
      val lo = sorted.count(_ < est).toDouble / n
      val hi = sorted.count(_ <= est).toDouble / n
      assert(lo <= q + 0.015 && hi >= q - 0.015,
        s"q=$q est=$est rank=[$lo,$hi]")
    }
  }

  test("groupedQuantileBounds gates every group true on sf0.001 lineitem") {
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
    val out = TDigest.groupedQuantileBounds(df, Seq("l_returnflag"),
      "l_extendedprice", Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"rank gate failed for ${r.getString(0)}: $r")
    }
  }

  test("duplicate-heavy data: the rank INTERVAL gate is still satisfiable") {
    val sess = spark
    import sess.implicits._
    // 90% of mass on one value — the estimate for p50 must land on it
    // and the [lo, hi] interval logic must accept the duplicate jump
    val df = ((1 to 9000).map(_ => 42.0) ++ (1 to 1000).map(_.toDouble))
      .toDF("v").withColumn("g", lit("a"))
    val out = TDigest.groupedQuantileBounds(df, Seq("g"), "v",
      Seq("p50" -> 0.5)).collect()
    assert(out.length == 1 && out(0).getBoolean(2), s"got ${out.toSeq}")
  }
}
