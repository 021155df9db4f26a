package graft

import org.apache.spark.sql.functions._

import graft.ops.WeightedSample

class WeightedSampleSpec extends SparkSpec {

  test("ppsSystematic: exactly k rows per group when weights are small, and inclusion tracks weight") {
    val sess = spark
    import sess.implicits._
    // group a: uniform weights; group b: one heavy unit among light
    val rows =
      (1 to 100).map(i => ("a", i.toLong, 10L)) ++
        (1 to 100).map(i => ("b", i.toLong, if (i == 50) 200L else 5L))
    val df = rows.toDF("g", "id", "w")
    val out = WeightedSample.ppsSystematic(df, Seq("g"), "id", "w", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val byG = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // a: 100 units x 10 weight, 10 thresholds -> every 10th id
    assert(byG("a") == List(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L),
      s"got ${byG("a")}")
    // b: heavy unit 50 holds ~29% of mass -> picked once (never
    // duplicated), so b emits < 10 rows and 50 is among them
    assert(byG("b").contains(50L) && byG("b").size < 10, s"got ${byG("b")}")
  }

  test("ppsSystematic is deterministic across partitionings") {
    val sess = spark
    import sess.implicits._
    val df = (1 to 1000).map(i => ("s" + (i % 3), i.toLong, (i % 17 + 1).toLong))
      .toDF("g", "id", "w")
    val a = WeightedSample.ppsSystematic(df.repartition(1), Seq("g"),
      "id", "w", 7).collect().map(_.toSeq).toSet
    val b = WeightedSample.ppsSystematic(df.repartition(13), Seq("g"),
      "id", "w", 7).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("esTopK favors heavy weights and is deterministic") {
    val sess = spark
    import sess.implicits._
    // 900 light docs (w=1) + 100 heavy (w=1000): the top-50 should be
    // overwhelmingly heavy
    val df = ((1 to 900).map(i => (i.toLong, 1L)) ++
      (1001 to 1100).map(i => (i.toLong, 1000L))).toDF("id", "w")
    val out = WeightedSample.esTopK(df, "id", "w", 50)
      .collect().map(_.getLong(0))
    assert(out.length == 50)
    val heavy = out.count(_ > 1000)
    assert(heavy >= 45, s"only $heavy/50 heavy ids in the top-50")
    val out2 = WeightedSample.esTopK(df.repartition(17), "id", "w", 50)
      .collect().map(_.getLong(0))
    assert(out.sorted.sameElements(out2.sorted))
  }

  test("fixture margin: adjacent E-S keys at the sf0.01 cut are far above double ulp") {
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("n_chars") >= 1)
    val key = round(log((((col("doc_id") % lit(1000000007L))
      * lit(2654435761L)) % lit(1000000L) + lit(0.5)) / lit(1000000.0))
      * lit(1e6)) / col("n_chars").cast("double")
    val top = docs.select(key.as("k")).orderBy(col("k").desc)
      .limit(205).collect().map(_.getDouble(0))
    // the decision boundary for k=200: gap between ranks 200 and 201
    val gap = top(199) - top(200)
    val ulp = math.ulp(math.abs(top(199)))
    assert(gap > ulp * 1e6,
      s"selection-boundary gap $gap too close to ulp $ulp")
  }

  test("E-S key quantization margin holds EXHAUSTIVELY over the whole u domain") {
    // The key numerator round(ln(u) * 1e6) is libm-independent iff,
    // for every reachable u = (m+0.5)/1e6, ln(u)*1e6 sits far from a
    // rounding half-point relative to a cross-libm ln() discrepancy.
    // u's domain is FINITE (1e6 values), so this is a proof by
    // enumeration, not a per-fixture spot check: require every point's
    // half-point distance to exceed 100x a generous 2-ulp (4.44e-16
    // relative) ln discrepancy. Measured worst ratio ~852 at m=33169.
    var worst = Double.MaxValue
    var worstM = -1L
    var m = 0L
    while (m < 1000000L) {
      val v = math.log((m + 0.5) / 1e6) * 1e6
      val d = math.abs(v - math.floor(v) - 0.5)
      val bound = 4.44e-16 * math.abs(v)
      if (bound > 0) {
        val r = d / bound
        if (r < worst) { worst = r; worstM = m }
      }
      m += 1
    }
    assert(worst > 100.0,
      s"half-point margin ratio $worst at m=$worstM — quantized ES key " +
        "is NOT safely libm-independent")
  }
}
