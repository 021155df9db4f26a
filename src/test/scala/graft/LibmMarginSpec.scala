package graft

import org.apache.spark.sql.functions._

import graft.functions.{Geo, StudentT}
import graft.ops.Text

/** Fixture-level libm-independence audit for every oracle that rounds
  * a transcendental to the micro grain: enumerate the REACHABLE ln()
  * arguments at sf0.01 (the driver's correctness fixture) and pin that
  * no quantized value sits near a rounding half-point. Round 11 proved
  * this failure mode is real (llm_bm25_topk went hash-red on a
  * cross-libm ln ulp landing on a round() half-point); BM25/QL/TF-IDF
  * pins live in TextSpec — this spec covers the remaining micro-
  * quantized transcendentals: the bigram-LM per-term log-prob
  * (llm_lm_score / llm_ppl_buckets) and DSIR's bucket log-ratios +
  * per-doc Gumbel keys (llm_dsir_select).
  *
  * Thresholds vs discrepancy bounds: a 2-4 ulp cross-libm ln()
  * difference is <= ~1e-7 in micro units for every value here (|ln|
  * <= ~36), so the 1e-5 floors leave >= 100x margin.
  */
class LibmMarginSpec extends SparkSpec {

  private def dist(v: Double) = math.abs(v - math.floor(v) - 0.5)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docTokens: Array[(Long, Array[String])] =
    spark.read.parquet(s"$sf01/documents.parquet")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))

  test("bigram-LM per-term ln quantization margin over every reachable (c2, c1) pair") {
    val bigrams = docTokens.flatMap { case (_, t) =>
      t.iterator.zip(t.iterator.drop(1)).map { case (a, b) => (a, b) }
    }
    val c2 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val v = docTokens.iterator.flatMap(_._2).toSet.size.toLong
    val pairs = c2.iterator.map { case ((w1, _), n2) => (n2, c1(w1)) }.toSet
    assert(pairs.nonEmpty)
    val worst = pairs.iterator.map { case (n2, n1) =>
      dist(math.log((n2 + 1.0) / (n1 + v)) * 1e6)
    }.min
    assert(worst > 1e-5,
      s"bigram-LM micro-quantization margin $worst over ${pairs.size} pairs")
  }

  test("a6 p-value: betainc-vs-A&S agreement and 6dp half-point margin on every fixture group") {
    // The Spark side computes the two-sided p through TPValue's
    // continued-fraction betainc; the oracle evaluates the A&S
    // 26.7.3/26.7.4 finite series with DuckDB's own libm. The hash
    // gate therefore needs BOTH (a) the two algorithms to agree far
    // below the 6dp rounding grain and (b) no fixture p-value near a
    // 6dp half-point relative to that disagreement — pin both over
    // every sf0.01 group instead of trusting the round-4 spot check.
    val g = graft.ops.DeltaMath.linregress(
        spark.read.parquet(s"$sf01/orders.parquet"),
        keys = Seq("o_custkey"),
        x = unix_timestamp(col("o_orderdate")).cast("double"),
        y = col("o_totalprice"))
      .filter(col("nobs") >= 3 && col("stderr").isNotNull &&
        col("stderr") > 0)
      .select(col("slope") / col("stderr"), col("nobs"))
      .collect().map(r => (r.getDouble(0), r.getLong(1).toInt - 2))
    assert(g.length > 1000, s"unexpected fixture group count ${g.length}")
    def asSeries(t: Double, nu: Int): Double = {
      val theta = math.atan(math.abs(t) / math.sqrt(nu.toDouble))
      if (nu % 2 == 0) {
        val s = (0 to (nu - 2) / 2).map { j =>
          math.exp(StudentT.lgamma(2 * j + 1.0) -
            2 * StudentT.lgamma(j + 1.0) - j * math.log(4.0)) *
            math.pow(math.cos(theta), 2 * j)
        }.sum
        1.0 - math.sin(theta) * s
      } else {
        val s = if (nu < 3) 0.0
        else (0 to (nu - 3) / 2).map { j =>
          math.exp(j * math.log(4.0) + 2 * StudentT.lgamma(j + 1.0) -
            StudentT.lgamma(2 * j + 2.0)) *
            math.pow(math.cos(theta), 2 * j + 1)
        }.sum
        1.0 - (2.0 / math.Pi) * (theta + math.sin(theta) * s)
      }
    }
    var worstDiff = 0.0
    var worstDist = Double.MaxValue
    g.foreach { case (t, nu) =>
      val p = StudentT.pvalueTwoSided(t, nu.toDouble)
      val ref = asSeries(t, nu)
      worstDiff = math.max(worstDiff, math.abs(p - ref))
      worstDist = math.min(worstDist, dist(p * 1e6))
    }
    assert(worstDiff < 1e-11,
      s"betainc vs A&S disagreement $worstDiff at the fixture")
    // measured at round 12: worstDiff 6.0e-13, closest p-value
    // 3.5e-11 (p units) from a 6dp half-point — a 59x margin; require
    // 30x so cross-libm additions to the series evaluation (~1e-14)
    // still clear while real erosion fails the build
    assert(worstDist / 1e6 > 30 * (worstDiff + 1e-14),
      s"p-value 6dp half-point distance ${worstDist / 1e6} too close " +
        s"for disagreement $worstDiff")
  }

  test("f6 geodesy rounding margins over every sf0.01 point") {
    // f6_polar_stereo hashes round(x), round(y) at the metre grain and
    // the round-tripped lon/lat at 1e-4 degrees; the projection chain
    // (tan/pow/sin/atan) may differ by a few ulps cross-libm
    // (<= ~1e-7 at the rounded scales). Enumerate every fixture point
    // and pin the closest half-point approach well above that.
    val pts = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select((col("l_extendedprice") % 360.0 - 180.0).as("lon"),
        (lit(-60.0) - col("l_quantity") % 29.0).as("lat"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pts.length > 10000)
    var worstXY = Double.MaxValue
    var worstDeg = Double.MaxValue
    pts.foreach { case (lon, lat) =>
      val x = Geo.ps3031X(lon, lat)
      val y = Geo.ps3031Y(lon, lat)
      worstXY = math.min(worstXY, math.min(dist(x), dist(y)))
      worstDeg = math.min(worstDeg,
        math.min(dist(Geo.ps3031Lon(x, y) * 1e4),
          dist(Geo.ps3031Lat(x, y) * 1e4)))
    }
    assert(worstXY > 1e-6, s"x/y metre-grain margin $worstXY")
    assert(worstDeg > 1e-6, s"roundtrip 1e-4-degree margin $worstDeg")
  }

  test("DSIR bucket log-ratio and Gumbel-key quantization margins at sf0.01") {
    // grams: unigrams + bigrams, hashed to 64 buckets by the first 8
    // md5 hex chars (the oracle's CAST(concat('0x', ...) AS BIGINT)
    // % 64 arithmetic, mirrored exactly)
    def bucket(g: String): Int =
      (java.lang.Long.parseLong(md5hex(g).substring(0, 8), 16) % 64).toInt
    val grams = docTokens.flatMap { case (id, t) =>
      val uni = t.iterator.map(g => (id, g, "u"))
      val bi = t.iterator.zip(t.iterator.drop(1))
        .map { case (a, b) => (id, s"$a $b", "b") }
      uni ++ bi
    }
    val srcDocs = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("source") === "src0")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val byBucket = grams.map { case (id, g, _) => (id, bucket(g)) }
    val cs = byBucket.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ct = byBucket.filter(r => srcDocs(r._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val totalS = byBucket.length.toLong
    val totalT = byBucket.count(r => srcDocs(r._1)).toLong
    val worstRatio = (0 until 64).map { b =>
      val lr = math.log(
        ((ct.getOrElse(b, 0L) + 1.0) * (totalS + 64.0)) /
          ((cs.getOrElse(b, 0L) + 1.0) * (totalT + 64.0))) * 1e6
      dist(lr)
    }.min
    assert(worstRatio > 1e-5, s"DSIR log-ratio margin $worstRatio")
    // Gumbel tie-break key: u from 13 md5 hex chars (52 bits) of
    // "<doc_id>#dsir", g = -ln(-ln(u)) in micros
    val worstGumbel = docTokens.map { case (id, _) =>
      val u = java.lang.Long.parseLong(
        md5hex(s"$id#dsir").substring(0, 13), 16).toDouble / 4503599627370496.0
      dist(-math.log(-math.log(u)) * 1e6)
    }.min
    assert(worstGumbel > 1e-5, s"DSIR Gumbel-key margin $worstGumbel")
  }
}
