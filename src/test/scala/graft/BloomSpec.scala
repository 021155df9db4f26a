package graft

import org.apache.spark.sql.functions._

import graft.ops.Contamination

class BloomSpec extends SparkSpec {

  test("no false negatives: every inserted shingle passes the probe") {
    val sess = spark
    import sess.implicits._
    val bench = (0 until 500)
      .map(i => (i.toLong, s"b$i w${i + 1} w${i + 2} q$i z${i % 7}"))
      .toDF("doc_id", "text")
    val bits = Contamination.buildBloom(bench, "text", n = 3,
      numBits = 1 << 16, k = 5)
    val (h1, h2) = (xxhash64(col("sh")), xxhash64(col("sh"), lit(1L)))
    val misses = bench
      .select(explode(graft.ops.Text.shingles(
        graft.ops.Text.tokens(col("text")), 3)).as("sh"))
      .filter(!graft.functions.bloom_contains(h1, h2, bits, 5))
      .count()
    assert(misses == 0, s"$misses inserted shingles failed the probe")
  }

  test("false-positive rate on disjoint shingles is small at sized m") {
    val sess = spark
    import sess.implicits._
    val bench = (0 until 200)
      .map(i => (i.toLong, s"in$i in${i + 1} in${i + 2} in${i + 3}"))
      .toDF("doc_id", "text")
    // 2 shingles/doc, 400 inserted, m = 2^16, k = 5 -> expected FP
    // rate (1 - e^(-kn/m))^k ~ 2.6e-8; a 1% ceiling is generous
    val bits = Contamination.buildBloom(bench, "text", n = 3,
      numBits = 1 << 16, k = 5)
    val (h1, h2) = (xxhash64(col("sh")), xxhash64(col("sh"), lit(1L)))
    val other = (0 until 20000).map(i => s"out$i outt$i outtt$i")
      .toDF("sh")
    val fp = other
      .filter(graft.functions.bloom_contains(h1, h2, bits, 5)).count()
    assert(fp <= 200, s"FP count $fp > 1% of 20000 disjoint probes")
  }

  test("bitset guard: non-power-of-two rejected, 2^25 words accepted (Int-shift overflow fix)") {
    // the probe masks with bits.length*64 - 1, so a non-power-of-two
    // word count would silently probe wrong positions
    intercept[IllegalArgumentException] {
      graft.functions.bloom_contains(
        xxhash64(lit("x")), xxhash64(lit("x"), lit(1L)),
        new Array[Long](3), 5)
    }
    // 2^25 words (256 MB, a plausible production filter): the old
    // guard reconstructed numBits with an Int shift (bits.length << 6
    // = 2^31 -> negative) and spuriously rejected it; the word-count
    // check must accept it (round-12 advice)
    val big = new Array[Long](1 << 25)
    graft.functions.bloom_contains(
      xxhash64(lit("x")), xxhash64(lit("x"), lit(1L)), big, 5)
  }

  test("contaminatedBloom is bit-identical to the exact broadcast-join path") {
    val sess = spark
    import sess.implicits._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val bench = docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), col("text"))
    // plant overlap: append one bench doc's first 6 tokens to every
    // 7th corpus doc, so both paths have real hits to agree on
    val frag = concat_ws(" ",
      slice(graft.ops.Text.tokens(col("text")), 1, 6))
    val fragRow = bench.select(frag.as("frag")).limit(1)
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
      .crossJoin(broadcast(fragRow))
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" "), col("frag")))
          .otherwise(col("text")).as("text"))
    val exact = Contamination.contaminated(corpus, bench,
      "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bloomed = Contamination.contaminatedBloom(corpus, bench,
      "doc_id", "text", n = 5, numBits = 1 << 16, k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(exact.nonEmpty, "planted overlap produced no hits — vacuous test")
    assert(bloomed == exact,
      s"bloom path diverged: ${bloomed.size} vs ${exact.size} docs")
  }

  test("kernel probe and SQL position arithmetic agree bit-for-bit") {
    val sess = spark
    import sess.implicits._
    val numBits = 1 << 12
    val k = 7
    // one inserted value; verify the kernel reads back exactly the
    // bits the SQL build arithmetic set, including negative-hash
    // masking
    val one = Seq("zz yy xx ww vv").toDF("text")
      .select(col("text"), lit(0L).as("doc_id"))
    val bits = Contamination.buildBloom(one, "text", n = 5,
      numBits = numBits, k = k)
    val sh = "zz yy xx ww vv" // the single 5-gram
    val h1 = Seq(sh).toDF("sh").select(xxhash64(col("sh"))).head().getLong(0)
    val h2 = Seq(sh).toDF("sh").select(xxhash64(col("sh"), lit(1L)))
      .head().getLong(0)
    assert(graft.functions.BloomKernel.mightContain(bits, h1, h2, k))
    // exactly k (or fewer, on probe collisions) bits are set
    val setBits = bits.map(java.lang.Long.bitCount).sum
    assert(setBits <= k && setBits >= 1, s"unexpected popcount $setBits")
  }
}
