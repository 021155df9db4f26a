package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeTrain

/** BPE training contracts: (1) the codegen aggregate() fold rewrite
  * is exactly the sequential greedy left-to-right scan (randomized
  * equivalence against a reference implementation, including the
  * overlapping-run cases like AAA under pair (A,A)); (2) train()
  * learns the merges a hand-computed Sennrich-style corpus demands;
  * (3) applyMerges is lossless (concatenating a word's pieces yields
  * the word) and actually uses the learned tokens; (4) the learned
  * merge table is invariant to corpus partitioning.
  */
class BpeTrainSpec extends SparkSpec {

  /** Reference greedy scan: merge every non-overlapping (l, r)
    * occurrence left-to-right in one pass.
    */
  private def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("fold rewrite == sequential greedy scan on randomized sequences") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = Vector("A", "B", "AB", "C")
    val cases = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
    }
    // pairs chosen to hit overlap runs (A,A), cross tokens (A,B), and
    // a merged-looking left symbol (AB,C)
    for ((l, r) <- Seq(("A", "A"), ("A", "B"), ("AB", "C"), ("B", "A"))) {
      val got = cases.toDF("id", "syms")
        .select(col("id"), BpeTrain.mergeFold(col("syms"), l, r).as("m"))
        .collect().map(row => row.getAs[Long]("id") ->
          row.getSeq[String](1)).toMap
      cases.foreach { case (id, syms) =>
        assert(got(id) == refMerge(syms, l, r),
          s"pair ($l,$r) on $syms: fold=${got(id)} ref=${refMerge(syms, l, r)}")
      }
    }
  }

  test("hand corpus learns the expected merges in order") {
    val sess = spark
    import sess.implicits._
    // freq(lo)=9 via low x5, lowest x4 -> step 1 merges (l,o);
    // after that (lo,w) appears 9 times, beating everything else
    val docs = Seq(
      "low low low low low",
      "lowest lowest lowest lowest",
      "newer newer newer",
      "wider wider").toDF("text")
    val m = BpeTrain.train(docs, "text", steps = 3)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    assert(m(0) == ((1, "l", "o", "lo", 9L)), s"step 1: ${m(0)}")
    assert(m(1) == ((2, "lo", "w", "low", 9L)), s"step 2: ${m(1)}")
    // remaining pairs: er x5 (newer x3 + wider x2), we x5? n-e-w-e-r:
    // (n,e)(e,w)(w,e)(e,r) x3; w-i-d-e-r: (w,i)(i,d)(d,e)(e,r) x2;
    // lowest: (low,e)(e,s)(s,t) x4 -> (e,r)=5, (e,s)=4, (w,e)=3,
    // (low,e)=4 ... argmax = (e,r) 5
    assert(m(2) == ((3, "e", "r", "er", 5L)), s"step 3: ${m(2)}")
  }

  test("applyMerges is lossless and uses learned tokens") {
    val sess = spark
    import sess.implicits._
    val docs = Seq("low low lowest", "newer low").toDF("text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = BpeTrain.applyMerges(docs, "text", merges)
      .select(col("word"), col("pieces")).collect()
    out.foreach { r =>
      val word = r.getAs[String]("word")
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString == word, s"lossy: $word -> $pieces")
    }
    val lowPieces = out.find(_.getAs[String]("word") == "low").get.getSeq[String](1)
    assert(lowPieces == Seq("low"), s"expected single piece, got $lowPieces")
    val lowestPieces = out.find(_.getAs[String]("word") == "lowest").get.getSeq[String](1)
    assert(lowestPieces == Seq("low", "e", "s", "t"), s"got $lowestPieces")
  }

  test("longer training extends, never rewrites, a shorter run's merges") {
    // BPE merges are a priority list: train(K) must be a strict prefix
    // of train(K+2) — a violation means iteration state leaked across
    // steps (the greedy argmax saw a perturbed vocab)
    val docs = Tables(spark, sf001, "documents")
    def table(steps: Int): Seq[(Int, String, String)] =
      BpeTrain.train(docs, "text", steps).orderBy("step").collect()
        .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
          r.getAs[String]("rhs"))).toSeq
    val four = table(4)
    val six = table(6)
    assert(six.take(4) == four, s"prefix violated: $four vs ${six.take(4)}")
    assert(six.map(x => (x._2, x._3)).distinct.sizeIs == 6,
      "a pair was merged twice — rewrite failed to consume it")
  }

  test("merge table is invariant to corpus partitioning") {
    val docs = Tables(spark, sf001, "documents")
    def table(parts: Int): Seq[(Int, String, String, Long)] =
      BpeTrain.train(docs.repartition(parts), "text", steps = 3)
        .collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
          r.getAs[String]("rhs"), r.getAs[Long]("pair_count"))).toSeq.sorted
    assert(table(1) == table(6))
  }

  test("checkpoint cadence never changes the merge table") {
    // the localCheckpoint lineage cut is pure mechanics: training with
    // a cut every 2 merges (3 cuts in 7 steps) must be byte-identical
    // to training with no cut at all
    val docs = Tables(spark, sf001, "documents")
    def table(every: Int): Seq[(Int, String, String, Long)] =
      BpeTrain.train(docs, "text", steps = 7, checkpointEvery = every)
        .collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
          r.getAs[String]("rhs"), r.getAs[Long]("pair_count"))).toSeq.sorted
    assert(table(2) == table(1000))
  }

  test("tokenizeCorpus reassembles every token occurrence in position order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low"),
      (2L, "low low newest"),
      (3L, "wider new low")).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", steps = 3)
      .orderBy("step").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val out = BpeTrain.tokenizeCorpus(docs, "text", "doc_id", merges)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("tok_pos"),
        r.getAs[String]("word"), r.getAs[Int]("piece_pos"),
        r.getAs[String]("piece")))
    // lossless: concatenating each occurrence's pieces in piece_pos
    // order reassembles the word, for EVERY (doc, position) slot of
    // the original whitespace token stream
    val reassembled = out.groupBy(t => (t._1, t._2)).map { case ((d, p), ps) =>
      val sorted = ps.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == sorted.indices.toSeq,
        s"piece positions not dense at ($d, $p)")
      (d, p) -> (sorted.head._3, sorted.map(_._5).mkString)
    }
    reassembled.foreach { case ((d, p), (word, cat)) =>
      assert(cat == word, s"($d, $p): pieces reassemble to $cat, word was $word")
    }
    val expected = docs.collect().flatMap { r =>
      r.getAs[String]("text").split("\\s+").filter(_.nonEmpty)
        .zipWithIndex.map { case (w, i) => (r.getAs[Long]("doc_id"), i) -> w }
    }.toMap
    assert(reassembled.keySet == expected.keySet,
      "token-stream slots lost or invented by the join-back")
    expected.foreach { case (k, w) =>
      assert(reassembled(k)._1 == w, s"word mismatch at $k")
    }
    // and the learned merges are actually exercised: at least one
    // occurrence emits fewer pieces than characters
    assert(out.groupBy(t => (t._1, t._2)).exists { case (_, ps) =>
      ps.length < ps.head._3.length
    }, "no occurrence was compressed — merges unused")
  }
}
