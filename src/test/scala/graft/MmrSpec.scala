package graft

import org.apache.spark.sql.functions._

import graft.ops.Embeddings

class MmrSpec extends SparkSpec {

  private def cands(rows: Seq[(Long, Long, Long, Seq[Double])]) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("query_id", "doc_id", "rel_micros", "vec")
  }

  test("mmr demotes the near-duplicate of an already-picked doc") {
    // doc 1: most relevant. doc 2: almost identical vector, nearly as
    // relevant — PURE relevance ranks it second; MMR must instead pick
    // the orthogonal doc 3 second (sim to doc 1 = 0) because doc 2's
    // redundancy penalty (sim ~1e6 at 30% weight) dwarfs its 100-micro
    // relevance edge over doc 3.
    val df = cands(Seq(
      (7L, 1L, 900000L, Seq(1.0, 0.0, 0.0)),
      (7L, 2L, 899900L, Seq(1.0, 1e-9, 0.0)),
      (7L, 3L, 500000L, Seq(0.0, 1.0, 0.0))))
    val got = Embeddings.mmrDiversify(df, k = 3)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L), got.mkString(", "))
    // step-1 score is pure relevance; step-2 carries doc 3's zero
    // similarity to doc 1
    assert(got(0)._3 == 700000L * 900000L)
    assert(got(1)._3 == 700000L * 500000L)
    // step-3: doc 2 pays the full penalty of its ~1.0 cos to doc 1
    assert(got(2)._3 < 700000L * 899900L - 200000L * 999999L)
  }

  test("mmr ties break on smaller doc_id and k caps at group size") {
    val df = cands(Seq(
      (1L, 10L, 100L, Seq(1.0, 0.0)),
      (1L, 11L, 100L, Seq(0.0, 1.0))))
    val got = Embeddings.mmrDiversify(df, k = 5)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(10L, 11L))
  }

  test("mmr is deterministic across partitionings") {
    val sess = spark
    import sess.implicits._
    val rows = (0 until 60).map { i =>
      val q = (i % 3).toLong
      val v = Seq.tabulate(8)(d => ((i * 31 + d * 17) % 13 - 6).toDouble)
      (q, i.toLong, ((i * 7919) % 1000000).toLong, v)
    }
    val df = rows.toDF("query_id", "doc_id", "rel_micros", "vec")
    val a = Embeddings.mmrDiversify(df.repartition(1), 10)
      .collect().map(_.toSeq).toSet
    val b = Embeddings.mmrDiversify(df.repartition(13), 10)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 30)
  }
}
