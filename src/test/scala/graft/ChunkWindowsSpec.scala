package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Packing

/** Sliding-window chunking arithmetic on documents where the window
  * layout is checkable by hand.
  */
class ChunkWindowsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def chunks(window: Int, stride: Int, texts: (Long, String)*) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(t => Row(t._1, t._2))),
      schema)
    Packing.chunkWindows(df, window = window, stride = stride)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("short doc yields exactly one full-doc chunk") {
    val out = chunks(4, 3, 1L -> "a b")
    assert(out.toSeq == Seq((1L, 0, 2L, "a b")))
  }

  test("every token is covered; consecutive chunks overlap by window - stride") {
    // 7 tokens, window 4, stride 3 -> chunks at 1..4 and 4..7
    val out = chunks(4, 3, 1L -> "t1 t2 t3 t4 t5 t6 t7")
    assert(out.toSeq == Seq(
      (1L, 0, 4L, "t1 t2 t3 t4"),
      (1L, 1, 4L, "t4 t5 t6 t7")))
  }

  test("final chunk runs short, never empty") {
    // 6 tokens, window 4, stride 3 -> 1..4 and 4..6 (3 tokens)
    val out = chunks(4, 3, 1L -> "u1 u2 u3 u4 u5 u6")
    assert(out.toSeq == Seq(
      (1L, 0, 4L, "u1 u2 u3 u4"),
      (1L, 1, 3L, "u4 u5 u6")))
  }

  test("stride == window tiles with no overlap") {
    val out = chunks(3, 3, 1L -> "a b c d e f g")
    assert(out.toSeq == Seq(
      (1L, 0, 3L, "a b c"),
      (1L, 1, 3L, "d e f"),
      (1L, 2, 1L, "g")))
  }
}
