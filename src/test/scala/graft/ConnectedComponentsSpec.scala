package graft

import org.apache.spark.sql.functions._

import graft.ops.ConnectedComponents

/** The shared CC engine: min-id labels, both solver paths, and the
  * one-directional-input contract the dedup family relies on.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)], cap: Long): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.label(edges.toDF("id1", "id2"), "id1", "id2",
      singleTaskMax = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // chain 1-2-3, triangle 10-11-12 (+ redundant edge), isolated pair 20-21;
  // edges ONE-directional with mixed orientation (3,2) to exercise the
  // symmetrization the frontier path needs
  private val edges = Seq[(Long, Long)](
    (1L, 2L), (3L, 2L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L)

  test("single-task union-find path: min-id labels per component") {
    assert(labelsOf(edges, cap = 1000000L) == expected)
  }

  test("frontier fallback path: identical labels on the same graph") {
    assert(labelsOf(edges, cap = 0L) == expected)
  }

  test("self-loop-only nodes are emitted by both solver paths") {
    // node 5's only edge is (5,5): the contract says every node
    // appearing in edges gets a label — the single-task path used to
    // drop it (ra == rb did no put), diverging from the frontier path
    val e = Seq((5L, 5L), (1L, 2L))
    val want = Map(5L -> 5L, 1L -> 1L, 2L -> 1L)
    assert(labelsOf(e, cap = 1000000L) == want)
    assert(labelsOf(e, cap = 0L) == want)
  }

  test("long chain: frontier pointer jumping converges to the chain min") {
    // a 40-node path graph — diameter >> 1 forces multiple rounds
    val chain = (0L until 39L).map(i => (i, i + 1))
    val want = (0L to 39L).map(_ -> 0L).toMap
    assert(labelsOf(chain, cap = 0L) == want)
    assert(labelsOf(chain, cap = 1000000L) == want)
  }
}
