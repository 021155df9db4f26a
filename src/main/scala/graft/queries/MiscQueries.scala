package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.ConvexHull

/** Remaining operator-inventory rows (SURVEY.md §2): J6 cycle-vs-
  * reference diff, P13 positional slice, A14 geometric dissolve.
  */
object MiscQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // J6 cycle-vs-reference-cycle difference (atlxi_lake.py:436):
    // subtract the reference cycle's value from every cycle at the
    // same location — window-first, no self-join.
    Q("j6_cycle_vs_ref",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(max(col("l_extendedprice")).as("h"))
        val w = Window.partitionBy(col("l_orderkey"))
        val ref = max(when(col("l_linenumber") === 1, col("h"))).over(w)
        li.withColumn("h_ref", ref)
          .filter(col("h_ref").isNotNull)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("h") - col("h_ref"), 2).as("dh"))
      },
      Some("""
        WITH pts AS (
          SELECT l_orderkey, l_linenumber, max(l_extendedprice) AS h
          FROM lineitem GROUP BY 1, 2),
        r AS (
          SELECT l_orderkey, h AS h_ref FROM pts WHERE l_linenumber = 1)
        SELECT p.l_orderkey, p.l_linenumber, round(p.h - r.h_ref, 2) AS dh
        FROM pts p JOIN r ON p.l_orderkey = r.l_orderkey
      """.trim)),

    // P13 positional slice (tests/test_subglacial_lake_finder.py:38):
    // deterministic head — order then limit.
    Q("p13_positional_slice",
      (s, dir) => {
        Tables(s, dir, "orders")
          .orderBy(col("o_orderkey"))
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 100
      """.trim)),

    // A14 geometric dissolve (atlxi_lake.py:370-375): merge multi-part
    // geometries per group — hull of the union of member vertices
    // (hull provenance makes hull-of-union exact here). Oracle checks
    // the dissolved extremes per group.
    Q("a14_dissolve",
      (s, dir) => {
        val n = Tables(s, dir, "nation")
          .withColumn("cx", (col("n_nationkey") * 1000).cast("double"))
          .withColumn("cy", (col("n_regionkey") * 500).cast("double"))
          .withColumn("r", (col("n_nationkey") + lit(100)).cast("double"))
        // 4 diamond vertices per nation; dissolve per region
        val verts = n.select(col("n_regionkey"),
          explode(zip_with(
            array(col("cx") - col("r"), col("cx"), col("cx") + col("r"), col("cx")),
            array(col("cy"), col("cy") - col("r"), col("cy"), col("cy") + col("r")),
            (x, y) => struct(x.as("x"), y.as("y")))).as("v"))
          .select(col("n_regionkey"), col("v.x").as("x"), col("v.y").as("y"))
        verts.groupBy(col("n_regionkey"))
          .agg(ConvexHull.convex_hull(col("x"), col("y")).as("hull"))
          .select(col("n_regionkey"),
            aggregate(transform(col("hull"), p => p.getField("x")),
              lit(Double.MaxValue), (a, v) => least(a, v)).as("xmin"),
            aggregate(transform(col("hull"), p => p.getField("x")),
              lit(Double.MinValue), (a, v) => greatest(a, v)).as("xmax"),
            aggregate(transform(col("hull"), p => p.getField("y")),
              lit(Double.MaxValue), (a, v) => least(a, v)).as("ymin"),
            aggregate(transform(col("hull"), p => p.getField("y")),
              lit(Double.MinValue), (a, v) => greatest(a, v)).as("ymax"))
      },
      Some("""
        WITH n AS (
          SELECT n_regionkey,
                 CAST(n_nationkey * 1000 AS DOUBLE) AS cx,
                 CAST(n_regionkey * 500 AS DOUBLE) AS cy,
                 CAST(n_nationkey + 100 AS DOUBLE) AS r
          FROM nation)
        SELECT n_regionkey,
               min(cx - r) AS xmin, max(cx + r) AS xmax,
               min(cy - r) AS ymin, max(cy + r) AS ymax
        FROM n
        GROUP BY n_regionkey
      """.trim)),

    // BPE-ish regex token counting over documents: alpha runs, digit
    // runs, and single punctuation as separate tokens.
    Q("llm_bpe_tokens",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        d.select(col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"))
      },
      Some("""
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0))
                 AS n_bpe_tokens
        FROM documents
      """.trim))
  )
}
