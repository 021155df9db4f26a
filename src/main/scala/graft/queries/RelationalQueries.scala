package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational surface: scans, projections, filters, aggregates,
  * joins — SURVEY.md §2.1-2.4. Each query is a declarative DataFrame
  * program (Catalyst handles pushdown/pruning/join selection); the
  * DuckDB oracle string is the semantics contract.
  *
  * Float discipline: aggregate outputs of double arithmetic are
  * rounded (2-6 dp) in BOTH engines so partial-aggregation order
  * differences cannot flip the driver's hash compare.
  */
object RelationalQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Ingest-once bucketed copies of orders/lineitem for the co-located
    * fact-fact join (q2). Bucketing's contract is that the bucketing
    * shuffle is paid ONCE at ingest and every later join on the key is
    * shuffle-free — so the tables are built at most once per
    * (application, source dir) and q2's timed body is the join itself.
    * Bench pre-builds them in its untimed warmup; any other caller
    * (Verify, tests) pays the build lazily on first use.
    */
  object BucketedTables {
    private val built =
      scala.collection.concurrent.TrieMap.empty[(String, String), (String, String)]
    def ensure(s: SparkSession, dir: String): (String, String) = {
      val runId = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
      built.getOrElseUpdate((runId, dir), {
        // suffix path + table names with app id AND source-dir hash so
        // concurrent benches (or two dirs in one session) can't race on
        // a shared tmp dir or DROP each other's catalog entries
        val dirTag = java.lang.Integer.toHexString(dir.hashCode)
        val base = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_bucketed_${runId}_$dirTag"
        val ordersTbl = s"graft_b_orders_${runId}_$dirTag"
        val lineitemTbl = s"graft_b_lineitem_${runId}_$dirTag"
        s.sql(s"DROP TABLE IF EXISTS $ordersTbl")
        s.sql(s"DROP TABLE IF EXISTS $lineitemTbl")
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority")
          .write.format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/orders").mode("overwrite")
          .saveAsTable(ordersTbl)
        t(s, dir, "lineitem")
          .select(col("l_orderkey"),
            round(col("l_extendedprice") * 100).cast("long").as("price_c"))
          .write.format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/lineitem").mode("overwrite")
          .saveAsTable(lineitemTbl)
        (ordersTbl, lineitemTbl)
      })
    }
  }

  override def queries: Seq[Q] = Seq(

    // A2/A4: the flagship grouped aggregate (TPC-H Q1 shape) — maps the
    // dhdt pipeline's groupBy(ref_pt).agg(...) stage onto lineitem.
    // Exactness: every sum/mean runs over exact integer scales (qty is
    // integral; price/discount are 2-decimal -> cents), so no result
    // depends on float summation order or on round()-of-a-double —
    // round(avg(double), 4) can land on a 4dp half where Spark's
    // shortest-decimal HALF_UP and DuckDB's binary round split.
    // Means/fixed-point outputs use integer floor-division.
    Q("q1_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .withColumn("qty_i", round(col("l_quantity")).cast("long"))
          .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
          .withColumn("disc_c", round(col("l_discount") * 100).cast("long"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("qty_i")).cast("double").as("sum_qty"),
            (sum(col("price_c")).cast("double") / 100.0).as("sum_base_price"),
            (expr("sum(price_c * (100 - disc_c)) div 100").cast("double") / 100.0)
              .as("sum_disc_price"),
            (expr("sum(qty_i) * 10000 div count(1)").cast("double") / 10000.0)
              .as("avg_qty"),
            (expr("sum(disc_c) * 100 div count(1)").cast("double") / 10000.0)
              .as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(round(l_quantity) AS BIGINT) AS qty_i,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                 CAST(round(l_discount * 100) AS BIGINT) AS disc_c
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
        SELECT l_returnflag, l_linestatus,
               CAST(sum(qty_i) AS DOUBLE) AS sum_qty,
               CAST(CAST(sum(price_c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(CAST(sum(price_c * (100 - disc_c)) AS BIGINT) // 100 AS DOUBLE) / 100.0
                 AS sum_disc_price,
               CAST(CAST(sum(qty_i) AS BIGINT) * 10000 // count(*) AS DOUBLE) / 10000.0
                 AS avg_qty,
               CAST(CAST(sum(disc_c) AS BIGINT) * 100 // count(*) AS DOUBLE) / 10000.0
                 AS avg_disc,
               count(*) AS count_order
        FROM c
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)),

    // Bucketed co-located join — the 100-TB fact-fact join shape: both
    // sides are written bucketed (and sorted) on the join key, so the
    // per-query join reads bucket-aligned splits with NO Exchange on
    // either side. The ingest-time bucketing shuffle is paid ONCE;
    // every subsequent join on the key is shuffle-free (pinned in
    // ExplainSpec: the only Exchange in the plan is the final small
    // group-by). Oracle = the same join/aggregate over the plain
    // tables, so correctness is bucketing-independent by construction.
    Q("q2_bucketed_join",
      (s, dir) => {
        val (ordersTbl, lineitemTbl) = BucketedTables.ensure(s, dir)
        s.table(lineitemTbl)
          .join(s.table(ordersTbl),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("price_c")).as("sum_price_cents"))
      },
      Some("""
        SELECT o_orderpriority,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_price_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
      """.trim)),

    // TPC-H Q3 shape: three-way selective join + grouped revenue +
    // top-k. The plan is left entirely to Catalyst/AQE: segment and
    // date filters push into the scans, the pruned customer side
    // broadcasts into orders, and only the orders⋈lineitem join
    // shuffles on the key. Revenue in exact cents (q1's integer
    // discipline); top-10 tie-broken on orderkey so the cut is
    // engine-independent.
    Q("q3_shipping_priority",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
          .withColumn("disc_c", round(col("l_discount") * 100).cast("long"))
          .select(col("l_orderkey"), col("price_c"), col("disc_c"))
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg((expr("sum(price_c * (100 - disc_c)) div 100").cast("double")
            / 100.0).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                 CAST(round(l_discount * 100) AS BIGINT) AS disc_c
          FROM lineitem
          WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00')
        SELECT o_orderkey, o_orderdate,
               CAST((sum(price_c * (100 - disc_c)) // 100) AS DOUBLE) / 100.0
                 AS revenue,
               count(*) AS n_items
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN li ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
      """.trim)),

    // TPC-H Q6 shape: the pure scan-aggregate whose entire WHERE
    // clause must reach the parquet scan as PushedFilters (pinned in
    // ExplainSpec) — at 100 TB this is the difference between reading
    // three row groups and reading the table. Revenue in exact cents
    // x basis points (price_c * disc_bp is an exact integer), one
    // map-side-combined aggregation, one row out.
    Q("q6_revenue_change",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
            col("l_quantity") < 24)
          .select((round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 10000).cast("long")).as("rev_cbp"))
          .agg(sum(col("rev_cbp")).as("revenue_cbp"), count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT)
                 AS revenue_cbp,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
      """.trim))
  )
}
