package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the coarse
  * clustering primitive under SemDeDup-style semantic dedup, diversity
  * sampling, and IVF index builds. Unlike [[Embeddings.trainIvfCentroids]]
  * (double means, an internal model), this variant is ORACLE-EXACT: a
  * SQL engine replaying the same fixed-point arithmetic reproduces the
  * assignment bit-for-bit, so cluster membership itself is a gated
  * query result, not just an implementation detail.
  *
  * Exactness design (the repo-wide integer discipline):
  *   - vectors quantize once to integer units `round(x * scale)` —
  *     deterministic in both engines (double->long round);
  *   - a centroid is the exact rational (sum: array<long>, count):
  *     integer aggregation is order-independent, so the shuffle's
  *     nondeterministic merge order cannot perturb it;
  *   - the point-to-centroid distance avoids dividing the centroid:
  *     D_j = sum_d (dbl(cnt_j*x_d - s_jd))^2 / dbl(cnt_j^2), each term
  *     one product + one division in double, folded LEFT-TO-RIGHT over
  *     dimensions (`aggregate` here, `list_reduce` in the oracle) —
  *     identical IEEE op sequence, identical bits. cnt*x fits a long
  *     for counts <= ~1e10 rows at unit scale 1e6; the square is taken
  *     in double (exact cast below 2^53, then one rounded multiply).
  *   - argmin = array_position(arr, array_min(arr)): linear expression
  *     tree (a when()-fold accumulator is exponential), first match on
  *     ties = smallest cluster id;
  *   - empty clusters keep their previous centroid in both engines.
  *
  * Scale shape: assignment is a narrow codegen'd expression over the
  * scan (k folds of dim terms per row); the per-iteration centroid
  * update is ONE map-side-combined shuffle keyed by (cluster, dim) —
  * k*dim groups — collected driver-side as the O(k*dim) model, exactly
  * like the IVF trainer. The quantized input is cached across
  * iterations (MEMORY_AND_DISK; at petabyte scale substitute a
  * checkpoint). Init centroids are the k smallest-id vectors, an
  * ordered limit-k, not a sample.
  */
object KMeans {

  /** One centroid as exact integers. */
  final case class Centroid(cnt: Long, s: Array[Long])

  private[ops] def quantize(vec: Column, scale: Double): Column =
    transform(vec.cast("array<double>"), x => round(x * scale).cast("long"))

  /** Exact-fold distance of quantized vector `v` to centroid `c` —
    * the codegen'd [[graft.functions.CentroidDist]] kernel (the
    * interpreted `aggregate(zip_with(...))` twin is kept as
    * [[distHof]] and pinned bit-identical in KernelEquivalenceSpec).
    */
  private[ops] def dist(v: Column, c: Centroid): Column =
    graft.functions.centroid_dist(v, 0, c.cnt, c.s)

  /** The replaced HOF formulation, spec-only. */
  private[graft] def distHof(v: Column, c: Centroid): Column = {
    val cnt = lit(c.cnt)
    val cc = lit((c.cnt * c.cnt).toDouble)
    aggregate(
      zip_with(v, typedLit(c.s.toSeq), (x, s) => {
        val t = (cnt * x - s).cast("double")
        t * t / cc
      }),
      lit(0.0), (acc, d) => acc + d)
  }

  private[ops] def assign(v: Column, cents: Array[Centroid]): Column = {
    val arr = array(cents.toIndexedSeq.map(dist(v, _)): _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** (id, cluster) assignment after `iters` Lloyd iterations with
    * k deterministic seed centroids.
    */
  def assignClusters(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3, scale: Double = 1e6): DataFrame =
    train(emb, idCol, vecCol, k, iters, scale)._2
      .select(col("_id").as(idCol), col("cluster"))

  /** Trained model + assignment: (final centroids, DataFrame of
    * (_id, _v quantized, cluster)). The returned centroids are the
    * ones the final assignment used (the last iteration assigns
    * without updating).
    */
  def train(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3, scale: Double = 1e6): (Array[Centroid], DataFrame) = {
    val q = emb.select(col(idCol).as("_id"), quantize(col(vecCol), scale).as("_v"))
      // null/absent vectors are EXCLUDED from the index: at corpus
      // scale a broken row must not poison training or rank first in
      // a search (null codes -> null distance sorts ahead under asc)
      .filter(col("_v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainOnQuantized(q, k, iters)
    finally q.unpersist()
  }

  /** [[train]] over an already-quantized, already-persisted
    * `(_id, _v)` frame — lets composite index builds (IVF-PQ) share
    * one quantized cache across the coarse and PQ training loops.
    */
  private[ops] def trainOnQuantized(
      q: DataFrame, k: Int, iters: Int): (Array[Centroid], DataFrame) = {
    require(k > 0 && iters > 0)
    locally {
      val dim = q.select(size(col("_v"))).head().getInt(0)
      var cents: Array[Centroid] = q.orderBy(col("_id")).limit(k)
        .select(col("_v")).collect()
        .map(r => Centroid(1L, r.getSeq[Long](0).toArray))
      require(cents.length == k, s"input smaller than k=$k")
      var assigned: DataFrame = null
      for (i <- 1 to iters) {
        assigned = q.select(col("_id"), col("_v"),
          assign(col("_v"), cents).as("cluster"))
        if (i < iters) {
          // one shuffle: (cluster, dim) integer sums + the member count
          // rides along on dim 0's group
          val stats = assigned
            .select(col("cluster"), posexplode(col("_v")).as(Seq("d", "x")))
            .groupBy(col("cluster"), col("d"))
            .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
            .collect()
          val next = cents.map(c => Centroid(c.cnt, c.s.clone()))
          val byCluster = stats.groupBy(_.getAs[Int]("cluster"))
          byCluster.foreach { case (cl, rows) =>
            val s = new Array[Long](dim)
            rows.foreach(r => s(r.getAs[Int]("d")) = r.getAs[Long]("s"))
            next(cl) = Centroid(rows.head.getAs[Long]("n"), s)
          }
          // clusters absent from stats keep their previous centroid
          cents = next
        }
      }
      (cents, assigned)
    }
  }

  /** DuckDB oracle replaying [[assignClusters]] verbatim: chained CTEs
    * per iteration (quantize -> assign -> integer-sum update), built
    * here so query and oracle can never drift structurally.
    */
  def oracleSql(
      table: String, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, scaleUnits: Long): String =
    chainsSql(table, idCol, vecCol, k, iters, dim, scaleUnits) +
      s"""
         |SELECT id AS $idCol, cl AS cluster FROM a$iters""".stripMargin

  /** The CTE chain only (q, c1, a1, e1, u1, c2 … a{iters}) with no
    * final SELECT — composable into larger oracles (IVF-PQ).
    */
  private[ops] def chainsSql(
      table: String, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, scaleUnits: Long): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH q AS (
         |  SELECT $idCol AS id,
         |         list_transform(CAST($vecCol AS DOUBLE[]),
         |           x -> CAST(round(x * $scaleUnits) AS BIGINT)) AS v
         |  FROM $table),
         |c1 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cl,
         |         v AS s, CAST(1 AS BIGINT) AS cnt
         |  FROM (SELECT id, v FROM q ORDER BY id LIMIT $k))""".stripMargin)
    for (i <- 1 to iters) {
      // assignment against centroids c{i}
      sb.append(
        s""",
           |a$i AS (
           |  SELECT id, cl, v FROM (
           |    SELECT q.id, c.cl, q.v,
           |           row_number() OVER (PARTITION BY q.id ORDER BY
           |             list_reduce(list_transform(list_zip(q.v, c.s),
           |               p -> (CAST(c.cnt * p[1] - p[2] AS DOUBLE)
           |                     * CAST(c.cnt * p[1] - p[2] AS DOUBLE))
           |                    / CAST(c.cnt * c.cnt AS DOUBLE)),
           |               (acc, d) -> acc + d) ASC, c.cl ASC) AS rn
           |    FROM q CROSS JOIN c$i c) WHERE rn = 1)""".stripMargin)
      if (i < iters) {
        val j = i + 1
        sb.append(
          s""",
             |e$i AS (
             |  SELECT cl, t.i AS d, CAST(sum(v[t.i]) AS BIGINT) AS s,
             |         count(*) AS cnt
             |  FROM a$i, LATERAL unnest(generate_series(1, $dim)) t(i)
             |  GROUP BY cl, t.i),
             |u$i AS (
             |  SELECT cl, list(s ORDER BY d) AS s, min(cnt) AS cnt
             |  FROM e$i GROUP BY cl),
             |c$j AS (
             |  SELECT c.cl, COALESCE(u.s, c.s) AS s, COALESCE(u.cnt, c.cnt) AS cnt
             |  FROM c$i c LEFT JOIN u$i u USING (cl))""".stripMargin)
      }
    }
    sb.toString
  }
}
