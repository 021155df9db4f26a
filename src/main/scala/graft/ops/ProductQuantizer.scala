package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the FAISS-style compression stage that
  * turns a d-dim float vector into m small integer codes, one per
  * contiguous subspace, each code indexing a per-subspace k-means
  * codebook. Together with the hyperplane-LSH and IVF families in
  * [[Embeddings]] this completes the standard ANN index triad
  * (LSH / IVF / PQ): at 100 TB the PQ codes are what actually sits in
  * memory (m bytes per vector instead of 4·d), and IVF-PQ = coarse
  * IVF cell + PQ residual codes is the textbook billion-vector layout.
  *
  * Exactness design — identical to [[KMeans]]'s integer discipline so
  * the CODES THEMSELVES are an oracle-gated query result:
  * vectors quantize once to integer units; per-subspace centroids are
  * exact rationals (sum: array<long>, count); the point-to-centroid
  * distance folds left-to-right over dimensions with one product and
  * one division in double per term (identical IEEE op sequence in
  * DuckDB's list_reduce); argmin is array_position(arr, array_min) —
  * first match on ties = smallest code; empty clusters keep their
  * previous centroid.
  *
  * Scale shape: training is ONE map-side-combined shuffle per Lloyd
  * iteration covering ALL m subspaces at once — the explode emits
  * (subspace, code, dim, x) and the group count is m·ksub·subLen =
  * ksub·dim rows collected driver-side (the O(model) collect, same as
  * IVF). Assignment is a narrow codegen'd expression over the scan;
  * the quantized input is cached across iterations (MEMORY_AND_DISK;
  * at petabyte scale substitute a checkpoint).
  */
object ProductQuantizer {

  import KMeans.Centroid

  private def quantize(vec: Column, scale: Double): Column =
    transform(vec.cast("array<double>"), x => round(x * scale).cast("long"))

  /** Exact-fold distance of the j-th slice of quantized vector `v` to
    * centroid `c` (slice start is 1-based, matching Spark's slice()).
    * Codegen'd [[graft.functions.CentroidDist]] with a direct offset —
    * no per-row slice() copy; the interpreted twin is [[distHof]],
    * pinned bit-identical in KernelEquivalenceSpec.
    */
  private def dist(v: Column, start: Int, len: Int, c: Centroid): Column = {
    require(c.s.length == len)
    graft.functions.centroid_dist(v, start - 1, c.cnt, c.s)
  }

  /** The replaced HOF formulation, spec-only. */
  private[graft] def distHof(v: Column, start: Int, len: Int, c: Centroid): Column = {
    val cnt = lit(c.cnt)
    val cc = lit((c.cnt * c.cnt).toDouble)
    aggregate(
      zip_with(slice(v, start, len), typedLit(c.s.toSeq), (x, s) => {
        val t = (cnt * x - s).cast("double")
        t * t / cc
      }),
      lit(0.0), (acc, d) => acc + d)
  }

  private def assign(v: Column, start: Int, len: Int,
      cents: Array[Centroid]): Column = {
    val arr = array(cents.toIndexedSeq.map(dist(v, start, len, _)): _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** Trained PQ model + final assignment: (codebooks[m][ksub],
    * codes DataFrame `(_id, code_0 … code_{m-1})`). The codebook that
    * produced the final assignment is returned (the last iteration
    * assigns without updating, exactly like [[KMeans]]).
    */
  def train(
      emb: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int,
      scale: Double = 1e6): (Array[Array[Centroid]], DataFrame) = {
    val q = emb.select(col(idCol).as("_id"), quantize(col(vecCol), scale).as("_v"))
      // null/absent vectors are EXCLUDED from the index: at corpus
      // scale a broken row must not poison training or rank first in
      // a search (null codes -> null distance sorts ahead under asc)
      .filter(col("_v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainOnQuantized(q, m, ksub, iters, dim)
    finally q.unpersist()
  }

  /** [[train]] over an already-quantized, already-persisted
    * `(_id, _v)` frame — lets composite index builds (IVF-PQ) share
    * ONE quantized cache across the coarse and PQ training loops
    * instead of scanning and caching the corpus once per model.
    */
  private[ops] def trainOnQuantized(
      q: DataFrame, m: Int, ksub: Int, iters: Int,
      dim: Int): (Array[Array[Centroid]], DataFrame) = {
    require(m > 0 && ksub > 0 && iters > 0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subLen = dim / m
    locally {
      // init: subspace slices of the ksub smallest-id vectors — the
      // same deterministic seed rule as KMeans, applied per subspace
      val seed = q.orderBy(col("_id")).limit(ksub).select(col("_v")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(seed.length == ksub, s"input smaller than ksub=$ksub")
      var cents: Array[Array[Centroid]] = Array.tabulate(m) { j =>
        seed.map(v => Centroid(1L, v.slice(j * subLen, (j + 1) * subLen)))
      }
      var assigned: DataFrame = null
      for (i <- 1 to iters) {
        val codeCols = (0 until m).map(j =>
          assign(col("_v"), j * subLen + 1, subLen, cents(j)).as(s"code_$j"))
        assigned = q.select(col("_id") +: col("_v") +: codeCols: _*)
        if (i < iters) {
          // ONE shuffle for all m subspaces: (sub, code, dim) integer
          // sums; the member count rides on each group (constant per
          // (sub, code), min over dims below)
          val stats = assigned
            .select(
              posexplode(col("_v")).as(Seq("d", "x")),
              array((0 until m).map(j => col(s"code_$j")): _*).as("codes"))
            .withColumn("sub", (col("d") / subLen).cast("int"))
            .withColumn("cl", element_at(col("codes"), col("sub") + 1))
            .groupBy(col("sub"), col("cl"), col("d"))
            .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
            .collect()
          val next = cents.map(_.map(c => Centroid(c.cnt, c.s.clone())))
          stats.groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("cl")))
            .foreach { case ((sub, cl), rows) =>
              val s = new Array[Long](subLen)
              rows.foreach(r =>
                s(r.getAs[Int]("d") - sub * subLen) = r.getAs[Long]("s"))
              next(sub)(cl) = Centroid(rows.head.getAs[Long]("n"), s)
            }
          // (sub, code) pairs absent from stats keep their previous
          // centroid — matches the oracle's COALESCE
          cents = next
        }
      }
      (cents, assigned.select(col("_id") +:
        (0 until m).map(j => col(s"code_$j")): _*))
    }
  }

  /** (id, code_0 … code_{m-1}) after `iters` Lloyd iterations per
    * subspace. Scalar code columns (not an array) so the driver's
    * engine-independent hash compare sees plain integers.
    */
  def pqCodes(
      emb: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int,
      scale: Double = 1e6): DataFrame =
    train(emb, idCol, vecCol, m, ksub, iters, dim, scale)._2
      .withColumnRenamed("_id", idCol)

  /** ADC (asymmetric distance computation) top-k search — the reason
    * PQ exists: the query vector is NOT quantized; per subspace a
    * ksub-entry distance table from the query slice to every codebook
    * centroid is computed ONCE driver-side, and each database vector's
    * distance is m table lookups + (m-1) adds over its CODES — no
    * float vector is touched at scan time. At 100 TB this is the
    * in-memory rerank path: 4 bytes/vector of codes instead of 256
    * bytes of floats, scan-speed, embarrassingly parallel.
    *
    * Exactness: the distance table replays the centroid fold
    * (one product + one division per dim, folded left-to-right) in
    * driver-side Scala doubles — the same IEEE op sequence DuckDB's
    * list_reduce performs in [[adcOracleSql]] — and the final sum is
    * a left-associated (m-1)-add chain in both engines, so the
    * ordering (and the emitted micro-unit distance) is bit-identical.
    * Ties break on vec_id.
    */
  def adcTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int,
      queryId: Long, k: Int, scale: Double = 1e6): DataFrame = {
    val subLen = dim / m
    val (cents, codes) = train(emb, idCol, vecCol, m, ksub, iters, dim, scale)
    val qv: Array[Long] = emb.filter(col(idCol) === queryId)
      .select(quantize(col(vecCol), scale)).head().getSeq[Long](0).toArray
    require(qv.length == dim, s"query vector dim ${qv.length} != $dim")
    val dtab = distTables(qv, cents, subLen)
    val adc = (0 until m).map(j =>
        element_at(typedLit(dtab(j).toSeq), col(s"code_$j") + 1))
      .reduceLeft(_ + _)
    // orderBy+limit plans as TakeOrderedAndProject — per-partition
    // top-k heaps, no global sort; the rank window then runs over the
    // k surviving rows only
    codes
      .withColumn("adc", adc)
      .orderBy(col("adc").asc, col("_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("adc").asc, col("_id").asc)))
      .select(col("rank"), col("_id").as(idCol),
        // floor-then-cast: identical bits in, identical integer out
        // (DuckDB's bare double->bigint cast ROUNDS; floor() doesn't)
        floor(col("adc")).cast("long").as("adc_units"))
  }

  /** Exact scalar fold of the quantized query slice at `off` against
    * centroid `c` — the driver-side twin of [[dist]] and of the
    * oracle's list_reduce (same IEEE op sequence, identical bits).
    */
  private def exactDist(qv: Array[Long], off: Int, len: Int, c: Centroid): Double = {
    val cc = (c.cnt * c.cnt).toDouble
    var acc = 0.0
    var d = 0
    while (d < len) {
      val t = (c.cnt * qv(off + d) - c.s(d)).toDouble
      acc = acc + t * t / cc
      d += 1
    }
    acc
  }

  /** Per-subspace ADC distance tables: dtab(j)(c) = exact fold of the
    * query's j-th slice against codebook entry c.
    */
  private def distTables(qv: Array[Long], cents: Array[Array[Centroid]],
      subLen: Int): Array[Array[Double]] =
    Array.tabulate(cents.length) { j =>
      cents(j).map(exactDist(qv, j * subLen, subLen, _))
    }

  /** IVF-PQ search — the textbook billion-vector layout: an IVF
    * coarse quantizer (integer-exact [[KMeans]]) narrows the search to
    * the `nprobe` cells nearest the query, and ADC over PQ codes ranks
    * ONLY those candidates. Both the cell id and the m codes are
    * literal-centroid expressions, so the whole search is ONE narrow
    * scan (assign coarse cell -> probe filter -> m table lookups) into
    * a distributed top-k — zero joins, zero full-corpus distance
    * computations. At 100 TB with the corpus laid out
    * partition-per-cell-range, the probe filter becomes partition
    * pruning and the scan touches nprobe/nlist of the data.
    *
    * Exactness: coarse training, probe selection, PQ training, and the
    * ADC sum all run the repo's integer-centroid fold discipline, so a
    * SQL engine replays every step bit-for-bit ([[ivfAdcOracleSql]]).
    * Probe ties break toward the smaller cell id; result ties toward
    * the smaller vector id.
    */
  def ivfAdcTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      coarseK: Int, coarseIters: Int, nprobe: Int,
      m: Int, ksub: Int, iters: Int, dim: Int,
      queryId: Long, k: Int, scale: Double = 1e6): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarseK)
    val subLen = dim / m
    // ONE quantized cache shared by the coarse and PQ training loops
    // and the query-vector fetch — the index build scans the corpus
    // once, not once per model
    val q = emb.select(col(idCol).as("_id"), quantize(col(vecCol), scale).as("_v"))
      // null/absent vectors are EXCLUDED from the index: at corpus
      // scale a broken row must not poison training or rank first in
      // a search (null codes -> null distance sorts ahead under asc)
      .filter(col("_v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (coarse, pq, qv) =
      try {
        val (c, _) = KMeans.trainOnQuantized(q, coarseK, coarseIters)
        val (p, _) = trainOnQuantized(q, m, ksub, iters, dim)
        val v = q.filter(col("_id") === queryId)
          .select(col("_v")).head().getSeq[Long](0).toArray
        (c, p, v)
      } finally q.unpersist()
    require(qv.length == dim, s"query vector dim ${qv.length} != $dim")
    val probeCells: Seq[Int] = coarse.zipWithIndex
      .map { case (c, i) => (exactDist(qv, 0, dim, c), i) }
      .sorted.take(nprobe).map(_._2).toIndexedSeq
    val dtab = distTables(qv, pq, subLen)
    val adc = (0 until m).map(j =>
        element_at(typedLit(dtab(j).toSeq), col(s"code_$j") + 1))
      .reduceLeft(_ + _)
    val codeCols = (0 until m).map(j =>
      assign(col("_v"), j * subLen + 1, subLen, pq(j)).as(s"code_$j"))
    emb
      .select(col(idCol).as("_id"), quantize(col(vecCol), scale).as("_v"))
      .withColumn("cell", KMeans.assign(col("_v"), coarse))
      .filter(col("cell").isin(probeCells.map(Integer.valueOf): _*))
      .select(col("_id") +: codeCols: _*)
      .withColumn("adc", adc)
      .orderBy(col("adc").asc, col("_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("adc").asc, col("_id").asc)))
      .select(col("rank"), col("_id").as(idCol),
        floor(col("adc")).cast("long").as("adc_units"))
  }

  /** DuckDB oracle replaying [[pqCodes]] verbatim: one [[KMeans]]-style
    * chained CTE block per subspace over the sliced vector, joined on
    * id at the end. Built here so query and oracle cannot drift.
    */
  def oracleSql(
      table: String, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int, scaleUnits: Long): String =
    chains(table, idCol, vecCol, m, ksub, iters, dim, scaleUnits) + {
      val selects = (0 until m).map(j => s"a${iters}_$j.cl AS code_$j")
        .mkString(",\n       ")
      val joins = (1 until m).map(j => s"JOIN a${iters}_$j USING (id)")
        .mkString("\n")
      s"""
         |SELECT id AS $idCol,
         |       $selects
         |FROM a${iters}_0
         |$joins""".stripMargin
    }

  /** DuckDB oracle replaying [[adcTopK]]: the per-subspace training
    * chains, then a distance table dt_j(cl, dist) from the quantized
    * query slice to the FINAL codebook c{iters}, then the left-
    * associated m-way sum over each vector's codes, ORDER BY + LIMIT.
    */
  def adcOracleSql(
      table: String, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int, scaleUnits: Long,
      queryId: Long, k: Int): String = {
    val subLen = dim / m
    val sb = new StringBuilder
    sb.append(chains(table, idCol, vecCol, m, ksub, iters, dim, scaleUnits))
    sb.append(s""",
      |qv AS (SELECT v FROM q0 WHERE id = $queryId)""".stripMargin)
    for (j <- 0 until m) {
      val lo = j * subLen + 1
      val hi = (j + 1) * subLen
      sb.append(
        s""",
           |dt_$j AS (
           |  SELECT c.cl,
           |         list_reduce(list_transform(
           |             list_zip(list_slice(qv.v, $lo, $hi), c.s),
           |             p -> (CAST(c.cnt * p[1] - p[2] AS DOUBLE)
           |                   * CAST(c.cnt * p[1] - p[2] AS DOUBLE))
           |                  / CAST(c.cnt * c.cnt AS DOUBLE)),
           |           (acc, d) -> acc + d) AS dist
           |  FROM c${iters}_$j c, qv)""".stripMargin)
    }
    val joins = (0 until m).map(j =>
      s"JOIN dt_$j ON dt_$j.cl = a${iters}_$j.cl").mkString("\n  ")
    val codeJoins = (1 until m).map(j => s"JOIN a${iters}_$j USING (id)")
      .mkString("\n  ")
    val sum = (0 until m).map(j => s"dt_$j.dist").reduceLeft((a, b) => s"($a + $b)")
    sb.append(
      s""",
         |adc AS (
         |  SELECT id, $sum AS adc
         |  FROM a${iters}_0
         |  $codeJoins
         |  $joins)
         |SELECT CAST(row_number() OVER (ORDER BY adc ASC, id ASC) AS INTEGER)
         |         AS rank,
         |       id AS $idCol,
         |       CAST(floor(adc) AS BIGINT) AS adc_units
         |FROM adc
         |ORDER BY adc ASC, id ASC
         |LIMIT $k""".stripMargin)
    sb.toString
  }

  /** DuckDB oracle replaying [[ivfAdcTopK]]: the coarse [[KMeans]]
    * chain, the PQ chains, exact probe selection (distance of the
    * quantized query to each final coarse centroid, ORDER BY dist, cl
    * LIMIT nprobe), the candidate semi-join on the coarse assignment,
    * then the ADC distance tables and the left-associated sum over
    * codes, top-k with id tie-break.
    */
  def ivfAdcOracleSql(
      table: String, idCol: String, vecCol: String,
      coarseK: Int, coarseIters: Int, nprobe: Int,
      m: Int, ksub: Int, iters: Int, dim: Int, scaleUnits: Long,
      queryId: Long, k: Int): String = {
    val subLen = dim / m
    val sb = new StringBuilder
    // coarse chain: q, c1 … a{coarseIters}
    sb.append(KMeans.chainsSql(table, idCol, vecCol,
      coarseK, coarseIters, dim, scaleUnits))
    // PQ chains: q0, q_j, c1_j … a{iters}_j (suffixes avoid collision)
    sb.append(",\n")
    sb.append(chains(table, idCol, vecCol, m, ksub, iters, dim,
      scaleUnits, lead = ""))
    sb.append(
      s""",
         |qv AS (SELECT v FROM q WHERE id = $queryId),
         |dtq AS (
         |  SELECT c.cl,
         |         list_reduce(list_transform(list_zip(qv.v, c.s),
         |             p -> (CAST(c.cnt * p[1] - p[2] AS DOUBLE)
         |                   * CAST(c.cnt * p[1] - p[2] AS DOUBLE))
         |                  / CAST(c.cnt * c.cnt AS DOUBLE)),
         |           (acc, d) -> acc + d) AS dist
         |  FROM c$coarseIters c, qv),
         |probes AS (SELECT cl FROM dtq ORDER BY dist ASC, cl ASC LIMIT $nprobe),
         |cand AS (
         |  SELECT a.id FROM a$coarseIters a JOIN probes p ON a.cl = p.cl)""".stripMargin)
    for (j <- 0 until m) {
      val lo = j * subLen + 1
      val hi = (j + 1) * subLen
      sb.append(
        s""",
           |dt_$j AS (
           |  SELECT c.cl,
           |         list_reduce(list_transform(
           |             list_zip(list_slice(qv.v, $lo, $hi), c.s),
           |             p -> (CAST(c.cnt * p[1] - p[2] AS DOUBLE)
           |                   * CAST(c.cnt * p[1] - p[2] AS DOUBLE))
           |                  / CAST(c.cnt * c.cnt AS DOUBLE)),
           |           (acc, d) -> acc + d) AS dist
           |  FROM c${iters}_$j c, qv)""".stripMargin)
    }
    val codeJoins = (1 until m).map(j => s"JOIN a${iters}_$j USING (id)")
      .mkString("\n  ")
    val dtJoins = (0 until m).map(j =>
      s"JOIN dt_$j ON dt_$j.cl = a${iters}_$j.cl").mkString("\n  ")
    val sum = (0 until m).map(j => s"dt_$j.dist").reduceLeft((a, b) => s"($a + $b)")
    sb.append(
      s""",
         |adc AS (
         |  SELECT id, $sum AS adc
         |  FROM a${iters}_0
         |  $codeJoins
         |  $dtJoins
         |  JOIN cand USING (id))
         |SELECT CAST(row_number() OVER (ORDER BY adc ASC, id ASC) AS INTEGER)
         |         AS rank,
         |       id AS $idCol,
         |       CAST(floor(adc) AS BIGINT) AS adc_units
         |FROM adc
         |ORDER BY adc ASC, id ASC
         |LIMIT $k""".stripMargin)
    sb.toString
  }

  /** Shared CTE prefix: quantize, slice, and run the per-subspace
    * Lloyd chains (q0, q_j, c1_j, a{i}_j, e/u/c{i+1}_j …).
    * `lead` lets a composing oracle splice this chain after its own
    * WITH clause ("" -> no WITH keyword).
    */
  private def chains(
      table: String, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int, scaleUnits: Long,
      lead: String = "WITH "): String = {
    require(dim % m == 0)
    val subLen = dim / m
    val sb = new StringBuilder
    sb.append(
      s"""${lead}q0 AS (
         |  SELECT $idCol AS id,
         |         list_transform(CAST($vecCol AS DOUBLE[]),
         |           x -> CAST(round(x * $scaleUnits) AS BIGINT)) AS v
         |  FROM $table)""".stripMargin)
    for (j <- 0 until m) {
      val lo = j * subLen + 1
      val hi = (j + 1) * subLen
      sb.append(
        s""",
           |q_$j AS (SELECT id, list_slice(v, $lo, $hi) AS v FROM q0),
           |c1_$j AS (
           |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cl,
           |         v AS s, CAST(1 AS BIGINT) AS cnt
           |  FROM (SELECT id, v FROM q_$j ORDER BY id LIMIT $ksub))""".stripMargin)
      for (i <- 1 to iters) {
        sb.append(
          s""",
             |a${i}_$j AS (
             |  SELECT id, cl FROM (
             |    SELECT q.id, c.cl,
             |           row_number() OVER (PARTITION BY q.id ORDER BY
             |             list_reduce(list_transform(list_zip(q.v, c.s),
             |               p -> (CAST(c.cnt * p[1] - p[2] AS DOUBLE)
             |                     * CAST(c.cnt * p[1] - p[2] AS DOUBLE))
             |                    / CAST(c.cnt * c.cnt AS DOUBLE)),
             |               (acc, d) -> acc + d) ASC, c.cl ASC) AS rn
             |    FROM q_$j q CROSS JOIN c${i}_$j c) WHERE rn = 1)""".stripMargin)
        if (i < iters) {
          val nx = i + 1
          sb.append(
            s""",
               |e${i}_$j AS (
               |  SELECT a.cl, t.i AS d, CAST(sum(q.v[t.i]) AS BIGINT) AS s,
               |         count(*) AS cnt
               |  FROM a${i}_$j a JOIN q_$j q USING (id),
               |       LATERAL unnest(generate_series(1, $subLen)) t(i)
               |  GROUP BY a.cl, t.i),
               |u${i}_$j AS (
               |  SELECT cl, list(s ORDER BY d) AS s, min(cnt) AS cnt
               |  FROM e${i}_$j GROUP BY cl),
               |c${nx}_$j AS (
               |  SELECT c.cl, COALESCE(u.s, c.s) AS s,
               |         COALESCE(u.cnt, c.cnt) AS cnt
               |  FROM c${i}_$j c LEFT JOIN u${i}_$j u USING (cl))""".stripMargin)
        }
      }
    }
    sb.toString
  }
}
