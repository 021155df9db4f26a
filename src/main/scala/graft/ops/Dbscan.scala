package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN — the Spark re-expression of the reference's
  * cuML DBSCAN lake clustering
  * (/root/reference/deepicedrain/lake_algorithms.py:13-73, defaults
  * eps=3000 min_samples=250; pipeline eps=3000 min_samples=300 over
  * features (x, y, dhdt_slope), /root/reference/atlxi_lake.py:192-227).
  *
  * Algorithm (exact DBSCAN semantics, any dimension):
  *   1. cell = floor(coord/eps) per dim; the HALO side replicates each
  *      point to its 3^d neighbor cells (broadcast of a tiny offsets
  *      table), the HOME side stays single — every point pair within
  *      eps meets in exactly one (home, halo) cell join.
  *   2. neighbor pairs: equi-join home x halo on the cell key with
  *      squared-distance <= eps^2 — the only quadratic work is within
  *      3^d-cell neighborhoods (cells are eps-sized, so occupancy is
  *      bounded by density, the DBSCAN working assumption).
  *   3. core points: |neighbors| + 1 (self) >= minPts.
  *   4. cluster = connected components of the core-core neighbor
  *      graph: one-level star contraction (each node -> min of its
  *      closed neighborhood) shrinks the graph ~degree-fold, then
  *      frontier-based min-label propagation (only labels that
  *      changed last round join the edge table) with pointer-jumping
  *      (label := label of label) converges in O(log diameter)
  *      rounds over the tiny rep graph; lineage cut by one
  *      localCheckpoint per round.
  *   5. border points join the min-labeled core neighbor; the rest is
  *      noise (null cluster, matching the reference's NaN noise).
  *
  * Determinism: min-id labels are order-independent, so cluster ids
  * and counts are reproducible run-to-run (the reference's exact
  * 16/31 cluster-count gates rely on this).
  */
object Dbscan {

  /** @return (idCol, cluster) — cluster is the min point-id of the
    *         cluster's core points; null = noise.
    */
  def dbscan(
      points: DataFrame, idCol: String, coords: Seq[String],
      eps: Double, minPts: Int): DataFrame = {
    val spark = points.sparkSession
    val d = coords.length
    require(d >= 1, "need at least one coordinate")

    // 1. home cells
    val cellCols = coords.zipWithIndex.map { case (c, i) =>
      floor(col(c) / eps).cast("long").as(s"_c$i")
    }
    val home = points.select((col(idCol) +: coords.map(col)) ++ cellCols: _*)

    // offsets: 3^d rows, broadcast. (A one-sided 5-offset halo with a
    // swapped-union to recover both pair directions was benchmarked
    // and measured SLOWER at sf0.1 — the halved join output doesn't
    // pay for the extra cache materialization and doubled downstream
    // cache scans, because the codegen'd distance filter is cheap.)
    val offsets = (0 until d).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(o => Seq(-1, 0, 1).map(o :+ _))
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map(o =>
        org.apache.spark.sql.Row.fromSeq(o)), 1),
      org.apache.spark.sql.types.StructType((0 until d).map(i =>
        org.apache.spark.sql.types.StructField(s"_o$i",
          org.apache.spark.sql.types.IntegerType))))

    // 2. halo replication + pair join
    val halo = home.crossJoin(broadcast(offDf))
      .select((col(idCol).as("_bid") +:
        coords.zipWithIndex.map { case (c, i) => col(c).as(s"_b$i") }) ++
        (0 until d).map(i => (col(s"_c$i") + col(s"_o$i")).as(s"_bc$i")): _*)

    val joinCond = (0 until d).map(i => col(s"_c$i") === col(s"_bc$i")).reduce(_ && _)
    val dist2 = coords.zipWithIndex.map { case (c, i) =>
      (col(c) - col(s"_b$i")) * (col(c) - col(s"_b$i"))
    }.reduce(_ + _)
    val pairs = home.join(halo, joinCond)
      .filter(col(idCol) =!= col("_bid"))
      .filter(dist2 <= lit(eps * eps))
      .select(col(idCol).as("src"), col("_bid").as("dst"))
      .persist()

    // 3. core points
    val degrees = pairs.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val core = home.select(col(idCol))
      .join(degrees, col(idCol) === col("src"), "left")
      .select(col(idCol), (coalesce(col("deg"), lit(0L)) + 1 >= minPts).as("is_core"))
      .persist()

    // 4. connected components over core-core edges
    val coreIds = core.filter(col("is_core")).select(col(idCol).as("cid"))
    val edges = pairs
      .join(coreIds.withColumnRenamed("cid", "src"), "src")
      .join(coreIds.withColumnRenamed("cid", "dst"), "dst")
      .select("src", "dst")
      .persist()

    // STAR CONTRACTION before the iterative propagation: every core
    // node points at the minimum id of its CLOSED neighborhood
    // (itself + neighbors), then the pointer forest is collapsed by
    // iterating rep := rep(rep) to its fixpoint — every node ends at
    // its forest ROOT, a node that is the minimum of its own
    // neighborhood. With mean degree k there are ~|V|/(k+1) roots, so
    // the contracted rep graph is ~k+1 times smaller than the core
    // graph (measured at sf0.1: 560k core points, ~40 neighbors ->
    // ~14k roots), and the iterative min-label propagation then
    // rewrites/checkpoints a tiny rep-label table per round instead
    // of the full core-label table. Each collapse step is a cheap
    // label-table self-join — no edge-scale work.
    //
    // Exactness: a rep is reached by a chain of same-component
    // neighbors, so contracted components = original components; the
    // global min id of a component has no smaller neighbor, is its
    // own root, and survives contraction — so min-rep labels ARE the
    // original min-id labels.
    val label0 = coreIds.select(col("cid").as("id"))
      .join(edges.groupBy(col("src")).agg(min(col("dst")).as("_mn")),
        col("id") === col("src"), "left")
      .select(col("id"), least(col("id"), coalesce(col("_mn"), col("id"))).as("rep"))
    var reps = label0.localCheckpoint(true)
    var collapsing = true
    while (collapsing) {
      val j = reps.as("a")
        .join(reps.select(col("id").as("_ji"), col("rep").as("_jr")),
          col("a.rep") === col("_ji"))
        .select(col("a.id").as("id"), col("_jr").as("rep"), col("a.rep").as("_or"))
        .localCheckpoint(true)
      collapsing = j.filter(col("rep") =!= col("_or")).limit(1).count() > 0
      reps = j.select("id", "rep")
    }
    // contracted rep graph, pre-partitioned on src: every propagation
    // round joins on src, so the cached exchange is reused and only
    // the (tiny) rep-label table shuffles per round
    val cEdges = edges
      .join(reps.select(col("id").as("src"), col("rep").as("_rs")), "src")
      .join(reps.select(col("id").as("dst"), col("rep").as("_rd")), "dst")
      .select(col("_rs").as("src"), col("_rd").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()

    // Frontier-based min-label propagation over the rep graph: a rep's
    // label can only improve via a neighbor whose label improved since
    // it last offered it, so the edge join only needs the labels that
    // CHANGED last round (the frontier). Pointer jumping
    // (label := label(label)) bounds rounds by O(log diameter) for
    // elongated components; any label changed by the jump re-enters
    // the frontier, preserving the offer invariant (every newly-
    // acquired label is offered to all neighbors the round after
    // acquisition).
    var labels = reps.select(col("rep")).distinct()
      .select(col("rep").as("id"), col("rep").as("label"))
      .localCheckpoint(true)
    var frontier = labels
    var active = true
    var iter = 0
    while (active && iter < 64) {
      val nbrMin = cEdges
        .join(frontier.withColumnRenamed("id", "src").withColumnRenamed("label", "_fl"),
          "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("_fl")).as("_nl"))
      val prop = labels.withColumnRenamed("label", "_ol")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("_ol"), coalesce(col("_nl"), col("_ol"))).as("label"),
          col("_ol"))
      // pointer jumping: label := label(label)
      val jump = prop.as("a")
        .join(prop.select(col("id").as("_jid"), col("label").as("_jl")),
          col("a.label") === col("_jid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.label"), coalesce(col("_jl"), col("a.label"))).as("label"),
          col("a._ol").as("_ol"))
        .localCheckpoint(true) // the round's ONE job; later reads hit cached blocks
      frontier = jump.filter(col("label") =!= col("_ol")).select("id", "label")
      labels = jump.select("id", "label") // projection of the checkpointed DF
      active = frontier.limit(1).count() > 0 // cheap scan of checkpointed blocks
      iter += 1
    }

    // map rep labels back to core points
    val coreLabeled = reps
      .join(labels.select(col("id").as("rep"), col("label")), "rep")
      .select(col("id").as(idCol), col("label").as("cluster"))

    // 5. assemble: core labels, border = min-labeled core neighbor
    val borderLabels = pairs
      .join(core.filter(!col("is_core")).select(col(idCol).as("src")), "src")
      .join(coreLabeled.select(col(idCol).as("dst"), col("cluster").as("label")), "dst")
      .groupBy(col("src").as(idCol))
      .agg(min(col("label")).as("cluster"))

    // Materialize the (small) result eagerly so the intermediates can
    // be freed NOW instead of leaking for the session's lifetime —
    // repeated dbscan calls in a long-lived session would otherwise
    // accumulate cached pair joins unboundedly. Downstream consumers
    // read the checkpointed blocks.
    val out = home.select(col(idCol))
      .join(coreLabeled.unionByName(borderLabels), Seq(idCol), "left")
      .select(col(idCol), col("cluster"))
      .localCheckpoint(true)
    pairs.unpersist(false)
    core.unpersist(false)
    edges.unpersist(false)
    cEdges.unpersist(false)
    out
  }
}
