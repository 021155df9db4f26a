package graft

import org.apache.spark.sql.functions._

import graft.ops.Embeddings

class EmbeddingsSpec extends SparkSpec {

  private def emb = Tables(spark, sf001, "embeddings")

  test("cosine: self-similarity is 1, symmetry holds") {
    val e = emb.limit(5).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val self = e.select(Embeddings.cosine(col("v"), col("v")).as("c")).collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("brute-force top-k: k rows per query, descending cosine, excludes self") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Embeddings.bruteForceTopK(emb, q, "vec_id", "embedding", "qid", "qvec", 10)
      .collect()
    assert(top.length == 50)
    val byQ = top.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1) - 1e-15))
      assert(!rows.exists(_.getLong(2) == qid), "self in top-k")
    }
  }

  test("index sizing rules: bits/nlist grow with the corpus, occupancy stays at target") {
    // LSH: one extra bit per corpus doubling once past the target
    assert(Embeddings.lshBitsFor(0) == 1)
    assert(Embeddings.lshBitsFor(1024) == 1)   // at/below target: minimum width
    assert(Embeddings.lshBitsFor(2048) == 1)   // 2048 >> 1 = 1024 <= target
    assert(Embeddings.lshBitsFor(4096) == 2)
    assert(Embeddings.lshBitsFor(1L << 30) == 20)
    assert(Embeddings.lshBitsFor(Long.MaxValue) == 53) // 2^63-1 >> 53 = 1023
    assert(Embeddings.lshBitsFor(Long.MaxValue, 1) == 62) // hard cap
    // expected occupancy never exceeds target (for n past the minimum)
    for (n <- Seq(10000L, 1000000L, 100000000L, 10000000000L)) {
      val b = Embeddings.lshBitsFor(n)
      assert((n >> b) <= 1024, s"occupancy ${n >> b} above target at n=$n")
    }
    // IVF: ceil(n / targetCell), capped
    assert(Embeddings.ivfNlistFor(0) == 1)
    assert(Embeddings.ivfNlistFor(4096) == 1)
    assert(Embeddings.ivfNlistFor(4097) == 2)
    assert(Embeddings.ivfNlistFor(1L << 40) == (1 << 20)) // cap
    // both monotone in n
    val ns = Seq(1L, 5000L, 1000000L, 1L << 33)
    assert(ns.map(Embeddings.lshBitsFor(_)) == ns.map(Embeddings.lshBitsFor(_)).sorted)
    assert(ns.map(Embeddings.ivfNlistFor(_)) == ns.map(Embeddings.ivfNlistFor(_)).sorted)
  }

  test("ANN LSH: same-bucket candidates only, recall above bucket-chance") {
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Embeddings.bruteForceTopK(emb, q, "vec_id", "embedding", "qid", "qvec", 10)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Embeddings.annTopK(emb, q, "vec_id", "embedding", "qid", "qvec",
        k = 10, bits = 4, tables = 8)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(brute).size.toDouble / brute.size
    // this corpus's true top-10 neighbors sit at cos ~0.24-0.43 (weak
    // structure), where per-bit agreement p ~ 0.6: 8 tables x 4 bits
    // predicts recall 1-(1-p^4)^8 ~ 0.6-0.7 while touching ~40% of the
    // corpus — must clearly beat a random candidate set of that size
    assert(recall >= 0.45, s"ANN recall $recall below 0.45")
  }

  test("ANN LSH: large query sets are NOT force-broadcast") {
    // the scale path's whole point: a query set too big to broadcast
    // must plan as a shuffle join, not OOM the driver. Disable auto
    // broadcasting and verify no broadcast join remains in the plan.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val plan = Embeddings.annTopK(emb, q, "vec_id", "embedding", "qid", "qvec", k = 5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANN LSH: declared dim must match the vectors — fail fast") {
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ex = intercept[Exception] {
      Embeddings.annTopK(emb, q, "vec_id", "embedding", "qid", "qvec",
        k = 5, dim = 32).collect()
    }
    assert(ex.toString.toLowerCase.contains("dim")
      || Option(ex.getCause).exists(_.toString.toLowerCase.contains("dim")), ex.toString)
  }

  test("ANN IVF: k-means cells partition the corpus; probes shrink candidates; recall beats cell-chance") {
    val e = emb
    val n = e.count()
    val model = Embeddings.trainIvfCentroids(e, "vec_id", "embedding", nlist = 16, iters = 5)
    // every vector lands in exactly one cell, all cells valid ids
    val cells = e.select(col("vec_id"),
        Embeddings.assignCell(col("embedding").cast("array<double>"), model).as("cell"))
      .groupBy("cell").count().collect()
    assert(cells.map(_.getLong(1)).sum == n)
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = Embeddings.ivfTopK(e, q, "vec_id", "embedding", "qid", "qvec",
        k = 5, nlist = 16, nprobe = 4, centroids = Some(model))
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Embeddings.bruteForceTopK(e, q, "vec_id", "embedding", "qid", "qvec", 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // probing 4/16 cells touches ~25% of the corpus; data-adaptive
    // cells must do clearly better than the 25% random-subset baseline
    assert(recall >= 0.4, s"IVF recall $recall below 0.4")
    // candidate shrinkage: probed cells hold well under the whole corpus
    val probedShare = cells.filter(_.getLong(1) > 0).map(_.getLong(1)).sorted.reverse.take(4).sum.toDouble / n
    assert(probedShare < 0.9, s"top-4 cells hold $probedShare of corpus - quantizer degenerate")
  }

  test("semDedup: planted scaled copies collapse onto min-id originals; others survive") {
    val e = emb
    val n = e.count()
    val planted = e.filter(col("vec_id") % 89 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
      .withColumn("embedding", transform(col("embedding"), x => x * lit(2.0f)))
    val nPlanted = planted.count()
    val out = Embeddings.semDedup(e.unionByName(planted), "vec_id", "embedding",
      Embeddings.argmaxCell(col("embedding")), tau = 0.99)
    val rows = out.collect()
    val survivors = rows.map(_.getLong(0)).toSet
    // every planted copy must be pruned (its original has the smaller id)
    assert(!survivors.exists(_ >= 1000000L), "a planted copy survived")
    // originals of planted copies represent a group of >= 2
    val bySize = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    e.filter(col("vec_id") % 89 === 0).collect().map(_.getLong(0)).foreach { id =>
      assert(survivors.contains(id), s"original $id missing")
      assert(bySize(id) >= 2L, s"original $id group size ${bySize(id)}")
    }
    // conservation: group sizes sum to the full corpus
    assert(rows.map(_.getLong(2)).sum == n + nPlanted)
    // same-cell invariant: a survivor's group members share its cell —
    // checked implicitly by construction (pairs are cell-equi-joined);
    // here assert the quantizer itself is total (no null cells)
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("semDedup pair join is an equi-join on the cell, not a cross join") {
    val e = emb.limit(200)
    val out = Embeddings.semDedup(e, "vec_id", "embedding",
      Embeddings.argmaxCell(col("embedding")), tau = 0.99)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in semDedup plan:\n$plan")
  }
}