package graft

import org.apache.spark.sql.functions._

import graft.ops.{NearDup, Text}

/** Dev tool (round 15, verdict task #4): cross the SimHash adaptive
  * key-width decade boundary for real. [[NearDup.simhashKeyBlocks]]
  * steps r=3 -> r=4 at n ~ 4.79M docs; every probe so far (sf10,
  * 510k docs) sat at r=3, so the step had only executed in unit-test
  * enumeration. This probe runs BANDING ONLY (no exact-Jaccard
  * verify — at 5M docs that phase measures the fixture's duplicate
  * mass, not the width step) on a COPIES=1000 fixture
  * (`tools/gen_sf1.py /root/testdata/sf0.1 /tmp/sf100 1000 documents`)
  * and records:
  *   - the chosen key width (observe metric `key_blocks`) — expect 4
  *     above the boundary, 3 at sf10;
  *   - bucket candidate mass + dropped buckets (observe metrics);
  *   - distinct candidate pairs at the production maxDist (6 = the
  *     blocks-2 deterministic band at r=2; at r=4 the pigeonhole
  *     guarantee is hamming <= blocks-r = 4);
  *   - GUARANTEE recall: every planted pair within the pigeonhole
  *     band (hamming <= blocks - r) MUST be a candidate — a miss is
  *     a banding bug, not a recall trade;
  *   - planted recall at hamming <= maxDist overall (the honest
  *     probabilistic-tail number).
  *
  * Run at both /tmp/sf10 and /tmp/sf100 with the same maxDist to read
  * per-doc candidate mass across the width step — the sub-quadratic
  * claim is "candidates per doc stays O(tables*blocks)", so the
  * per-doc number should stay flat (or drop) across 10x corpus
  * growth, not grow 10x.
  */
object WidthStepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxDist = sys.env.getOrElse("SPARK_GRAFT_MAXDIST", "6").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("width-step-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    // capture the banding observe() metrics (async listener bus)
    val metrics =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit =
          qe.observedMetrics.foreach { case (obs, row) =>
            if (obs == "graft.simhash_lsh")
              row.schema.fieldNames.zip(row.toSeq).foreach {
                case (k, v: Number) => metrics.put(k, v.toString)
                case _ => ()
              }
          }
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.queries.LlmQueries.docsWithPlanted(spark, sfDir)
    // signatures once, persisted: shared by the banding run and the
    // planted-pair hamming audit
    val sigs = docs
      .select(col("doc_id"), NearDup.simhash64(Text.tokens(col("text"))).as("_s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = time("signatures") { sigs.count() }
    val expectedR = NearDup.simhashKeyBlocks(n)
    println(s"corpus_docs=$n expected_key_blocks=$expectedR")

    val cand = time("banding") {
      NearDup.simhashPairsFromSignatures(sigs, "doc_id", "_s",
        maxDist = maxDist, corpusCount = Some(n))
    }
    val candN = time("candidate_count") { cand.count() }
    // drain the async metric bus
    val deadline = System.nanoTime() + 5000000000L
    while (!metrics.containsKey("key_blocks") && System.nanoTime() < deadline)
      Thread.sleep(50)
    println(f"candidates(maxDist=$maxDist%d, distinct)=$candN%d " +
      f"per_doc=${candN.toDouble / n}%.2f")
    println(s"observed key_blocks=${metrics.get("key_blocks")} " +
      s"bucket_candidate_pairs=${metrics.get("candidate_pairs")} " +
      s"dropped_buckets=${metrics.get("dropped_buckets")} " +
      s"dropped_docs=${metrics.get("dropped_docs")}")

    // planted-pair audit: docsWithPlanted plants (orig, orig+100000)
    // for every orig with doc_id % 50 == 0; join their signatures and
    // bucket by hamming vs the pigeonhole band (blocks - r)
    val blocks = 8
    val kb = Option(metrics.get("key_blocks")).map(_.toDouble.toInt)
      .getOrElse(expectedR)
    val planted = sigs.as("o")
      .filter(col("o.doc_id") % 50 === 0)
      .join(sigs.as("p"), col("p.doc_id") === col("o.doc_id") + lit(100000L))
      .select(col("o.doc_id").as("id1"), col("p.doc_id").as("id2"),
        NearDup.hamming64(col("o._s"), col("p._s")).as("h"))
      .persist()
    val found = planted.join(cand.select("id1", "id2"), Seq("id1", "id2"))
    val audit = planted
      .withColumn("guaranteed", col("h") <= lit(blocks - kb))
      .withColumn("in_band", col("h") <= lit(maxDist))
      .join(found.select(col("id1"), col("id2"), lit(1).as("hit")),
        Seq("id1", "id2"), "left")
      .agg(
        count(lit(1)).as("planted_pairs"),
        sum(when(col("guaranteed"), 1L).otherwise(0L)).as("guaranteed_pairs"),
        sum(when(col("guaranteed") && col("hit").isNotNull, 1L).otherwise(0L))
          .as("guaranteed_found"),
        sum(when(col("in_band"), 1L).otherwise(0L)).as("band_pairs"),
        sum(when(col("in_band") && col("hit").isNotNull, 1L).otherwise(0L))
          .as("band_found"))
      .collect()(0)
    println(s"planted_pairs=${audit.getLong(0)} " +
      s"guaranteed(h<=${blocks - kb})=${audit.getLong(1)} " +
      s"guaranteed_found=${audit.getLong(2)} " +
      s"in_band(h<=$maxDist)=${audit.getLong(3)} band_found=${audit.getLong(4)}")
    if (audit.getLong(1) != audit.getLong(2))
      println("GUARANTEE VIOLATION: a pigeonhole-band pair was not a candidate")
    spark.stop()
  }
}
