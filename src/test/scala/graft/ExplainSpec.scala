package graft

/** Pins the headline PLAN SHAPES the PERF.md audits argue from, so a
  * silent regression (a new shuffle, a lost broadcast, an RDD scan
  * barrier) fails a spec instead of rotting unnoticed:
  *
  *  - q_dhdt_pipeline: the whole trim -> h_range -> delta -> 5-output
  *    regression chain runs over ONE hash shuffle;
  *  - llm_corpus_pipeline: ONE data shuffle end-to-end (dedup), the
  *    doc/stats join resolved as a broadcast;
  *  - llm_decontaminate: the corpus side is NEVER shuffled — eval
  *    shingles broadcast into it, one partial-agg shuffle on the
  *    (tiny) matched keys only;
  *  - llm_ann_lsh_topk: banded equi-joins only (no cartesian/nested-
  *    loop fallback), top-k via the rank-window path;
  *  - none of them fall off the Catalyst plan into an RDD scan.
  *
  * Queries execute at sf0.001 so AQE finalizes, then the FINAL
  * adaptive plan is asserted — the claims here are about what
  * actually ran, not the pre-AQE static plan.
  */
class ExplainSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // the adaptive plan's toString appends an "== Initial Plan =="
    // section that would double-count every node — keep the final half
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  /** Shuffle exchanges only (BroadcastExchange excluded). */
  private def shuffles(plan: String): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size

  test("q_dhdt_pipeline: one shuffle, no RDD barrier") {
    val p = finalPlan("q_dhdt_pipeline")
    assert(shuffles(p) == 1, s"expected exactly 1 Exchange:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }

  test("llm_corpus_pipeline: one data shuffle + presentation sort, canon join broadcast") {
    val p = finalPlan("llm_corpus_pipeline")
    // exactly TWO exchanges, each named: the md5-hash dedup groupBy
    // (the pipeline's ONE data shuffle) and the rangepartitioning of
    // the oracle's deterministic orderBy (presentation, not dataflow).
    // A third exchange means the canon join fell off broadcast or a
    // new shuffle crept into the chain.
    assert(shuffles(p) == 2, s"expected dedup shuffle + orderBy range only:\n$p")
    assert("Exchange hashpartitioning\\(_groupingexpression".r
      .findAllIn(p).size == 1, s"md5 dedup shuffle missing/duplicated:\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"orderBy presentation exchange missing/duplicated:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"canon join no longer broadcast:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }

  test("llm_decontaminate: corpus never shuffled, eval side broadcast") {
    val p = finalPlan("llm_decontaminate")
    // three exchanges are allowed, ALL on eval-side or matched-only
    // keys: eval-shingle distinct (sh), matched-pair distinct
    // (doc_id, sh), and the final per-doc agg (doc_id). The corpus
    // scan -> shingle explode -> containment join path must stay
    // shuffle-free: the eval set broadcasts into it. A fourth
    // exchange means the full corpus started shuffling.
    assert(shuffles(p) == 3, s"corpus-side shuffle crept in:\n$p")
    assert("BroadcastHashJoin \\[sh".r.findAllIn(p).nonEmpty,
      s"eval shingles no longer broadcast into the corpus scan:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }

  test("llm_ann_lsh_topk: equi-join banding, windowed top-k, no cartesian") {
    val p = finalPlan("llm_ann_lsh_topk")
    assert(!p.contains("CartesianProduct"), s"cartesian product crept in:\n$p")
    assert(p.contains("Window"), s"top-k no longer via the window path:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }

  test("llm_chunk_windows: zero shuffles — pure per-row generation") {
    val p = finalPlan("llm_chunk_windows")
    assert(shuffles(p) == 0, s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"window explode gone:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }

  test("llm_tfidf_topterms: top-k via WindowGroupLimit, corpus count broadcast, no cartesian data join") {
    val p = finalPlan("llm_tfidf_topterms")
    assert(p.contains("WindowGroupLimit"),
      s"top-k no longer partial before the rank shuffle:\n$p")
    // the ONLY nested-loop join allowed is the 1-row corpus-count
    // broadcast; the term-dictionary join must stay a real join
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }

  test("llm_span_dedup: no cartesian, no token-level anti-join tail") {
    val p = finalPlan("llm_span_dedup")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
    // the reassembly contract: the corpus joins the removed-set table
    // ONCE (left outer); a LeftAnti means the token-explode tail came
    // back
    assert(!p.contains("LeftAnti"), s"token-level anti-join tail returned:\n$p")
    assert(!p.contains("ExistingRDD"), s"RDD scan barrier crept in:\n$p")
  }
}
