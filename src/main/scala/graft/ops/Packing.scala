package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus → training-stream layout: deterministic shuffle order,
  * sharding, concat-and-chunk sequence packing, and per-source token
  * budgets. Everything is a pure function of the input ids, so a
  * resumed or re-run job reproduces the identical layout — the
  * property that lets a 100 TB curation run checkpoint and continue.
  *
  * Scale shape: one hash shuffle per operator (the shard/source
  * window); parallelism = shard/source count, so at cluster scale the
  * caller passes thousands of shards, not the test default.
  */
object Packing {

  /** Deterministic epoch-shuffle order: md5 of the id; a non-zero
    * seed (epoch number) re-rolls the order reproducibly.
    */
  def shuffleOrder(id: Column, seed: Long = 0L): Column =
    if (seed == 0L) md5(id.cast("string"))
    else md5(concat(id.cast("string"), lit("#"), lit(seed).cast("string")))

  /** Concat-and-chunk packing: assigns every doc a shard and its
    * (seq_id, offset) position in that shard's packed stream of
    * fixed `seqLen`-token sequences. Docs spanning a boundary start
    * at `offset` and continue into the next sequence (GPT-style
    * packing; the trainer's reader handles the spill).
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCountCol: String,
      nShards: Int, seqLen: Long, seed: Long = 0L): DataFrame = {
    require(nShards > 0 && seqLen > 0, "nShards and seqLen must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("_ord", shuffleOrder(col(idCol), seed))
      // bound the id BEFORE the Knuth multiply (|id % 1e9+7| * 2.65e9
      // < Long.Max, so no ANSI overflow at any id) and pmod so
      // negative ids still land in 0..nShards-1
      .withColumn("shard",
        pmod((col(idCol) % lit(1000000007L)) * lit(2654435761L), lit(nShards.toLong)))
      .withColumn("cum_before",
        sum(col(tokenCountCol)).over(w) - col(tokenCountCol))
      .withColumn("seq_id", expr(s"cum_before div ${seqLen}L"))
      .withColumn("offset", col("cum_before") % seqLen)
      .drop("_ord")
  }

  /** Per-source token budget: keeps a doc while its source's RUNNING
    * token total (in deterministic order) is under `budget`. Stable
    * under re-runs and late additions — anything that sorts after the
    * cut can never evict what was already kept.
    */
  def capPerSource(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCountCol: String, budget: Long, seed: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("_ord", shuffleOrder(col(idCol), seed))
      .withColumn("cum_before",
        sum(col(tokenCountCol)).over(w) - col(tokenCountCol))
      .filter(col("cum_before") < budget)
      .drop("_ord")
  }

  /** Temperature-flattened source mixing: deterministically sample
    * each source at a rate proportional to m^(alpha-1) relative to
    * the LARGEST source (token masses m; alpha < 1 keeps
    * proportionally more of the smaller sources, flattening the mix
    * toward uniform — the standard multilingual/source rebalancing
    * move). The largest source keeps `baseRate` of its docs; source s
    * keeps min(1, baseRate * (m_max / m_s)^(1-alpha)).
    *
    * Everything is engine-reproducible by construction:
    *   - the per-doc coin is the first 52 bits of md5(id) scaled to
    *     [0,1) — exact in a double, identical in any engine,
    *   - rates use only division and sqrt (alpha = 0.5), both IEEE
    *     correctly-rounded, and m_max comes from max() — no
    *     float accumulation whose ORDER could differ across engines.
    *     (Other alphas go through pow(), which libms round
    *     differently at the last ulp — boundary docs could then flip;
    *     the oracle gate pins alpha = 0.5.)
    *
    * Scale shape: one tiny per-source aggregate broadcast back over
    * the corpus; the keep-decision is a codegen'd filter at scan
    * speed.
    */
  def temperatureSample(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCountCol: String, alpha: Double = 0.5, baseRate: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(baseRate > 0 && baseRate <= 1, s"baseRate in (0,1], got $baseRate")
    val masses = docs.groupBy(col(sourceCol))
      .agg(sum(col(tokenCountCol)).as("_mass"))
    val maxMass = masses.agg(max(col("_mass")).as("_max_mass"))
    val ratio = col("_max_mass").cast("double") / col("_mass").cast("double")
    val flat =
      if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, lit(1.0 - alpha))
    val rates = masses.crossJoin(broadcast(maxMass))
      .withColumn("_rate", least(lit(1.0), lit(baseRate) * flat))
    // 52-bit md5 prefix -> exact double in [0,1)
    val u = expr(s"cast(conv(substring(md5(concat(cast(`$idCol` as string), " +
      s"'#mix')), 1, 13), 16, 10) as long)").cast("double") /
      lit(4503599627370496.0)
    docs.join(broadcast(rates.select(col(sourceCol), col("_rate"))), sourceCol)
      .filter(u < col("_rate"))
      .withColumn("keep_rate", round(col("_rate"), 6))
      .drop("_rate")
  }

  /** Sliding-window chunking: split each document's token stream into
    * `window`-token chunks every `stride` tokens (overlap =
    * window - stride), the standard long-document treatment before
    * tokenize-and-pack. A document of n tokens yields
    * 1 chunk when n <= window, else ceil((n - window) / stride) + 1 —
    * every token is covered and the final chunk is the only one
    * allowed to run short.
    *
    * Scale shape: zero shuffles — windows are generated per-row with
    * transform+sequence inside one projection and exploded; cost is
    * the ~window/stride output amplification, nothing else.
    *
    * @return (doc_id, chunk_id, n_tokens, chunk_text), chunk_id
    *         0-based in document order
    */
  def chunkWindows(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 512, stride: Int = 384): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("n_chunks",
        when(size(col("toks")) <= window, lit(1))
          .otherwise(expr(
            s"cast((size(toks) - $window + $stride - 1) div $stride as int) + 1")))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, n_chunks - 1), k -> slice(toks, 1 + k * $stride, $window))"
      )).as(Seq("chunk_id", "chunk_toks")))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
  }
}
