package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram-overlap gate every
  * training-data pipeline runs before training: flag corpus documents
  * sharing any length-n token shingle with a held-out benchmark/eval
  * set (the GPT-3/PaLM-style 13-gram check, parameterized n).
  *
  * Scale shape: the benchmark side is TINY by nature (an eval set vs a
  * 100 TB corpus), so its distinct shingles are broadcast and the
  * corpus is NEVER shuffled — explode corpus shingles, broadcast-hash
  * join, map-side partial count. Cost is one scan of the corpus at
  * shingle fan-out, zero wide exchanges of corpus data.
  */
object Contamination {

  /** Corpus docs that share >= 1 distinct n-gram shingle with any
    * benchmark doc: (idCol, n_hit_shingles). Docs with no overlap are
    * absent (the pipeline drops or audits only the flagged tail).
    */
  def contaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchShingles = bench
      .select(explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .distinct()
    corpus
      .select(col(idCol),
        explode(Text.shingles(Text.tokens(col(textCol)), n)).as("sh"))
      .join(broadcast(benchShingles), "sh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).cast("int").as("n_hit_shingles"))
  }
}
