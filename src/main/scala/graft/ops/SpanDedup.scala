package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style duplicate-span removal: discard all but one occurrence of
  * any n-token span that appears more than once in the corpus
  * (Raffel et al. 2020, "Exploring the Limits of Transfer Learning",
  * §2.2 — C4 keeps one copy of every duplicated three-sentence span;
  * the unit here is an n-token window because the corpus has no
  * sentence structure). The reference repo has no counterpart — this
  * is one of the training-data curation ops the engine adds beyond
  * it.
  *
  * Semantics (deterministic, engine-independent):
  *   - every n-token window of every document is a span; the
  *     canonical occurrence of a span value is the one with the
  *     smallest (doc_id, position),
  *   - every token covered by a NON-canonical occurrence of a span
  *     that occurs elsewhere is removed (overlapping duplicate spans
  *     union their token ranges),
  *   - documents reassemble from the surviving tokens in order;
  *     a document whose every token is covered disappears.
  *
  * Scale shape (the 100-TB question): no all-pairs anywhere.
  *   1. span table: one narrow projection, spans generated per-row
  *      with higher-order array functions (no explode of tokens
  *      first, no window function — stays in whole-stage codegen),
  *   2. canonical occurrence per span value: groupBy(span).min(key) —
  *      partial aggregation combines map-side, so a boilerplate span
  *      repeated 10^9 times ships ONE row per map task to the
  *      reduce side (no skewed single reducer, unlike the
  *      row_number()-over-span formulation),
  *   3. join back on span value fans out linearly in occurrences,
  *   4. removal positions and reassembly are doc-keyed shuffles.
  * Four hash shuffles total, each linear in corpus size.
  *
  * The canonical-occurrence key packs (doc_id, pos) into one BIGINT
  * (doc_id * 2^20 + pos) so the oracle can replay the exact
  * tie-break without struct-ordering subtleties; positions are
  * 1-based and must stay below 2^20 tokens per document (a ~4 MB
  * document at avg 4 chars/token — far above any sane pretraining
  * row; callers chunking bigger blobs should split first).
  */
object SpanDedup {

  private val PosKey = 1L << 20

  /** @param docs   corpus with an id column and a whitespace-joined
    *               text column
    * @param n      span width in tokens (C4 uses three sentences;
    *               default 5 tokens)
    * @return (doc_id, n_kept, text_dedup) — documents with all
    *         non-canonical duplicate spans removed; fully-covered
    *         documents are absent
    */
  def apply(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5): DataFrame = {
    require(n >= 2, s"span width must be >= 2, got $n")

    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("toks"))

    // (doc_id, pos, span): pos is the 1-based index of the span's
    // first token. transform+sequence generates the windows inside
    // one projection.
    val spans = toks
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))"
      )).as(Seq("p0", "span")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("span"))

    val occKey = col("doc_id") * PosKey + col("pos")

    // canonical occurrence per span VALUE — map-side-combining min
    val firsts = spans.groupBy("span")
      .agg(min(occKey).as("first_key"))

    // non-canonical occurrences of spans that occur more than once
    val dups = spans.join(firsts, "span")
      .filter(occKey =!= col("first_key"))

    // token positions covered by any duplicate occurrence
    val removed = dups
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tpos"))
      .distinct()

    val tokens = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("tp0", "tok")))
      .select(col("doc_id"), (col("tp0") + 1).as("tpos"), col("tok"))

    tokens.join(removed, Seq("doc_id", "tpos"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok")),
          " ").as("text_dedup"))
  }
}
