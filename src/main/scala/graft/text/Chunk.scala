package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D6 `doc_chunk` — RAG document chunking with overlap (SURVEY §2 D).
  *
  * The retrieval-prep pass every RAG/training pipeline runs before
  * embedding: each document becomes overlapping fixed-size token
  * windows (chunk i covers tokens [i·stride, i·stride + size)), so a
  * retriever can hit mid-document content without embedding whole
  * docs. Reference analogue: the reference embeds whole insight
  * strings (llm_app/rag_engine.py:37-73); chunking is the step a user
  * adds the day their documents outgrow one embedding.
  *
  * Scale shape: one projection + one `sequence()` explode sized by
  * per-doc chunk count (never data² anything), then `slice` on the
  * already-materialized token array — map-only per document, no
  * shuffle at all until a consumer aggregates. The chunk count is
  * derived with pure integer arithmetic (`1 + (n - size + stride - 1)
  * div stride`) so both engines agree exactly.
  */
object Chunk {

  /** Tokens per chunk. */
  val Size = 64

  /** Token stride between chunk starts (overlap = Size - Stride). */
  val Stride = 48

  /** Chunk `textCol` of `docs` into overlapping token windows.
    *
    * Output: (doc_id, chunk_id, start_tok, n_tok, chunk_text) — one
    * row per chunk, every doc yields ≥ 1 chunk (a short doc is its
    * own single chunk).
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("nc",
        when(col("n") <= Size, lit(1))
          .otherwise(expr(s"1 + cast((n - $Size + ${Stride - 1}) div $Stride as int)")))
      .withColumn("chunk_id", explode(sequence(lit(0), col("nc") - 1)))
      .withColumn("start_tok", col("chunk_id") * Stride)
      .withColumn("chunk", slice(col("toks"), col("start_tok") + 1, lit(Size)))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("chunk")).as("n_tok"),
        array_join(col("chunk"), " ").as("chunk_text"))
}
