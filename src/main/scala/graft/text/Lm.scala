package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring (SURVEY §2 H7) — the
  * perplexity-style quality filter an LLM data pipeline runs over its
  * corpus (score docs under a small LM trained on trusted text, drop
  * the tail): add-one-smoothed bigram log-probabilities,
  *
  *   logp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1) + V))
  *
  * trained on the deterministic train split and scored over every
  * document.
  *
  * Scale shape: counts are two hash aggregates over exploded token
  * rows (map-side combinable); scoring joins each doc bigram against
  * the count tables on the bigram/unigram key — co-partitioned
  * equi-joins, no per-doc driver work. Vocabulary size rides along as
  * a broadcast 1-row aggregate.
  *
  * FP parity (see README): the ln argument is an exact integer-ratio
  * double on both engines, each ln is quantized to decimal(18,9)
  * (the idf discipline), per-doc sums add exactly as decimals, and
  * the average divides two bit-identical values.
  */
object Lm {

  /** (doc_id, bucket, ws) token arrays with the corpus_sample coin. */
  private def toks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), " ").as("ws"))
      .withColumn("bucket", expr(
        """cast(conv(substring(md5(concat('smp|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000""".stripMargin))

  /** (doc_id, bucket, w1, w2) bigram rows (zip_with the shifted
    * self; short docs yield no rows, never an index error).
    */
  private def bigrams(t: DataFrame): DataFrame =
    t.select(col("doc_id"), col("bucket"), explode(expr(
        """filter(zip_with(ws, slice(ws, 2, greatest(size(ws) - 1, 0)),
          |  (a, b) -> named_struct('w1', a, 'w2', b)), p -> p.w2 IS NOT NULL)"""
          .stripMargin)).as("p"))
      .select(col("doc_id"), col("bucket"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Per-document LM score: (doc_id, n_bigrams, sum_logp, avg_logp),
    * docs with at least one bigram. Counts come from the train split
    * (bucket < 800), scores cover every document.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(docs, idCol, textCol)
    val bi = bigrams(t)
    val trainBi = bi.filter(col("bucket") < 800)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val trainUni = t.filter(col("bucket") < 800)
      .select(explode(col("ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = broadcast(trainUni.agg(count(lit(1)).as("v")))
    bi.join(trainBi, Seq("w1", "w2"), "left")
      .join(trainUni, Seq("w1"), "left")
      .crossJoin(vocab)
      .withColumn("logp", expr(
        """cast(cast(ln(cast(coalesce(cb, 0L) + 1 as double)
          |              / cast(coalesce(cu, 0L) + v as double))
          |     as decimal(18,9)) as double)""".stripMargin))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("cast(sum(cast(logp as decimal(24,9))) as double)").as("sum_logp"))
      .withColumn("avg_logp", col("sum_logp") / col("n_bigrams"))
      .select("doc_id", "n_bigrams", "sum_logp", "avg_logp")
  }
}
