package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** H9 `bpe_merges` — byte-pair-encoding merge induction (the
  * tokenizer TRAINING step, beyond D5's frequency counting): starting
  * from character symbols over the word-frequency table, repeatedly
  * count adjacent symbol pairs and merge the most frequent pair
  * (Sennrich et al. 2016 shape). Reference analogue: none — the
  * reference ships no tokenizer; this is the corpus→tokenizer pass an
  * LLM-data pipeline adds.
  *
  * Scale shape: everything runs on the WORD-FREQUENCY table (vocab
  * rows, not corpus rows — the classic BPE trick), so each round is
  * one explode + one map-side-combinable aggregate + a 1-row argmax
  * broadcast back into a map-only `replace`. Rounds are Scala-side
  * (merge count is a tokenizer hyperparameter, inherently sequential)
  * with an eager checkpoint per round — same step-boundary discipline
  * as the GBT horizon loop.
  *
  * Cross-engine determinism: symbols are encoded as a
  * `|a||b||c|`-delimited string; the merge is ONE `replace(syms,
  * "|a||b|", "|ab|")` — both engines scan left-to-right
  * non-overlapping, and the doubled inner delimiter makes a match
  * possible only at whole-symbol boundaries (a leading `|a|` can't
  * start mid-symbol, a trailing `|b|` can't stop mid-symbol), so the
  * greedy merge is bit-identical. Ties on pair count break by (a, b)
  * string order.
  */
object Bpe {

  /** Number of merge rounds learned. */
  val Merges = 3

  /** Learn [[Merges]] merges over `textCol`'s whitespace words.
    * Output: one row per merge — (merge_no, a, b, merged, cnt).
    */
  def merges(docs: DataFrame, textCol: String): DataFrame = {
    // word-frequency table: the only corpus-sized pass
    val words = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("|"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr(
        """substring(concat('|', regexp_replace(w, '(.)', '$1||')), 1,
          |  length(concat('|', regexp_replace(w, '(.)', '$1||'))) - 1)"""
          .stripMargin))
      .select("freq", "syms")

    var cur = words.localCheckpoint(true)
    var out: DataFrame = null
    for (i <- 1 to Merges) {
      // adjacent-pair counts weighted by word frequency
      val pairs = cur
        .withColumn("arr", expr(
          "split(substring(syms, 2, length(syms) - 2), '\\\\|\\\\|')"))
        .withColumn("p", explode(expr(
          "zip_with(slice(arr, 1, size(arr) - 1), " +
            "slice(arr, 2, size(arr) - 1), (x, y) -> struct(x as a, y as b))")))
        .filter(size(col("arr")) > 1)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      val top = pairs
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
        .withColumn("merge_no", lit(i))
        .withColumn("merged", concat(col("a"), col("b")))
        .select("merge_no", "a", "b", "merged", "cnt")
        .localCheckpoint(true)
      out = if (out == null) top else out.unionByName(top)
      // apply the merge: one scalar broadcast into a map-only replace
      cur = cur.crossJoin(broadcast(top.select(col("a").as("m_a"), col("b").as("m_b"))))
        .withColumn("syms", expr(
          "replace(syms, concat('|', m_a, '||', m_b, '|'), " +
            "concat('|', m_a, m_b, '|'))"))
        .select("freq", "syms")
        .localCheckpoint(true)
    }
    out.orderBy("merge_no")
  }
}
