package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (SURVEY §2 H4) — the
  * Schleimer/Wilkerson/Aiken local algorithm: polynomial rolling
  * k-gram hashes, then the minimum hash in every window of w
  * consecutive k-grams, deduplicated.
  *
  * Relational shape: explode k-gram positions (the explode is an
  * optimizer barrier, so the lowered text is computed once per doc),
  * hash each k-gram with an inlined base-31 polynomial (no modulus:
  * 8 chars × 31^7 fits a long), winnow with a bounded following-rows
  * window, then distinct. The only shuffle is the per-doc window
  * partition — at 100 TB that is the natural partitioning anyway.
  */
object Fingerprint {

  val K = 8 // k-gram length
  val W = 4 // winnow window

  private val khashExpr: String =
    (0 until K).map(j =>
      s"ascii(substring(txt, i + $j, 1)) * ${math.pow(31, K - 1 - j).toLong}L")
      .mkString(" + ")

  /** One row per (id, fingerprint). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kgrams = df
      .select(col(idCol).as("id"), lower(col(textCol)).as("txt"))
      .filter(length(col("txt")) >= K + W - 1)
      .select(col("id"),
        explode(expr(s"sequence(1, length(txt) - ${K - 1})")).as("i"), col("txt"))
      .select(col("id"), col("i"), expr(khashExpr).as("khash"))
    val w = Window.partitionBy("id").orderBy("i")
    val winnowed = kgrams
      .withColumn("wmin", min("khash").over(w.rowsBetween(0, W - 1)))
      .withColumn("n_k", count(lit(1)).over(Window.partitionBy("id")))
      .filter(col("i") <= col("n_k") - (W - 1))
      .select(col("id").as(idCol), col("wmin").as("fingerprint"))
      .distinct()
    winnowed
  }
}
