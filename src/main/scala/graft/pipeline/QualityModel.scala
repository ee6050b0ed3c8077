package graft.pipeline

import scala.collection.concurrent.TrieMap

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L10 — learned corpus filter: a logistic-regression quality
  * classifier DISTILLED from the L2 keep verdict, the production
  * pattern behind fastText-style quality filters (CCNet / FineWeb
  * lineage): run the expensive pipeline (quality gates + exact dedup
  * + MinHash clustering) once over labeled data, fit a cheap linear
  * scorer on per-document surface features, then score any corpus
  * with a map-only projection — no dedup index, no pair joins.
  *
  * Scale shape: the FIT sees only the L1 hash-train-split's feature
  * rows (8 doubles per doc; LBFGS is ~2 combinable-aggregate jobs per
  * iteration), while SCORING is one codegen'd projection — the margin
  * w·x + b over the H2/H5 features — so a 1000-executor run pays one
  * narrow scan per scored document and zero shuffles beyond the H5
  * repetition aggregate.
  *
  * Gate shape (the E5b/GBT discipline): after the fit, the model is
  * just constants — [[marginSql]] renders w·x + b with every weight a
  * CAST('…' AS DOUBLE) literal (strtod-exact both engines) and the
  * sum explicitly left-associated, so Spark evaluates the SAME
  * expression text the DuckDB oracle replays. No transcendentals: the
  * query emits the raw margin and its sign, not sigmoid(margin) —
  * exp() is not bit-portable across engines, the linear margin is.
  */
object QualityModel {

  /** Assembler feature order — also the [[marginSql]] fold order. */
  val featureCols: Seq[String] = Seq(
    "n_chars_m", "n_tokens", "stopword_ratio", "punct_ratio",
    "digit_ratio", "avg_word_len", "repetition_ratio", "top_token_ratio")

  /** Per-document feature frame: the H2 quality profile joined with
    * the H5 repetition profile — both already hash-gated operators,
    * so the feature doubles are proven bit-identical cross-engine.
    * Empty documents are excluded (their ratio features are NULL by
    * the ANSI nullif guards); the oracle applies the same filter.
    */
  def features(docs: DataFrame): DataFrame = {
    val q = graft.text.Analysis
      .quality(graft.Par.spread(docs.select("doc_id", "text")), "text")
      .filter(col("n_chars_m") > 0)
      .select("doc_id", "n_chars_m", "n_tokens", "stopword_ratio",
        "punct_ratio", "digit_ratio", "avg_word_len")
    val r = graft.text.Analysis
      .repetition(graft.Par.spread(docs.select("doc_id", "text")),
        "doc_id", "text")
      .select(col("doc_id"), col("repetition_ratio"),
        col("top_token_ratio"))
    q.join(r, "doc_id")
  }

  private val assembler = new VectorAssembler()
    .setInputCols(featureCols.toArray).setOutputCol("features")

  // keyed like the GBT model cache: session + canonical plan text
  // (file relations compare by reference, so plan-object equality
  // would never hit across two reads of the same parquet)
  private val modelCache =
    TrieMap.empty[(SparkSession, String), Option[LogisticRegressionModel]]

  /** Bench instrumentation only: evict so a sweep re-times the build cold. */
  private[graft] def clearCacheForBench(): Unit = modelCache.clear()

  /** Fit (memoized per docs plan): label = the L2 `keep` verdict,
    * training rows = the L1 md5 train split (bucket < 800) — fit on
    * the split you have verdicts for, score everything. None when the
    * train split is empty (callers degrade to empty results). The
    * fixed key-partitioned layout makes the fitted weights a pure
    * function of the data, not the session's core count.
    */
  private def trained(docs: DataFrame): Option[LogisticRegressionModel] = {
    val key = (docs.sparkSession, graft.Memo.planKey(docs))
    modelCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    modelCache.synchronized {
      modelCache.get(key) match {
        case Some(hit) => hit
        case None =>
          val labels = graft.Profiling.phase("qlr.labels(verdictsOf)") {
            Corpus.verdictsOf(docs)
              .select(col("doc_id"), col("keep").cast("double").as("label"))
          }
          // eagerly materialized ONCE: the emptiness probe and the
          // LBFGS fit's instance build both consume `train`; unchecked
          // that meant running the feature/label join DAG twice (the
          // repartition(4)+sort below fixes the fit's input layout, so
          // checkpointing cannot perturb the fitted weights)
          val train = graft.Profiling.phase("qlr.train_materialize") {
            features(docs)
              .withColumn("bucket", expr(
                """cast(conv(substring(md5(concat('smp|', cast(doc_id as string))),
                  |  1, 8), 16, 10) as bigint) % 1000""".stripMargin))
              .filter(col("bucket") < 800)
              .join(labels, "doc_id")
              .localCheckpoint(true)
          }
          val fit =
            if (graft.Profiling.phase("qlr.train_isEmpty")(train.isEmpty)) None
            else {
              System.err.println("[graft] training quality LR filter")
              // 50 LBFGS iterations at tol 1e-6: the fit is ~2 jobs
              // per iteration over combinable gradient sums, so at
              // panel size ITERATION COUNT — not data volume — is the
              // build's wall-clock; the margin's sign is stable well
              // before 1e-6
              Some(graft.Profiling.phase("qlr.lbfgs_fit") {
                new LogisticRegression()
                .setLabelCol("label").setFeaturesCol("features")
                .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.0)
                .setTol(1e-6)
                .fit(assembler.transform(train)
                  .repartition(4, col("doc_id"))
                  .sortWithinPartitions("doc_id"))})
            }
          modelCache.put(key, fit)
          fit
      }
    }
  }

  /** Force the fit (Bench bills it in the builds section). */
  def prebuild(docs: DataFrame): Unit = { trained(docs); () }

  /** The fitted model — exposed so the query can render its weights
    * into oracle SQL; None on an untrainable corpus.
    */
  def modelFor(docs: DataFrame): Option[LogisticRegressionModel] =
    trained(docs)

  /** Render the fitted margin w·x + b as ONE engine-neutral SQL
    * scalar: intercept first, then the [[featureCols]] terms in
    * order, explicitly left-associated, every constant a
    * CAST('…' AS DOUBLE) string literal (a bare numeric literal
    * parses as DECIMAL and DuckDB's decimal→double cast misrounds).
    */
  def marginSql(model: LogisticRegressionModel): String = {
    def dlit(d: Double): String = s"CAST('$d' AS DOUBLE)"
    val terms = featureCols.zip(model.coefficients.toArray)
      .map { case (f, w) => s"(${dlit(w)} * $f)" }
    (dlit(model.intercept) +: terms).reduceLeft((a, b) => s"($a + $b)")
  }

  private def emptyResult(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit(0d).as("margin"),
      lit(false).as("pred_keep")).limit(0)

  /** The gated scoring path: every document scored by the rendered
    * margin expression — the exact text the oracle replays.
    */
  def classifyGiven(docs: DataFrame): DataFrame = trained(docs) match {
    case Some(m) =>
      features(docs)
        .withColumn("margin", expr(marginSql(m)))
        .withColumn("pred_keep", col("margin") > 0)
        .select("doc_id", "margin", "pred_keep")
    case None => emptyResult(docs)
  }

  /** The ml-native scoring path (model.transform) — same margins up
    * to BLAS dot association; the parity spec pins the two paths
    * together, the gate runs on [[classifyGiven]].
    */
  def classify(docs: DataFrame): DataFrame = trained(docs) match {
    case Some(m) =>
      m.transform(assembler.transform(features(docs)))
        .withColumn("margin", vector_to_array(col("rawPrediction")).getItem(1))
        .withColumn("pred_keep", col("prediction") === 1.0)
        .select("doc_id", "margin", "pred_keep")
    case None => emptyResult(docs)
  }
}
