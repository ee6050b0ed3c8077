package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index lifecycle (SURVEY §2 G15): persist a built IVF index to
  * parquet and SERVE from the saved artifact without rebuilding.
  *
  * The session memos give "build once per session"; a deployment
  * needs "build once, period" — a 100 TB assignment pass is an
  * offline job whose output outlives the session that ran it. The
  * saved layout is the classic inverted-file one:
  *
  *  - `centroids/` — the quantizer, O(nLists·d), broadcast at serve
  *    time;
  *  - `lists/` — the listed corpus (vec_id, embedding, nsq)
  *    PARTITIONED BY list_id, so a probe-bounded query reads only
  *    its probed directories (partition pruning at the source, not a
  *    filter after a full scan). Directory count = nLists ≈ √n —
  *    ~31k directories at a billion vectors, well inside what a
  *    file-listing handles, and each directory is one inverted list
  *    read whole, which is exactly the IVF access pattern.
  *
  * Serving contract: the probe set is collected to the driver —
  * O(#queries · nProbe) ids, the serving-size quantity every
  * inverted-file system routes to its scan layer — and pushed into
  * the lists scan as an IN partition filter. This is the ONLY
  * driver-side materialization, and it is bounded by the query
  * batch, never the corpus.
  */
object IndexStore extends graft.QueryModule {

  /** Build (memoized, same as the query path) and persist the
    * given-quantizer index. Overwrites any prior index at `dir`.
    */
  def saveGiven(emb: DataFrame, dir: String): Unit = {
    val (cents, assigned) = Ivf.givenListed(emb)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    // one file per list directory: each inverted list is read whole
    // or not at all, so intra-list splitting only adds tasks
    assigned.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$dir/lists")
  }

  /** The saved listed corpus. Partition-column type inference reads
    * `list_id=` directories back as INT — restore the LONG the fresh
    * path carries (centroid ids are vec_ids) so served output is
    * schema-identical to [[Ivf.knnGivenCentroids]].
    */
  private def loadLists(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lists")
      .withColumn("list_id", col("list_id").cast("long"))

  /** Top-k cosine served from a SAVED index — the same probe-then-
    * re-rank algebra as [[Ivf.knnGivenCentroids]], with the candidate
    * scan bounded by partition pruning instead of a join against the
    * full corpus. Bit-identical to the fresh path on the same corpus:
    * every score uses the same decimal-quantized reductions over the
    * same stored values.
    */
  def servedKnnGiven(spark: SparkSession, dir: String,
      queryPred: Column, k: Int): DataFrame = {
    val lists = loadLists(spark, dir)
    val cents = spark.read.parquet(s"$dir/centroids")
    val queries = lists.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"),
        col("nsq").as("nq"))
    val probeRank = Window.partitionBy("query_id")
      .orderBy(desc("c_cos"), asc("cid"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("c_cos", Vectors.cosineFrom(
        Vectors.dot("eq", "ce"), col("nq"), col("cn")))
      .withColumn("prnk", row_number().over(probeRank))
      .filter(col("prnk") <= Ivf.GivenProbe)
      .select(col("query_id"), col("eq"), col("nq"),
        col("cid").as("list_id"))
    // the driver-collected probe set (see object doc) becomes a
    // partition IN-filter: the scan lists only probed directories
    val probedIds = probes.select("list_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val cand = lists
      .filter(!queryPred && col("list_id").isin(probedIds: _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"),
        col("nsq").as("nc"), col("list_id"))
    val scored = probes.join(cand, "list_id")
      .withColumn("cosine",
        Vectors.cosineFrom(Vectors.dot("eq", "ec"), col("nq"), col("nc")))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "cosine", "neighbor_id",
        Seq("list_id"), k)
      .select("query_id", "rank", "neighbor_id", "cosine", "list_id")
      .orderBy("query_id", "rank")
  }

  // --- driver-query face ---------------------------------------------

  /** Saved-index location for a corpus dir — content-addressed so two
    * corpora never share an index directory (the memo-key lesson:
    * identity must include the source path).
    */
  private[sim] def indexDirFor(sfDir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_saved_$h"
  }

  // save-once-per-(session, corpus) so the serve query measures
  // serving, not a rewrite of the index; evicted per bench sweep so
  // the save is billed as a build, like every other one-time artifact
  private val savedCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  private[graft] def clearCacheForBench(): Unit = {
    savedCache.clear(); savedTfidfCache.clear(); savedPqCache.clear()
  }

  /** Ensure the saved index exists for the driver corpus (bench bills
    * this as the `ivf_saved_index` build).
    */
  def prebuildSaved(spark: SparkSession, dir: String): String =
    savedCache.synchronized {
      savedCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      savedCache.getOrElseUpdate((spark, dir), {
        val ixDir = indexDirFor(dir)
        saveGiven(graft.sources.Tables.embeddings(spark, dir)
          .select("vec_id", "embedding"), ixDir)
        ixDir
      })
    }

  /** G15 gate query — save → load → serve round-trip; the oracle is
    * the SAME SQL as knn_ivf_given_centroids, so the hash gate proves
    * the persisted index serves exactly what the fresh build serves.
    */
  def knnServedQ(spark: SparkSession, dir: String): DataFrame =
    servedKnnGiven(spark, prebuildSaved(spark, dir), col("vec_id") < 5, 3)

  // --- the text-index twin (SURVEY §2 D9) ----------------------------

  private val savedTfidfCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Ensure the saved TF-IDF index over the documents corpus exists
    * (bench bills this as the `tfidf_saved_index` build).
    */
  def prebuildSavedTfidf(spark: SparkSession, dir: String): String =
    savedTfidfCache.synchronized {
      savedTfidfCache.filterInPlace { case ((s, _), _) =>
        !s.sparkContext.isStopped }
      savedTfidfCache.getOrElseUpdate((spark, dir), {
        val ixDir = indexDirFor(dir) + "_tfidf"
        graft.text.Tfidf.save(graft.text.Tfidf.index(
          graft.sources.Tables.documents(spark, dir), "doc_id", "text"), ixDir)
        ixDir
      })
    }

  /** D9 gate query — the retrieval-index round-trip, gated by
    * cosine_topk_docs's oracle verbatim.
    */
  def cosineTopkServedQ(spark: SparkSession, dir: String): DataFrame =
    graft.text.Tfidf.searchSaved(spark, prebuildSavedTfidf(spark, dir),
        graft.text.RagQueries.question, 5)
      .select(col("id").as("doc_id"), col("cosine"))

  // --- the PQ twin (SURVEY §2 G16) -----------------------------------

  private val savedPqCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Ensure the saved PQ artifact exists (bench: `pq_saved_index`). */
  def prebuildSavedPq(spark: SparkSession, dir: String): String =
    savedPqCache.synchronized {
      savedPqCache.filterInPlace { case ((s, _), _) =>
        !s.sparkContext.isStopped }
      savedPqCache.getOrElseUpdate((spark, dir), {
        val ixDir = indexDirFor(dir) + "_pq"
        Pq.save(graft.sources.Tables.embeddings(spark, dir)
          .select("vec_id", "embedding"), ixDir)
        ixDir
      })
    }

  /** G16 gate query — ADC search over the persisted compressed corpus
    * (codes + codebook only, no raw embeddings), gated by knn_pq's
    * oracle verbatim.
    */
  def knnPqServedQ(spark: SparkSession, dir: String): DataFrame = {
    val queries = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    Pq.servedKnn(spark, prebuildSavedPq(spark, dir), queries,
      col("vec_id") >= Pq.QueryIds)
  }

  override def queries: Map[String, Q] = Map(
    "knn_ivf_served" -> (knnServedQ _),
    "cosine_topk_served" -> (cosineTopkServedQ _),
    "knn_pq_served" -> (knnPqServedQ _))

  /** The fresh builds' oracles verbatim: a persisted round-trip must
    * serve exactly what the in-session index serves.
    */
  override def oracles: Map[String, String] = Map(
    "knn_ivf_served" -> Ivf.oracles("knn_ivf_given_centroids"),
    "cosine_topk_served" -> graft.text.RagQueries.oracles("cosine_topk_docs"),
    "knn_pq_served" -> Pq.oracles("knn_pq"))
}
