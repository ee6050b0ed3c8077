package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** IVF approximate nearest neighbor (SURVEY §2 G2b): a KMeans coarse
  * quantizer partitions the corpus into inverted lists; each query
  * ranks the (tiny, broadcast) centroid table, probes its nProbe
  * nearest lists, and exact-reranks only inside them.
  *
  * Scale shape: probe selection touches nLists rows per query, the
  * candidate join is an equi-join on list_id (co-partitioned), and a
  * query reads ~nProbe/nLists of the corpus — the standard
  * billion-vector inverted-file layout expressed as DataFrames.
  */
object Ivf extends QueryModule {

  val NumLists = 16
  val NProbe = 4

  /** Fraction denominator for quantizer training: vectors whose
    * md5(vec_id) bucket is 0 of [[SampleMod]] train the coarse
    * quantizer (a deterministic ~1/SampleMod sample). A billion-vector
    * corpus never feeds every vector to KMeans — the quantizer only
    * needs enough points to place [[NumLists]] centroids, and the
    * md5 coin keeps the sample a pure function of the data (same
    * discipline as the corpus-split bucketing), not of partitioning.
    */
  val SampleMod = 2

  // The built index (quantizer + listed corpus) memoized per
  // (session, corpus plan): an IVF index is built once and probed by
  // many queries — refitting KMeans per search would dominate serving.
  private val indexCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (org.apache.spark.ml.clustering.KMeansModel, DataFrame)]

  private def index(emb: DataFrame): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    val spark = emb.sparkSession
    val key = (spark, graft.Memo.planKey(emb))
    indexCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    indexCache.synchronized {
      indexCache.get(key) match {
        case Some(hit) => hit
        case None =>
          val feats = graft.Par.spread(emb).withColumn("features",
            array_to_vector(col("embedding").cast("array<double>")))
          // Fit the coarse quantizer on a deterministic md5-sample in a
          // key-hash-partitioned layout with a FIXED partition count:
          // kmeans|| init depends on the input partitioning, so fitting
          // on the parallelism-derived layout makes list assignment
          // (and thus recall) vary with the session's core count. The
          // sample + fixed layout make the model a pure function of
          // (data, seed) — and quantizer training sample-sized.
          val model = new KMeans().setK(NumLists).setSeed(42)
            .setFeaturesCol("features").setPredictionCol("list_id")
            .fit(feats
              .filter(expr(s"conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10) % $SampleMod = 0"))
              .repartition(4, col("vec_id")).sortWithinPartitions("vec_id"))
          // eager checkpoint, not lazy persist: the knn action reads
          // the listed corpus through BOTH the query and candidate
          // filter branches — and the blocks survive clearCache, so
          // a served index never rebuilds mid-session
          val listed = model.transform(feats).drop("features")
            .withColumn("nsq", Vectors.normSq("embedding"))
            .localCheckpoint(true)
          indexCache.put(key, (model, listed))
          (model, listed)
      }
    }
  }

  /** Top-k cosine via nProbe inverted lists. */
  def knn(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (model, listed) = index(emb)

    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val arr = c.toArray.map(_.toFloat)
        (i, arr, c.toArray.map(v => v * v).sum)
      }
      .toSeq.toDF("list_id", "centroid", "c_nsq")

    val queries = listed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"),
        col("nsq").as("nq"))

    // probe selection: nLists rows per query
    val probeRank = Window.partitionBy("query_id")
      .orderBy(desc("c_cos"), asc("list_id"))
    // rank lists by cosine, not raw dot: centroid norms differ, and an
    // un-normalized dot lets one large-norm centroid hijack every
    // query's probe set (query norm is constant per query, so it
    // cannot change the per-query ranking and is skipped)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("c_cos", Vectors.dotFast("eq", "centroid") / sqrt(col("c_nsq")))
      .withColumn("prnk", row_number().over(probeRank))
      .filter(col("prnk") <= NProbe)
      .select("query_id", "eq", "nq", "list_id")

    val cand = listed.filter(!queryPred)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"),
        col("nsq").as("nc"), col("list_id"))

    val scored = probes.join(cand, "list_id")
      .withColumn("cosine",
        Vectors.cosineFrom(Vectors.dot("eq", "ec"), col("nq"), col("nc")))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "cosine", "neighbor_id", Seq("list_id"), k)
      .select("query_id", "rank", "neighbor_id", "cosine", "list_id")
      .orderBy("query_id", "rank")
  }

  def knnIvf(spark: SparkSession, dir: String): DataFrame =
    knn(Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      col("vec_id") < 5, 3)

  /** F10 `semdedup` cosine threshold. */
  val SemDedupTau = 0.45

  /** F10 — SemDeDup (cluster-then-pair semantic dedup, Abbas et al.
    * 2023 shape): the coarse quantizer's inverted lists ARE the
    * clusters, so pairwise cosine runs only within a list — the
    * corpus-wide O(n²) becomes Σ per-list O(m²) with m ≈ n/nLists,
    * and each list's pair join is an equi-join on list_id (no
    * cartesian node). Drop rule: a vector is dropped when an
    * earlier-ordered vector in its list is ≥ τ cosine-similar
    * (deterministic id order stands in for the paper's
    * distance-to-centroid order) — one pair join + one distinct +
    * one left anti-ish flag join, fully parallel, no sequential
    * greedy loop.
    */
  def semdedup(emb: DataFrame): DataFrame = {
    val (_, listed) = index(emb)
    val a = listed.select(col("list_id"), col("vec_id").as("a"),
      col("embedding").as("ea"), col("nsq").as("na"))
    val b = listed.select(col("list_id"), col("vec_id").as("b"),
      col("embedding").as("eb"), col("nsq").as("nb"))
    val dropped = a.join(b, Seq("list_id"))
      .filter(col("a") < col("b"))
      .withColumn("cosine",
        Vectors.cosineFrom(Vectors.dot("ea", "eb"), col("na"), col("nb")))
      .filter(col("cosine") >= SemDedupTau)
      .select(col("b").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    listed.select("vec_id", "list_id")
      .join(dropped, Seq("vec_id"), "left")
      .withColumn("keep", col("dropped").isNull)
      .select("vec_id", "list_id", "keep")
      .orderBy("vec_id")
  }

  def semdedupQ(spark: SparkSession, dir: String): DataFrame =
    semdedup(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  override def queries: Map[String, Q] = Map(
    "knn_ivf" -> (knnIvf _),
    "semdedup" -> (semdedupQ _))

  /** KMeans is not ANSI-SQL-expressible → rows-only driver check. */
  override def oracles: Map[String, String] = Map.empty
}
