package graft.text

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TF-IDF + cosine retrieval (SURVEY §2 D; reference:
  * llm_app/rag_engine.py — sklearn TfidfVectorizer + cosine top-k).
  *
  * Relational formulation: one (doc, term, tf) row per posting, doc
  * frequencies from one aggregate, smooth idf `ln((1+N)/(1+df)) + 1`
  * (sklearn's smooth_idf) quantized to 9 decimals so both engines'
  * `ln` agree bit-for-bit after the cast. Query↔doc cosine is a
  * sparse dot: join on term — co-partitioned, no dense vectors
  * anywhere, which is what makes this run at 100 TB corpus size (the
  * vocabulary aggregate and the query vector broadcast; the posting
  * join shuffles on term once).
  *
  * The corpus-side build (postings → idf → weights → norms) is
  * packaged as a [[TfidfIndex]], memoized per (session, corpus):
  * repeated searches — or different operators over the same corpus in
  * one session — reuse one persisted build instead of re-deriving the
  * chain per query. N rides along the idf aggregate as a broadcast
  * 1-row count, so indexing triggers no separate driver-side action.
  */
object Tfidf {

  /** Stopwords removed before n-gram construction, as sklearn does. */
  val stopwords: Seq[String] = Analysis.stopwords

  /** (id, term, tf) postings with the reference's vectorizer
    * semantics (rag_engine.py:29-32): alphanumeric-run tokens,
    * stopword removal, then unigrams + bigrams.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    // One generator produces unigrams + bigrams. Bigrams pair the
    // token array with its shifted self via zip_with — NOT per-index
    // element_at lambdas, which re-evaluate the array expression per
    // element. The tokenizer appears a constant number of times in
    // the generator tree (per-row cost), and no window/union/extra
    // shuffle is needed.
    val tk =
      s"""filter(split(lower($textCol), '[^a-z0-9]+'),
         |  t -> length(t) > 0 AND NOT t IN ($stopList))""".stripMargin
    // The token array materializes in a projection BELOW the explode:
    // the generator references it as a bound column, so the
    // split+stopword pass runs once per row — inlining `tk` into the
    // generator would evaluate it three times (concat, zip_with,
    // slice). Project-under-Generate is not collapsed into the
    // generator expression, so the single evaluation survives the
    // optimizer.
    docs.select(col(idCol).as("id"), expr(tk).as("ts"))
      .select(col("id"), explode(expr(
        """concat(ts,
           |  filter(zip_with(ts, slice(ts, 2, greatest(size(ts) - 1, 0)),
           |                  (a, b) -> concat(a, ' ', b)),
           |         x -> x IS NOT NULL))""".stripMargin)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
  }

  /** (term, df, idf) with sklearn smooth idf, decimal-quantized.
    * The corpus size joins in as a broadcast 1-row aggregate — no
    * separate `docs.count()` action/scan.
    */
  def idf(postings: DataFrame, docs: DataFrame): DataFrame =
    postings.groupBy("term")
      // postings is an aggregate keyed on (id, term): ids are already
      // distinct within a term, so a plain count IS the document
      // frequency — countDistinct would add a whole dedup exchange
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .withColumn("idf", expr(
        "cast(cast(ln((1.0 + n_docs) / (1.0 + df)) + 1.0 as decimal(18,9)) as double)"))
      .select("term", "df", "idf")

  /** (id, term, w) weighted postings. The idf side is VOCAB-sized
    * (unigrams + bigrams — billions of terms at corpus scale), so no
    * broadcast hint: both sides key on term, and the co-partitioned
    * shuffle join is linear in postings. Catalyst still broadcasts
    * on its own when the vocab measures small. (A forced broadcast
    * here was the one superlinear knee StressBench ×12→×24 found:
    * 15.9 → 53.6 s — the substituted stress corpus multiplies the
    * vocab, and the broadcast build cost grows with it.)
    */
  def weights(postings: DataFrame, idf: DataFrame): DataFrame =
    postings.join(idf, "term")
      .select(col("id"), col("term"),
        (col("tf") * col("idf")).as("w"))

  /** Quantized-exact L2 norm per id over sparse weights. */
  def norms(weights: DataFrame): DataFrame =
    weights.groupBy("id")
      .agg(expr("cast(sum(cast(w * w as decimal(24,8))) as double)").as("nsq"))

  // plan keyed by its canonicalized TEXT — file-source relations
  // compare by reference, so plan-object equality would always miss
  private val indexCache =
    TrieMap.empty[(SparkSession, String, String, String), TfidfIndex]

  /** Bench instrumentation only: evict so a sweep re-times the build cold. */
  private[graft] def clearCacheForBench(): Unit = indexCache.clear()

  /** The memoized corpus index, lazily localCheckpoint'ed: unlike
    * `persist()`, the materialized blocks live outside the SQL cache
    * manager, so `catalog.clearCache()` between queries doesn't force
    * a rebuild — the index survives for the session's lifetime, which
    * is exactly the sharing a retrieval index wants. (On a real
    * cluster the blocks are executor-local; an executor loss would
    * cost a rebuild of that partition's lineage-truncated blocks, the
    * standard localCheckpoint trade — a long-lived serving index
    * would use a reliable checkpoint dir instead.) Entries of stopped
    * sessions are evicted; the build is serialized so concurrent
    * first calls can't double-build.
    */
  def index(docs: DataFrame, idCol: String, textCol: String): TfidfIndex = {
    val key = (docs.sparkSession, graft.Memo.planKey(docs), idCol, textCol)
    indexCache.filterInPlace { case ((s, _, _, _), _) => !s.sparkContext.isStopped }
    indexCache.synchronized {
      indexCache.get(key) match {
        case Some(ix) => ix
        case None =>
          // EAGER checkpoints, built in dependency order: a lazy
          // checkpoint materializes on the consumer's first action,
          // and that action's plan reads `p` through several branches
          // (weights, dl, idf) — each branch recomputes the postings
          // chain while the blocks are still filling (the same
          // per-branch-scan trap as the CC edge input). Eager = one
          // build each, every downstream branch reads blocks.
          val p = postings(docs, idCol, textCol).localCheckpoint(true)
          val i = idf(p, docs).localCheckpoint(true)
          val w = weights(p, i).localCheckpoint(true)
          val ix = TfidfIndex(docs, idCol, textCol, p, i, w,
            norms(w).localCheckpoint(true))
          indexCache.put(key, ix)
          ix
      }
    }
  }

  /** Cosine top-k of `queryText` against the corpus (memoized
    * index under the hood).
    */
  def searchTopK(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, queryText: String, k: Int): DataFrame =
    index(docs, idCol, textCol).searchTopK(queryText, k)

  /** Persist a built index for cross-session serving (SURVEY §2 D9):
    * the weights table is CLUSTERED BY term (repartition + sort) so a
    * serve-time query's term IN-filter prunes row groups — the scan
    * reads ~|query terms| / |vocab| of the index, not all of it.
    *
    * Two layers on disk:
    *  - ADDITIVE BASE: `postings` (id, term, tf — term-clustered).
    *    The ONLY ground truth — what an append merges exactly.
    *  - DERIVED: `stats` (n_docs), `idf`, `weights`, `norms` — pure
    *    arithmetic over the base. tf-idf's GLOBAL idf couples every
    *    document's weights and norm to the corpus df/n_docs, so an
    *    append rewrites these from the merged base ([[rederiveSaved]])
    *    — arithmetic only, never re-tokenizing the old corpus.
    *    (Contrast BM25, whose doc-side stats are append-local — the
    *    reason Lucene serves BM25; see [[Bm25.appendSaved]].)
    */
  def save(ix: TfidfIndex, dir: String): Unit = {
    ix.postings.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/postings")
    // the saved index's n_docs counts INDEXED documents (one norms
    // row per doc with ≥1 term) — the quantity [[rederiveSaved]]
    // re-derives from the additive base alone, which is what makes
    // stats crash-reconstructible (the r17 ADVICE item: a stats
    // value only an append could know is a stats value a crashed
    // append loses). The serve itself never reads stats (idf is a
    // stored layer); it exists as the layout's exported corpus-size
    // METADATA — what a catalog or ingest monitor reads without
    // scanning postings (the J23 ingest spec pins replay-no-op on
    // it). A zero-term document is invisible to the index —
    // sklearn's N would count it; this layout, like Lucene's
    // numDocs, cannot and does not.
    ix.norms.agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    ix.idf.write.mode("overwrite").parquet(s"$dir/idf")
    ix.weights.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/weights")
    ix.norms.write.mode("overwrite").parquet(s"$dir/norms")
  }

  private def loadPostings(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema("id BIGINT, term STRING, tf BIGINT")
      .parquet(s"$dir/postings")

  /** D9 maintenance — append NEW documents (ids not already indexed;
    * the G18 arrival contract) to a saved index: tokenize ONLY the
    * batch, append its postings to the additive base, then
    * [[rederiveSaved]] — which re-derives `stats` and the idf-coupled
    * layers from the base alone. Serving after this equals a fresh
    * index over the union corpus exactly (spec-pinned): postings are
    * per-document facts and every derived value is a pure function of
    * the merged postings. Crash contract: the recovery for ANY
    * interruption after the postings append landed is to re-run
    * [[rederiveSaved]] — since stats derive from postings, the re-run
    * repairs n_docs too (the r17 ADVICE window, where a crash between
    * a postings append and a stats bump left rederive baking the
    * stale count, is gone: there is no stored value the base cannot
    * reconstruct). The residual window is the postings append job
    * itself: a crash MID-append can land a prefix of the batch's
    * files, and re-delivering the whole batch would duplicate its
    * landed rows — at-least-once feeds must come through the
    * batch-marker face ([[graft.streaming.Streaming]]'s ingest
    * streams), which skips a batch whose marker committed.
    */
  def appendSaved(newDocs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val spark = newDocs.sparkSession
    postings(newDocs, idCol, textCol)
      .repartition(col("term")).sortWithinPartitions("term")
      .write.mode("append").parquet(s"$dir/postings")
    rederiveSaved(spark, dir)
  }

  /** [[appendSaved]] guarded by a batch-id marker (the
    * SnapshotStore.applyDiffOnce discipline): an at-least-once
    * re-delivered batch — the Structured Streaming foreachBatch
    * contract — is a no-op instead of appending duplicate postings.
    * This is the entry [[graft.streaming.Streaming.tfidfIngestStream]]
    * uses. Residual window (the applyDiffOnce caveat): the marker
    * lands after the postings append and the rederive — a crash in
    * between means the replay re-appends the whole batch; closable
    * only by a transactional manifest. Note the rederive makes each
    * batch cost O(index) ARITHMETIC (tf-idf's global idf couples all
    * weights — the [[save]] header's trade); a high-frequency feed
    * belongs on the BM25 index, whose append is O(batch).
    */
  def appendSavedOnce(newDocs: DataFrame, idCol: String,
      textCol: String, dir: String, batchId: Long): Unit =
    graft.FsOps.onceByMarker(
      graft.FsOps.fs(newDocs.sparkSession, dir), dir, batchId) {
      appendSaved(newDocs, idCol, textCol, dir)
    }

  /** Rebuild everything DERIVED (`stats`, `idf`, `weights`, `norms`)
    * from the additive base — one linear arithmetic pass over the
    * stored postings, no tokenization. n_docs is count(distinct id)
    * over the postings themselves (the indexed-document count the
    * saved layout defines — see [[save]]), so this is a TOTAL
    * recovery: idempotent, and correct from any half-landed append
    * or delete state.
    */
  def rederiveSaved(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val p = loadPostings(spark, dir)
    // postings are keyed (id, term): distinct ids = indexed docs.
    // One aggregate over the base — the price of stats being
    // derived, paid only at maintenance time, never at serve.
    val n = p.select("id").distinct().count()
    val fs = graft.FsOps.fs(spark, dir)
    Seq(n).toDF("n_docs").write.mode("overwrite")
      .parquet(s"$dir/stats_staged")
    graft.FsOps.swapDir(fs, s"$dir/stats_staged", s"$dir/stats")
    // the same decimal-quantized expression as [[idf]], with the
    // corpus size from the derived count instead of a docs aggregate
    val i = p.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("n_docs", lit(n))
      .withColumn("idf", expr(
        "cast(cast(ln((1.0 + n_docs) / (1.0 + df)) + 1.0 as decimal(18,9)) as double)"))
      .select("term", "df", "idf")
      .localCheckpoint(true) // consumed by its own write AND weights
    val w = weights(p, i).localCheckpoint(true)
    i.write.mode("overwrite").parquet(s"$dir/idf_staged")
    graft.FsOps.swapDir(fs, s"$dir/idf_staged", s"$dir/idf")
    w.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/weights_staged")
    graft.FsOps.swapDir(fs, s"$dir/weights_staged", s"$dir/weights")
    norms(w).write.mode("overwrite").parquet(s"$dir/norms_staged")
    graft.FsOps.swapDir(fs, s"$dir/norms_staged", s"$dir/norms")
  }

  /** D9 maintenance — DELETE documents from a saved index: the global
    * smooth idf couples every document's weights and norm to
    * df/n_docs, so a delete rewrites the additive base minus the docs
    * (one staged swap — no tokenization; contrast [[Bm25.deleteSaved]]
    * whose tombstones make delete O(batch)), then [[rederiveSaved]]s
    * `stats` and the arithmetic layers from the rewritten base.
    * Served-after-delete equals a fresh index over the remaining
    * corpus exactly (spec-pinned), and the postings swap is the only
    * commit point — a crash anywhere after it recovers by re-running
    * rederiveSaved. Contract: only indexed documents are tracked — a
    * zero-term document is invisible to the index and cannot be
    * deleted from it.
    */
  def deleteSaved(ids: DataFrame, dir: String): Unit = {
    val spark = ids.sparkSession
    val del = ids.select(col("id")).distinct().localCheckpoint(true)
    val p = loadPostings(spark, dir)
    if (p.join(del, "id").isEmpty) return
    val fs = graft.FsOps.fs(spark, dir)
    p.join(del, Seq("id"), "left_anti")
      .repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/postings_staged")
    graft.FsOps.swapDir(fs, s"$dir/postings_staged", s"$dir/postings")
    rederiveSaved(spark, dir)
  }

  /** D9 maintenance — compact the additive base: each append lays one
    * file set into `postings`, so a long-lived index accumulates
    * small files; rewrite term-clustered via a staged swap. Serving
    * is unchanged (the derived layers are already whole).
    */
  def compactSaved(spark: SparkSession, dir: String): Unit = {
    val p = loadPostings(spark, dir)
    p.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/postings_staged")
    graft.FsOps.swapDir(graft.FsOps.fs(spark, dir),
      s"$dir/postings_staged", s"$dir/postings")
  }

  /** Cosine top-k served from a SAVED index — the same algebra as
    * [[TfidfIndex.searchTopK]] over the loaded frames, bit-identical
    * on the same corpus, with one serve-time addition: the query's
    * term set (a driver-side quantity — one string's tokens) is
    * collected and pushed into the weights scan, so the
    * term-clustered file serves the query from a handful of row
    * groups. The filter is semantics-preserving: the inner join on
    * term already restricts to query terms.
    */
  def searchSaved(spark: SparkSession, dir: String, queryText: String,
      k: Int): DataFrame = {
    import spark.implicits._
    val idfT = spark.read.parquet(s"$dir/idf")
    val weightsT = spark.read.parquet(s"$dir/weights")
    val normsT = spark.read.parquet(s"$dir/norms")
    val qp = postings(Seq((0L, queryText)).toDF("id", "text"), "id", "text")
    val qw = weights(qp, idfT).select(col("term"), col("w").as("qw"))
    val qn = norms(qw.select(lit(0L).as("id"), col("term"), col("qw").as("w")))
      .select(col("nsq").as("qnsq"))
    val qTerms = qw.select("term").distinct().as[String].collect().toSeq
    val dots = weightsT.filter(col("term").isin(qTerms: _*))
      .join(broadcast(qw), "term")
      .groupBy("id")
      .agg(expr("cast(sum(cast(w * qw as decimal(24,8))) as double)").as("dot"))
    dots.join(normsT, "id").crossJoin(broadcast(qn))
      .withColumn("cosine", col("dot") / (sqrt(col("nsq")) * sqrt(col("qnsq"))))
      .select(col("id"), col("cosine"))
      .orderBy(desc("cosine"), asc("id"))
      .limit(k)
  }
}

/** A built (persisted) TF-IDF index over one corpus. */
final case class TfidfIndex(docs: DataFrame, idCol: String, textCol: String,
    postings: DataFrame, idf: DataFrame, weights: DataFrame, norms: DataFrame) {

  /** Cosine top-k against the indexed corpus: the query vector
    * weights/norm broadcast; the posting join is the only shuffle.
    */
  def searchTopK(queryText: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qp = Tfidf.postings(
      Seq((0L, queryText)).toDF(idCol, textCol), idCol, textCol)
    val qw = Tfidf.weights(qp, idf)
      .select(col("term"), col("w").as("qw"))
    val qn = Tfidf.norms(qw.select(lit(0L).as("id"), col("term"), col("qw").as("w")))
      .select(col("nsq").as("qnsq"))
    val dots = weights.join(broadcast(qw), "term")
      .groupBy("id")
      .agg(expr("cast(sum(cast(w * qw as decimal(24,8))) as double)").as("dot"))
    dots.join(norms, "id").crossJoin(broadcast(qn))
      .withColumn("cosine", col("dot") / (sqrt(col("nsq")) * sqrt(col("qnsq"))))
      .select(col("id"), col("cosine"))
      .orderBy(desc("cosine"), asc("id"))
      .limit(k)
  }
}
