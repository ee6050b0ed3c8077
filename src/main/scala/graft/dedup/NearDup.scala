package graft.dedup

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** The shared near-duplicate index over one corpus: verified MinHash
  * pair set and its connected-component labels, memoized per
  * (session, corpus plan, tau).
  *
  * dedup_minhash, dedup_clusters and corpus_clean all consume the
  * same shingle → MinHash → LSH-bucket → exact-Jaccard chain; without
  * sharing, each re-derives it from the raw corpus — at 100 TB that
  * is the dominant cost paid three times. The chain's RESULTS are
  * tiny (O(#near-dup docs) rows), so they are eagerly
  * localCheckpoint'ed: materialized once, lineage truncated, blocks
  * outside the SQL cache manager so `catalog.clearCache()` between
  * queries doesn't force a rebuild. Labels are computed lazily — a
  * pairs-only consumer never pays for the component iteration.
  *
  * (Executor-local checkpoint blocks are the standard trade: an
  * executor loss costs a rebuild; a long-lived serving index would
  * use a reliable checkpoint dir.)
  */
object NearDup {

  /** sets = per-doc shingle arrays (the exact-verify side — partitioned
    * on doc_id, the layout a serving index keeps it in), sigs = per-doc
    * MinHash signatures (32 longs/doc — tiny), pairs = the verified
    * near-dup pair set.
    */
  final class Index private[NearDup] (val sets: DataFrame,
      val sigs: DataFrame, val pairs: DataFrame) {
    /** Connected-component labels (doc_id, cluster) over the pair
      * graph — built on first use, checkpointed like the pairs.
      */
    lazy val labels: DataFrame =
      Clusters.connectedComponents(pairs).localCheckpoint(true)
  }

  private val cache = TrieMap.empty[(SparkSession, String, Double), Index]

  /** Bench instrumentation only: evict so a sweep re-times the build cold. */
  private[graft] def clearCacheForBench(): Unit = cache.clear()

  /** The memoized index for a (doc_id, text) corpus at threshold tau. */
  def index(docs: DataFrame, tau: Double = 0.5): Index = {
    val key = (docs.sparkSession, graft.Memo.planKey(docs), tau)
    cache.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    cache.synchronized {
      cache.get(key) match {
        case Some(ix) => ix
        case None =>
          // each stage materializes EAGERLY before the next consumes
          // it: the pair build reads sets through three plan branches
          // (signatures + both verify sides) — under a lazy persist
          // each branch would re-run the shingle chain while the
          // cache fills
          val sh = graft.Profiling.phase("neardup.shingleSets") {
            Dedup.shingleSets(docs, "doc_id", "text")
              .localCheckpoint(true) }
          val sigs = graft.Profiling.phase("neardup.sigs") {
            Dedup.minhashSigs(sh).localCheckpoint(true) }
          val cand = graft.Profiling.phase("neardup.cand") {
            Dedup.bucketPairs(Dedup.bandBuckets(sigs))
              .localCheckpoint(true) }
          val pairs = graft.Profiling.phase("neardup.verify") {
            Dedup.jaccardVerify(cand, sh, tau)
              .localCheckpoint(true) }
          val ix = new Index(sh, sigs, pairs)
          cache.put(key, ix)
          ix
      }
    }
  }
}
