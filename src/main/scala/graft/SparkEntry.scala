package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Dashboard, EventOps, Insights}
import graft.dedup.{Clusters, DedupQueries, Graph}
import graft.etl.EtlQueries
import graft.pipeline.Corpus
import graft.relational.{AsOf, BloomJoin, Compactor, JoinPlanner, RangeExport, Relational, Sketches, SketchStore, SkewJoin, SnapshotDiff, SnapshotStore, SqlApi, ZOrderExport}
import graft.forecast.ForecastQueries
import graft.sim.{IndexStore, Ivf, Pca, Pq, PqTrained, SimQueries}
import graft.streaming.StreamQueries
import graft.text.{RagQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §2/§6.
  *
  * Each QueryModule contributes (name → query) plus DuckDB oracle SQL;
  * the driver runs every query at sf0.01 and hash-compares against the
  * oracle on the same parquet tables.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    Relational, EtlQueries, Dashboard, Insights, EventOps,
    TextQueries, DedupQueries, SimQueries, RagQueries, ForecastQueries,
    StreamQueries, SqlApi, AsOf, Sketches, SketchStore, SnapshotDiff,
    SnapshotStore, Compactor, RangeExport, ZOrderExport, SkewJoin,
    BloomJoin, JoinPlanner, Ivf, IndexStore,
    Pq, PqTrained, Pca, Clusters, Graph, Corpus)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
