package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cleaning + load primitives (reference: etl/main.py:129-207).
  *
  * Each is a thin declarative wrapper so Catalyst sees plain plans:
  * dedup is a hash aggregate over the chosen keys (map-side partial),
  * null-drop is a conjunctive IS NOT NULL filter that pushes to the
  * scan, year parse is a codegen'd cast chain.
  */
object Clean {

  /** drop_duplicates (main.py:132-135). Keys default to all columns. */
  def dedup(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols)

  /** dropna(subset=critical) (main.py:140-143). */
  def dropNaCritical(df: DataFrame, critical: Seq[String]): DataFrame =
    df.na.drop(critical)

  /** pd.to_datetime(format='%Y') (main.py:146): year string → Jan 1 date. */
  def parseYear(df: DataFrame, yearCol: String, out: String): DataFrame =
    df.withColumn(out, to_date(col(yearCol), "yyyy"))

  /** Load modes append / truncate / full-refresh (main.py:166-207),
    * re-expressed as parquet sink modes. `truncate` and `full-refresh`
    * collapse to Overwrite for a file sink.
    */
  def load(df: DataFrame, path: String, mode: String): Unit = {
    val saveMode = mode match {
      case "append" => SaveMode.Append
      case "truncate" | "full-refresh" => SaveMode.Overwrite
      case other => throw new IllegalArgumentException(s"unknown load mode: $other")
    }
    df.write.mode(saveMode).parquet(path)
  }

  /** JDBC sink face (reference etl/main.py:50,167-207 +
    * postgres/init.sql:1-21: SQLAlchemy `to_sql` into Postgres) —
    * the same three-mode contract over Spark's `jdbc` writer, for a
    * migrating user who keeps serving relational dashboards:
    *
    *  - `append`       → INSERT rows (reference `if_exists='append'`)
    *  - `truncate`     → keep the table and its DDL (indexes, grants),
    *                     replace the rows (reference TRUNCATE + append;
    *                     Spark's truncate-overwrite issues TRUNCATE
    *                     TABLE instead of DROP when the dialect allows)
    *  - `full-refresh` → drop + recreate from the frame's schema
    *                     (reference `if_exists='replace'`)
    *
    * Writes go partition-parallel (one connection per task) — the
    * loader saturates the warehouse's ingest side without a driver
    * bottleneck; batch size and isolation ride in `props`.
    */
  def loadJdbc(df: DataFrame, url: String, table: String, mode: String,
      props: java.util.Properties = new java.util.Properties): Unit =
    mode match {
      case "append" =>
        df.write.mode(SaveMode.Append).jdbc(url, table, props)
      case "truncate" =>
        df.write.mode(SaveMode.Overwrite).option("truncate", "true")
          .jdbc(url, table, props)
      case "full-refresh" =>
        df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
      case other =>
        throw new IllegalArgumentException(s"unknown load mode: $other")
    }

  /** Partitioned sink: hive-style directories on `partitionCols` so
    * downstream year/geo filters prune whole partitions at the file
    * index — the layout a 100 TB warehouse table wants. With
    * `dynamic` partition-overwrite, re-loading one partition leaves
    * the others untouched (idempotent incremental refresh).
    */
  def loadPartitioned(df: DataFrame, path: String, mode: String,
      partitionCols: Seq[String]): Unit = {
    val saveMode = mode match {
      case "append" => SaveMode.Append
      case "truncate" | "full-refresh" => SaveMode.Overwrite
      case other => throw new IllegalArgumentException(s"unknown load mode: $other")
    }
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(saveMode).partitionBy(partitionCols: _*).parquet(path)
  }
}
