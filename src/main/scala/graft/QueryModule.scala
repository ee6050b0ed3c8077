package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Contract (driver compare): the oracle runs in DuckDB over the same
  * parquet tables; columns are sorted by NAME before value hashing, so
  * every computed column is aliased identically on both sides, every
  * float aggregate is `round(_, 2)`-ed on both sides (double summation
  * order differs between engines), and both sides carry a
  * deterministic total ORDER BY.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
