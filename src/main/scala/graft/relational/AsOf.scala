package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** As-of join and skew-salted join (SURVEY §2 K11/K12).
  *
  * As-of is composed from existing operators (the preferred path
  * before custom plans): a single ordered window per key with
  * `last(_, ignoreNulls)` carries the most recent matching event
  * forward — one shuffle on the key, no range cross-join, no custom
  * SparkPlan needed for this semantics.
  *
  * Salted join: when one join key dominates (power-law keys at
  * 100 TB), explode the small side over `salt` replicas and
  * randomize— here deterministically spread — the big side's salt, so
  * one hot key fans across `salt` reducers instead of one.
  */
object AsOf extends QueryModule {

  /** For every row, the latest `valueCol` from rows satisfying
    * `matchCond` at or before it (per key, ordered by `timeCol`).
    */
  def lastMatchingBefore(df: DataFrame, key: String, orderCols: Seq[String],
      matchCond: Column, valueCol: Column, out: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(out, last(when(matchCond, valueCol), ignoreNulls = true).over(w))
  }

  /** K11 — each click event joined as-of to the user's most recent
    * purchase (µs-exact; see Streaming note on DuckDB timestamps).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("user_id", "event_id", "event_type", "ts_us")
    lastMatchingBefore(e, "user_id", Seq("ts_us", "event_id"),
      col("event_type") === "purchase", col("ts_us"), "last_purchase_us")
      .filter(col("event_type") === "click")
      .withColumn("since_purchase_us", col("ts_us") - col("last_purchase_us"))
      .select("user_id", "event_id", "ts_us", "last_purchase_us",
        "since_purchase_us")
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Equi-join with the left side's hot keys spread over `salt`
    * reducers. Result-identical to a plain join (spec-verified).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      (abs(hash(col(key), monotonically_increasing_id())) % salt).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** K12 — skew-salted aggregation join: lineitem ⋈ orders where a
    * hot orderkey would otherwise own a reducer.
    */
  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, o, "l_orderkey", 8)
      .groupBy("o_orderpriority")
      .agg(graft.Fp.dsum2(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** K13 — follow-window length (30 s). */
  val FollowWindowUs = 30000000L

  /** K13 — banded range join: for each click, the same-user events in
    * the following 30 s. A naive θ-join (`t1 > t0 AND t1 <= t0 + w`)
    * plans as a per-key nested loop; banding each side onto
    * window-sized time buckets turns it into a co-partitioned
    * equi-join on (user, bucket) — a probe's matches can only live in
    * its own or the next bucket, so the probe side explodes onto
    * exactly those two, and the exact range predicate filters inside
    * the joined cells. Shuffle volume is 2×|probes| + |events|; no
    * cartesian node at any scale.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val probes = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us").as("t0"))
      .withColumn("bkt", explode(array(
        expr(s"t0 div $FollowWindowUs"), expr(s"t0 div $FollowWindowUs + 1"))))
    val cands = e
      .select(col("user_id"), col("ts_us").as("t1"), col("event_type"))
      .withColumn("bkt", expr(s"t1 div $FollowWindowUs"))
    probes.join(cands, Seq("user_id", "bkt"))
      .filter(col("t1") > col("t0") && col("t1") <= col("t0") + FollowWindowUs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_follow"),
        countDistinct("event_type").as("n_types"))
      .orderBy("event_id")
  }

  override def queries: Map[String, Q] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_skew_join" -> (qSkewJoin _),
    "q_range_join" -> (qRangeJoin _))

  override def oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT user_id, event_id, ts_us, last_purchase_us,
        |  ts_us - last_purchase_us AS since_purchase_us
        |FROM (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    last_value(CASE WHEN event_type = 'purchase' THEN ts_us END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_purchase_us
        |  FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |        FROM events))
        |WHERE event_type = 'click'
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_skew_join" ->
      s"""SELECT o_orderpriority,
        |  ${graft.Fp.sqlSum2("l_extendedprice")} AS sum_price,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_range_join" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events)
        |SELECT p.event_id, count(*) AS n_follow,
        |  count(DISTINCT c.event_type) AS n_types
        |FROM e p JOIN e c ON c.user_id = p.user_id
        |  AND c.ts_us > p.ts_us AND c.ts_us <= p.ts_us + $FollowWindowUs
        |WHERE p.event_type = 'click'
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin)
}
