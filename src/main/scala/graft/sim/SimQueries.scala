package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** SURVEY §2 G — similarity search as driver queries. Query set =
  * vec_id < 5 against the rest of the corpus.
  */
object SimQueries extends QueryModule {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select("vec_id", "embedding")

  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    Knn.bruteForce(emb(spark, dir), col("vec_id") < 5, 3)

  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    Knn.lsh(emb(spark, dir), col("vec_id") < 5, 3)

  /** G3 — vector ops surface: norm / extrema / dimensionality. */
  def vectorOps(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"),
        Vectors.l2Norm("embedding").as("l2_norm"),
        expr("cast(array_max(embedding) as double)").as("max_c"),
        expr("cast(array_min(embedding) as double)").as("min_c"),
        size(col("embedding")).as("dims"))
      .orderBy("vec_id")

  override def queries: Map[String, Q] = Map(
    "knn_brute" -> (knnBrute _),
    "knn_lsh" -> (knnLsh _),
    "vector_ops" -> (vectorOps _))

  /** Shared relational CTEs: per-dimension components + norms. */
  private val compCte =
    """WITH comp AS (SELECT vec_id, CAST(i AS INT) AS i,
      |         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      |       FROM embeddings, UNNEST(range(1, 65)) u(i)),
      |norms AS (SELECT vec_id,
      |         CAST(sum(CAST(v * v AS DECIMAL(24,12))) AS DOUBLE) AS nsq
      |       FROM comp GROUP BY vec_id)
      |""".stripMargin

  override def oracles: Map[String, String] = Map(
    "knn_brute" -> (compCte.stripSuffix("\n") + """,
      |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         CAST(sum(CAST(q.v * c.v AS DECIMAL(24,12))) AS DOUBLE) AS dot
      |       FROM comp q JOIN comp c ON q.i = c.i
      |         AND q.vec_id < 5 AND c.vec_id >= 5
      |       GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id,
      |         dot / (sqrt(nq.nsq) * sqrt(nc.nsq)) AS cosine
      |       FROM dots JOIN norms nq ON query_id = nq.vec_id
      |                 JOIN norms nc ON neighbor_id = nc.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |       FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine FROM ranked
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin),
    "knn_lsh" -> (compCte.stripSuffix("\n") + """,
      |planes AS (SELECT h, d,
      |         (CAST((1103515245 * (h * 64 + d) + 12345) % 2147483647 AS DOUBLE)
      |          / 2147483647.0) - 0.5 AS pv
      |       FROM UNNEST(range(0, 8)) u(h), UNNEST(range(0, 64)) v(d)),
      |sig AS (SELECT vec_id, h,
      |         CAST(sum(CAST(c.v * p.pv AS DECIMAL(24,12))) AS DOUBLE) AS s
      |       FROM comp c JOIN planes p ON c.i = p.d + 1 GROUP BY vec_id, h),
      |buck AS (SELECT vec_id,
      |         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(h AS INT))
      |             ELSE 0 END) AS bucket
      |       FROM sig GROUP BY vec_id),
      |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |       FROM buck q JOIN buck c ON q.bucket = c.bucket
      |         AND q.vec_id < 5 AND c.vec_id >= 5),
      |dots AS (SELECT cand.query_id, cand.neighbor_id,
      |         CAST(sum(CAST(a.v * b.v AS DECIMAL(24,12))) AS DOUBLE) AS dot
      |       FROM cand JOIN comp a ON a.vec_id = cand.query_id
      |                 JOIN comp b ON b.vec_id = cand.neighbor_id AND a.i = b.i
      |       GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id,
      |         dot / (sqrt(nq.nsq) * sqrt(nc.nsq)) AS cosine
      |       FROM dots JOIN norms nq ON query_id = nq.vec_id
      |                 JOIN norms nc ON neighbor_id = nc.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |       FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine FROM ranked
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin),
    "vector_ops" -> (compCte.stripSuffix("\n") + """
      |SELECT e.vec_id, sqrt(n.nsq) AS l2_norm,
      |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_c,
      |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_c,
      |  CAST(len(embedding) AS INTEGER) AS dims
      |FROM embeddings e JOIN norms n ON e.vec_id = n.vec_id
      |ORDER BY e.vec_id""".stripMargin))
}
