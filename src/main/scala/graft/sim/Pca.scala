package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Principal-component extraction over the embedding corpus
  * (SURVEY §2 G14): the centered covariance's top eigenvector by
  * POWER ITERATION — the whitening / dimensionality / drift
  * diagnostic an embedding pipeline runs before committing an index
  * geometry (is the corpus effectively low-rank? how much variance
  * does one direction carry?).
  *
  * Scale shape: the covariance build is the ONLY corpus-sized pass —
  * each vector emits its d(d+1)/2 upper-triangle products in one
  * map-side generate (no self-join, no shuffle of pair rows before
  * partial aggregation), giving a d²-row matrix frame at any corpus
  * size. The iteration then runs entirely on that tiny frame: per
  * round one co-partitioned (matrix × vector) join + one combinable
  * sum — the F12 pagerank discipline applied to linear algebra, with
  * an eager checkpoint per round.
  *
  * Cross-engine parity: every reduction quantizes its double terms to
  * DECIMAL(24,12) before the order-free decimal sum; the mean /
  * normalize / Rayleigh divisions and sqrt are single IEEE double
  * ops on bit-identical inputs. The oracle unrolls the [[Rounds]]
  * fixed rounds as chained CTEs (the E2/F12 pattern).
  */
object Pca extends QueryModule {

  val Dim = 64

  /** Fixed power-iteration rounds (unrolled in the oracle). */
  val Rounds = 10

  /** The iteration start: x0_j = (65 + j)/1024 — exact-dyadic,
    * deterministic, and NON-UNIFORM: a constant start is exactly
    * orthogonal to any direction whose coordinates sum to zero
    * (alternating-sign embeddings do this in practice), which would
    * zero the first iterate; a strictly increasing start is
    * orthogonal only to a measure-zero set of directions.
    */
  def x0(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (j.cast("double") + lit(65.0d)) / lit(1024.0d)

  private def q12(c: org.apache.spark.sql.Column) =
    c.cast("decimal(24,12)")

  /** Upper-triangle second-moment sums + per-dim sums in ONE pass:
    * (i, j, s2) for i ≤ j with s2 = Σ_vec quantized(v_i · v_j).
    */
  private def moments(emb: DataFrame): (DataFrame, DataFrame, Long) = {
    val e = graft.Par.spread(emb.select("embedding"))
    val n = emb.count()
    val pairs = e.select(explode(expr(
      s"""flatten(transform(sequence(0, ${Dim - 1}), i ->
         |  transform(sequence(i, ${Dim - 1}), j -> named_struct(
         |    'i', i, 'j', j,
         |    'p', cast(cast(element_at(embedding, i + 1) as double)
         |            * cast(element_at(embedding, j + 1) as double)
         |          as decimal(24,12))))))""".stripMargin)).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
    val m2 = pairs.groupBy("i", "j")
      .agg(sum("p").cast("double").as("s2"))
    val sums = e.select(explode(expr(
      s"""transform(sequence(0, ${Dim - 1}), i -> named_struct('i', i,
         |  'v', cast(cast(element_at(embedding, i + 1) as double)
         |        as decimal(24,12))))""".stripMargin)).as("t"))
      .select(col("t.i").as("i"), col("t.v").as("v"))
      .groupBy("i").agg(sum("v").cast("double").as("sv"))
    (m2, sums, n)
  }

  /** G14 — `embedding_pca`: (dim, loading, eigval, explained) — the
    * unit top eigenvector of the centered covariance, its Rayleigh
    * eigenvalue, and the variance share it explains.
    */
  def pca1(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val (m2, sums, n) = moments(emb)
    // full symmetric matrix from the triangle sums: the mirrored cell
    // reuses the SAME sum, so symmetry is exact by construction
    val upper = m2.join(sums.select(col("i"), col("sv").as("svi")), "i")
      .join(sums.select(col("i").as("j"), col("sv").as("svj")), "j")
      .withColumn("c", col("s2") / n
        - (col("svi") / n) * (col("svj") / n))
      .select("i", "j", "c")
    val cov = upper.unionByName(
        upper.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("c")))
      .localCheckpoint(true)
    var x = spark.range(Dim).select(col("id").cast("int").as("j"),
      x0(col("id")).as("x"))
    for (_ <- 1 to Rounds) {
      val w = cov.join(x, "j").groupBy("i")
        .agg(sum(q12(col("c") * col("x"))).cast("double").as("w"))
      val nrm = w.agg(
        sqrt(sum(q12(col("w") * col("w"))).cast("double")).as("nv"))
      // nullif guard: a rank-deficient degenerate corpus (e.g. all
      // vectors identical → C = 0) zeroes the iterate; ANSI division
      // by zero must degrade to null loadings, not kill the job
      x = w.crossJoin(broadcast(nrm))
        .select(col("i").as("j"),
          (col("w") / nullif(col("nv"), lit(0.0d))).as("x"))
        .localCheckpoint(true)
    }
    // Rayleigh quotient through one more application of C
    val w = cov.join(x, "j").groupBy("i")
      .agg(sum(q12(col("c") * col("x"))).cast("double").as("w"))
    val eig = broadcast(x.join(w, col("j") === col("i"))
      .agg(sum(q12(col("x") * col("w"))).cast("double").as("eigval")))
    val tr = broadcast(cov.filter(col("i") === col("j"))
      .agg(sum(q12(col("c"))).cast("double").as("tr")))
    x.select(col("j").as("dim"), col("x").as("loading"))
      .crossJoin(eig).crossJoin(tr)
      .withColumn("explained",
        col("eigval") / nullif(col("tr"), lit(0.0d)))
      .select("dim", "loading", "eigval", "explained")
      .orderBy("dim")
  }

  def pcaQ(spark: SparkSession, dir: String): DataFrame =
    pca1(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  override def queries: Map[String, Q] = Map(
    "embedding_pca" -> (pcaQ _))

  /** One unrolled power-iteration round over the `cov` CTE. Every
    * per-round CTE is MATERIALIZED: wk is referenced twice (norm +
    * update), so DuckDB's default per-reference inlining would double
    * the chain's work each round (~2^Rounds blowup).
    */
  private def roundCte(k: Int): String = {
    val (xp, w, nm, xk) = (s"x${k - 1}", s"w$k", s"n$k", s"x$k")
    s"""$w AS MATERIALIZED (SELECT cov.i,
       |    CAST(sum(CAST(c * x AS DECIMAL(24,12))) AS DOUBLE) AS w
       |  FROM cov JOIN $xp ON cov.j = $xp.j GROUP BY 1),
       |$nm AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(24,12)))
       |    AS DOUBLE)) AS nv FROM $w),
       |$xk AS MATERIALIZED (SELECT i AS j, w / NULLIF(nv, 0) AS x
       |  FROM $w, $nm)"""
  }

  override def oracles: Map[String, String] = Map(
    // comp/cov AS MATERIALIZED: DuckDB inlines plain CTEs per
    // reference, and the 10 unrolled rounds each reference cov —
    // un-materialized, the parquet scan multiplies past the fd limit
    "embedding_pca" -> (s"""WITH comp AS MATERIALIZED (SELECT vec_id,
      |    CAST(i AS INT) - 1 AS i,
      |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(range(1, ${Dim + 1})) u(i)),
      |nn AS (SELECT count(*) AS n FROM embeddings),
      |m2 AS (SELECT a.i, b.i AS j,
      |    CAST(sum(CAST(a.v * b.v AS DECIMAL(24,12))) AS DOUBLE) AS s2
      |  FROM comp a JOIN comp b
      |    ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |sums AS (SELECT i, CAST(sum(CAST(v AS DECIMAL(24,12))) AS DOUBLE)
      |    AS sv FROM comp GROUP BY i),
      |upper_c AS (SELECT m2.i, m2.j,
      |    s2 / n - (sa.sv / n) * (sb.sv / n) AS c
      |  FROM m2 JOIN sums sa ON m2.i = sa.i
      |           JOIN sums sb ON m2.j = sb.i
      |           CROSS JOIN nn),
      |cov AS MATERIALIZED (SELECT i, j, c FROM upper_c
      |  UNION ALL SELECT j AS i, i AS j, c FROM upper_c WHERE i <> j),
      |x0 AS (SELECT CAST(i AS INT) AS j,
      |    (CAST(i AS DOUBLE) + 65.0) / 1024.0 AS x
      |  FROM UNNEST(range(0, $Dim)) u(i)),
      |""" + (1 to Rounds).map(roundCte).mkString(",\n") + s""",
      |wf AS (SELECT cov.i,
      |    CAST(sum(CAST(c * x AS DECIMAL(24,12))) AS DOUBLE) AS w
      |  FROM cov JOIN x$Rounds ON cov.j = x$Rounds.j GROUP BY 1),
      |eig AS (SELECT CAST(sum(CAST(x.x * wf.w AS DECIMAL(24,12)))
      |    AS DOUBLE) AS eigval
      |  FROM x$Rounds x JOIN wf ON x.j = wf.i),
      |tr AS (SELECT CAST(sum(CAST(c AS DECIMAL(24,12))) AS DOUBLE) AS tr
      |  FROM cov WHERE i = j)
      |SELECT j AS dim, x AS loading, eigval,
      |  eigval / NULLIF(tr, 0) AS explained
      |FROM x$Rounds, eig, tr
      |ORDER BY dim""").stripMargin)
}
