package graft

/** Every SparkEntry query must DEGRADE on fully-empty input tables —
  * empty or schema-stable results, never a thrown analysis/stage
  * error. A user pointing the library at an empty partition (new
  * tenant, fresh landing zone, over-filtered upstream) hits exactly
  * this; the round-9 census found 2 of 134 queries throwing (the
  * IVF family's KMeans fit on zero points — since guarded) and this
  * spec keeps the count at zero.
  *
  * This is the slowest spec in the suite (it drives all queries),
  * but each runs on zero rows — the wall is plan/fit overhead only.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = "/tmp/graft_empty_fixture"
    graft.sources.Tables.all.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val oneRowDir: String = {
    val dir = "/tmp/graft_onerow_fixture"
    graft.sources.Tables.all.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(1)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String, label: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on $label input:\n${failures.mkString("\n")}")
  }

  test("all queries run on empty tables without throwing") {
    sweep(emptyDir, "empty")
  }

  test("all queries run on 1-row tables without throwing") {
    // n=1 exposes what empty can't: zero-variance series, k>n model
    // fits (the MLlib KMeans k>=2 contract), single-sample stddev,
    // splits with one side empty
    sweep(oneRowDir, "1-row")
  }

  private lazy val nullsDir: String = {
    // dirty data a migrating user actually has: null text/lang on
    // documents, null props on events — typed boundaries and
    // tokenizers must skip or null-propagate, never assert
    import org.apache.spark.sql.functions.{col, expr, when}
    val dir = "/tmp/graft_nulls_fixture"
    graft.sources.Tables.all.foreach { t =>
      val base = spark.read.parquet(s"$sf/$t.parquet")
      val dirty = t match {
        case "documents" => base
          .withColumn("text",
            when(col("doc_id") % 2 === 0, expr("cast(null as string)"))
              .otherwise(col("text")))
          .withColumn("lang",
            when(col("doc_id") % 3 === 0, expr("cast(null as string)"))
              .otherwise(col("lang")))
        case "events" => base
          .withColumn("props",
            when(col("event_id") % 5 === 0, expr("cast(null as string)"))
              .otherwise(col("props")))
        case _ => base
      }
      dirty.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries run with null text/lang/props without throwing") {
    sweep(nullsDir, "null-columns")
  }
}
