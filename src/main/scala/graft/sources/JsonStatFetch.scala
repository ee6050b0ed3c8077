package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** The ACQUISITION seam — the one reference behavior that is
  * environment-bound rather than engine scope.
  *
  * The reference's entry point (etl/main.py:75-96) opens with a live
  * HTTP pull: `requests.get(url)` per entry of the DATASETS dict
  * (etl/main.py:53-65, dataset_code → Eurostat dissemination-API
  * url), and everything downstream consumes the returned JSON-stat
  * document. This trait makes that pull an explicit 1-line seam: a
  * binding turns (dataset_code → url) into one `(dataset_code, json)`
  * row per dataset, and [[graft.etl.JsonStat.flatten]] takes it from
  * there — identical to the [[Tables.fromJsonStatDocs]] landing-zone
  * path, which stays the canonical batch route.
  *
  * Only the DISK binding ships (the Blob-codec discipline:
  * multimodal/Blob.scala stubs its codecs the same way): this
  * environment has no egress, and an HTTP binding is genuinely
  * 1-line-per-payload (`scala.io.Source.fromURL(url).mkString` or a
  * java.net.http GET, driver-side — a JSON-stat cube is one small
  * document and the loop is O(#datasets), never data-scale, so
  * driver-side acquisition is the CORRECT shape, not a compromise;
  * the cluster's work starts at the landed payloads).
  */
trait JsonStatFetcher {
  /** One row per dataset: `(dataset_code STRING, json STRING)`. */
  def fetch(spark: SparkSession, datasets: Map[String, String]): DataFrame
}

/** Disk binding: each dataset's "url" is a landed payload path (the
  * acquisition already happened — a curl job, an airflow task, a
  * previous run). `fetch` reads each file wholetext and tags it with
  * its dataset code, so the result feeds [[graft.etl.JsonStat
  * .flatten]] exactly like the reference's in-memory `response
  * .json()` feeds its transform.
  */
final class DiskJsonStatFetcher extends JsonStatFetcher {
  override def fetch(spark: SparkSession,
      datasets: Map[String, String]): DataFrame =
    datasets.toSeq.sortBy(_._1).map { case (code, path) =>
      spark.read.option("wholetext", "true").text(path)
        .select(lit(code).as("dataset_code"), col("value").as("json"))
    }.reduceOption(_.unionByName(_))
      .getOrElse(JsonStatFetcher.emptyResult(spark))
}

object JsonStatFetcher {
  /** The `(dataset_code, json)` schema as an empty frame — what any
    * binding returns for an empty DATASETS map (a bare `.reduce`
    * would throw instead).
    */
  private[sources] def emptyResult(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("dataset_code", StringType),
        StructField("json", StringType))))
  }
}
