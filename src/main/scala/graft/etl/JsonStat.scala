package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-stat ingestion, Spark-first (reference: etl/main.py:75-126 —
  * `unravel_index` + dimension-code lookup, row at a time in Python).
  *
  * A JSON-stat document stores an N-dimensional cube as a single
  * flat-indexed value map plus per-dimension code→position indexes.
  * Here the whole unravel is expressed with codegen'd higher-order
  * functions (`transform`/`aggregate`/`map_filter`) over a MapType
  * parse — no UDFs, no driver loop. Feed it a DataFrame with one
  * document per row and 100 TB of documents flatten in parallel,
  * one narrow projection per row.
  */
object JsonStat {

  val schema: StructType = StructType(Seq(
    StructField("id", ArrayType(StringType)),
    StructField("size", ArrayType(IntegerType)),
    StructField("dimension", MapType(StringType, StructType(Seq(
      StructField("category", StructType(Seq(
        StructField("index", MapType(StringType, IntegerType)),
        StructField("label", MapType(StringType, StringType))))))))),
    StructField("value", MapType(StringType, DoubleType))))

  /** Flatten documents in `jsonCol` to one row per observation with
    * `value`, `idx`, and per-dimension `code_map` / `label_map`.
    */
  def flatten(df: DataFrame, jsonCol: String): DataFrame = {
    df.select(from_json(col(jsonCol), schema).as("j"))
      .select(col("j.id").as("dims"), col("j.size").as("sizes"),
        col("j.dimension").as("dimension"),
        explode(col("j.value")).as(Seq("flat_idx", "value")))
      .withColumn("idx", col("flat_idx").cast("long"))
      // coords[i] = (idx / stride_i) % size_i with stride_i = prod(sizes[i+1..])
      .withColumn("coords", expr(
        """transform(sequence(0, size(sizes) - 1), i ->
          |  cast((idx div aggregate(slice(sizes, i + 2, size(sizes)), 1L,
          |                          (a, x) -> a * cast(x as long)))
          |       % cast(element_at(sizes, i + 1) as long) as int))""".stripMargin))
      // codes[i] = the category code whose index position equals coords[i]
      .withColumn("codes", expr(
        """transform(sequence(0, size(dims) - 1), i ->
          |  element_at(map_keys(map_filter(
          |    element_at(dimension, element_at(dims, i + 1)).category.index,
          |    (k, v) -> v = element_at(coords, i + 1))), 1))""".stripMargin))
      .withColumn("code_map", expr("map_from_arrays(dims, codes)"))
      .withColumn("label_map", expr(
        """map_from_arrays(dims, transform(sequence(0, size(dims) - 1), i ->
          |  element_at(element_at(dimension, element_at(dims, i + 1)).category.label,
          |             element_at(codes, i + 1))))""".stripMargin))
      .select("value", "idx", "code_map", "label_map")
  }

  /** A fixed Eurostat-shaped document (nrg_bal × geo × time, sparse
    * values) used by the `etl_jsonstat` correctness query; its tidy
    * expansion is fully determined, so the oracle is a VALUES literal.
    */
  val sampleDoc: String =
    """{"id": ["nrg_bal", "geo", "time"],
      | "size": [2, 3, 2],
      | "dimension": {
      |   "nrg_bal": {"category": {"index": {"GEP": 0, "FC_E": 1},
      |     "label": {"GEP": "Gross electricity production", "FC_E": "Final consumption"}}},
      |   "geo": {"category": {"index": {"DE": 0, "FR": 1, "IT": 2},
      |     "label": {"DE": "Germany", "FR": "France", "IT": "Italy"}}},
      |   "time": {"category": {"index": {"2020": 0, "2021": 1},
      |     "label": {"2020": "2020", "2021": "2021"}}}},
      | "value": {"0": 100.0, "1": 101.0, "2": 102.0, "3": 103.0, "4": 104.0,
      |           "6": 106.0, "8": 108.0, "9": 109.0, "10": 110.0, "11": 111.0}}""".stripMargin
}
