package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `Tables.embeddings` must normalize the embedding column to
  * `array<float>` — the type the codegen'd vector expressions read
  * with typed `getFloat` accessors. A numpy/pandas writer emits
  * float64 lists unless the column is explicitly float32, so a
  * regenerated embeddings.parquet can silently change element type —
  * the round-8 events drift, one column over. This spec writes the
  * SAME vectors in both flavors and asserts identical reads and
  * identical fast-dot results.
  */
class EmbeddingFlavorSpec extends SparkSpec {

  // dyadic values (multiples of 1/8): exactly representable in BOTH
  // float32 and float64, so the f64 → f32 normalization is lossless
  // and results must match bit-for-bit
  private val vecs: Seq[(Long, Array[Float])] = (0L until 6L).map { k =>
    k -> Array.tabulate(8)(i => ((i + k + 1) / 8.0f) * (if (i % 2 == 0) 1 else -1))
  }

  test("float32 and float64 embedding flavors read identically") {
    import spark.implicits._
    val base = "/tmp/graft_emb_flavor"
    vecs.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/f32/embeddings.parquet")
    vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/f64/embeddings.parquet")

    // stored flavors really differ …
    assert(Tables.table(spark, s"$base/f32", "embeddings")
      .schema("embedding").dataType == ArrayType(FloatType, true))
    assert(Tables.table(spark, s"$base/f64", "embeddings")
      .schema("embedding").dataType == ArrayType(DoubleType, true))
    // … and both normalize to array<float> with identical values
    val read = Seq("f32", "f64").map { f =>
      val df = Tables.embeddings(spark, s"$base/$f")
      assert(df.schema("embedding").dataType == ArrayType(FloatType, true),
        s"flavor $f embedding dtype")
      f -> df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    }.toMap
    assert(read("f32") == read("f64"))
    assert(read("f32").map(_._1) == vecs.map(_._1).toList)

    // the codegen'd float dot (the hot-path accessor that breaks on
    // type drift) agrees across flavors
    val dots = Seq("f32", "f64").map { f =>
      f -> Tables.embeddings(spark, s"$base/$f")
        .select(col("vec_id"),
          graft.sim.Vectors.dotFast("embedding", "embedding").as("d"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
        .toList
    }.toMap
    assert(dots("f32") == dots("f64"))
    assert(dots("f32").forall(_._2 > 0.0))
  }
}
