package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins the CDC-diff algebra the DuckDB gate proves only in aggregate:
  * the coin→kind mapping, churn-bounded output, and the chg_mask
  * bit semantics.
  */
class SnapshotDiffSpec extends SparkSpec {

  private lazy val rows = SnapshotDiff.snapshotDiff(spark, sf).collect()

  private lazy val coins: Map[Long, Long] =
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), expr(
        "cast(conv(substring(md5(concat('snp|', cast(o_orderkey as string))), 1, 12), 16, 10) as bigint) % 10")
        .as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("every diff row's kind matches its coin role; nothing else emits") {
    assert(rows.nonEmpty)
    val byKey = rows.map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    assert(byKey.size == rows.length, "one diff row per key")
    coins.foreach { case (k, c) =>
      val kind = byKey.get(k).map(_.getAs[String]("kind"))
      c match {
        case 0 => assert(kind.contains("insert"), s"key $k coin 0")
        case 1 => assert(kind.contains("delete"), s"key $k coin 1")
        case 2 | 3 => assert(kind.contains("update"), s"key $k coin $c")
        case _ => assert(kind.isEmpty, s"key $k coin $c must not emit")
      }
    }
  }

  test("chg_mask isolates the column each update role touched") {
    rows.filter(_.getAs[String]("kind") == "update").foreach { r =>
      val c = coins(r.getAs[Long]("o_orderkey"))
      val mask = r.getAs[Long]("chg_mask")
      if (c == 2) {
        assert(mask == 1L, "price bump sets only bit 0")
        assert(r.getAs[Double]("new_price") ==
          r.getAs[Double]("old_price") + 1.0)
        assert(r.getAs[String]("new_status") ==
          r.getAs[String]("old_status"))
      } else {
        assert(mask == 2L, "status recode sets only bit 1")
        assert(r.getAs[String]("new_status") == "X")
        assert(r.getAs[Double]("new_price") ==
          r.getAs[Double]("old_price"))
      }
    }
    rows.filter(r => r.getAs[String]("kind") != "update").foreach { r =>
      assert(r.getAs[Long]("chg_mask") == 0L)
      assert(r.getAs[String]("kind") == "insert" ||
        r.getAs[String]("kind") == "delete")
    }
  }

  test("output is churn-bounded: exactly the coin-0..3 keys") {
    val expected = coins.count(_._2 <= 3)
    assert(rows.length == expected,
      s"diff rows ${rows.length} vs churn keys $expected")
  }

  test("summary recomputes from the row-level diff") {
    val sm = SnapshotDiff.snapshotDiffSummary(spark, sf).collect()
      .map(r => r.getAs[String]("kind") -> r).toMap
    assert(sm.keySet == Set("insert", "delete", "update"))
    val nTable = Tables.orders(spark, sf).count()
    val byKind = rows.groupBy(_.getAs[String]("kind"))
    sm.foreach { case (kind, s) =>
      val rs = byKind(kind)
      assert(s.getAs[Long]("n_rows") == rs.length)
      assert(s.getAs[Long]("n_price_chg") ==
        rs.count(r => (r.getAs[Long]("chg_mask") & 1L) == 1L))
      assert(s.getAs[Long]("n_status_chg") ==
        rs.count(r => (r.getAs[Long]("chg_mask") & 2L) == 2L))
      assert(s.getAs[Long]("n_date_chg") == 0L)
      assert(s.getAs[Long]("churn_ppm") ==
        rs.length.toLong * 1000000L / nTable)
      assert(s.getAs[Long]("n_table") == nTable)
    }
  }
}
