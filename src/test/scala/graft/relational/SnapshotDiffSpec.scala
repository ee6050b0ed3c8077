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

  test("apply identity: old ∘ diff(old, new) == new, bit-for-bit") {
    val (_, neu) = SnapshotDiff.carved(Tables.orders(spark, sf))
    val applied = SnapshotDiff.snapshotApply(spark, sf)
    assert(applied.columns.toSeq == neu.columns.toSeq)
    assert(applied.count() == neu.count())
    assert(applied.exceptAll(neu).isEmpty, "apply emitted rows not in new")
    assert(neu.exceptAll(applied).isEmpty, "apply missed rows of new")
  }

  test("scd2-from-diff: version bookkeeping per change kind") {
    val scd = SnapshotDiff.snapshotScd2(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_orderkey"))
    coins.foreach { case (k, c) =>
      val vs = scd.getOrElse(k, Array.empty)
      c match {
        case 0 => // insert: one OPEN version at the effective date
          assert(vs.length == 1 && vs(0).getAs[Boolean]("is_current")
            && vs(0).getAs[String]("valid_from") == "1996-06-01", s"key $k")
        case 1 => // delete: one CLOSED version, no successor
          assert(vs.length == 1 && !vs(0).getAs[Boolean]("is_current")
            && vs(0).getAs[String]("valid_to") == "1996-06-01", s"key $k")
        case 2 | 3 => // update: closed old image + open new image
          assert(vs.length == 2, s"key $k")
          val (closed, open) =
            (vs.find(!_.getAs[Boolean]("is_current")).get,
             vs.find(_.getAs[Boolean]("is_current")).get)
          assert(closed.getAs[String]("valid_to") == "1996-06-01")
          assert(open.getAs[String]("valid_from") == "1996-06-01")
          if (c == 3) assert(open.getAs[String]("o_orderstatus") == "X")
          if (c == 2) assert(open.getAs[Double]("o_totalprice") ==
            closed.getAs[Double]("o_totalprice") + 1.0)
        case _ => // untouched: one open version from the old image
          assert(vs.length == 1 && vs(0).getAs[Boolean]("is_current")
            && vs(0).getAs[String]("valid_from") == "1995-01-01", s"key $k")
      }
    }
  }

  test("NULL transitions classify as updates (null-safe comparison)") {
    // the carved gate columns are never null, so the hash gate can't
    // see this class: a column moving NULL→value or value→NULL is a
    // real update a CDC feed must report — plain <> yields NULL there
    // and the row would silently drop as 'unchanged'
    import spark.implicits._
    val joined = Seq(
      // (key, old_price, new_price, old_status, new_status) — dates equal
      (1L, Option.empty[Double], Some(5.0), Some("A"), Some("A")),
      (2L, Some(5.0), Option.empty[Double], Some("A"), Some("A")),
      (3L, Some(5.0), Some(5.0), Option.empty[String], Some("B")),
      (4L, Option.empty[Double], Option.empty[Double], Some("A"), Some("A")),
      (5L, Some(5.0), Some(5.0), Some("A"), Some("A")))
      .toDF("k", "old_price", "new_price", "old_status", "new_status")
      .select(col("k").as("k_old"), col("k").as("k_new"),
        col("old_price"), col("new_price"),
        col("old_status"), col("new_status"),
        to_date(lit("2024-01-01")).as("old_date"),
        to_date(lit("2024-01-01")).as("new_date"))
    val out = SnapshotDiff.classified(joined)
      .collect().map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[String]("kind"), r.getAs[Long]("chg_mask"))).toMap
    assert(out(1L) == ("update", 1L), "NULL→value price is an update")
    assert(out(2L) == ("update", 1L), "value→NULL price is an update")
    assert(out(3L) == ("update", 2L), "NULL→value status is an update")
    // NULL <=> NULL is TRUE: both-null is NOT a change
    assert(!out.contains(4L), "NULL==NULL must stay unchanged")
    assert(!out.contains(5L), "equal row must stay unchanged")
  }
}
