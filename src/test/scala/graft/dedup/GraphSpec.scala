package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def tinyPairs = {
    import spark.implicits._
    // path 1-2-3 plus the isolated pair 10-11
    Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (10L, 11L, 0.7))
      .toDF("doc_a", "doc_b", "jaccard")
  }

  test("degree counts both directions and tracks the max jaccard") {
    val rows = Graph.degreeOf(tinyPairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows == Map(
      1L -> (1L, 0.9), 2L -> (2L, 0.9), 3L -> (1L, 0.8),
      10L -> (1L, 0.7), 11L -> (1L, 0.7)))
  }

  test("pagerank matches a plain-Scala integer-recurrence oracle") {
    val got = Graph.pagerankOf(tinyPairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // reference implementation of the same integer recurrence
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
      10L -> 11L, 11L -> 10L)
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size.toLong
    var pr: Map[Long, Long] = deg.map { case (k, _) => k -> Graph.Scale / n }
    for (_ <- 1 to Graph.Iters) {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = s.map { case (d, sum) =>
        d -> ((3 * Graph.Scale) / (20 * n) + (17 * sum) / 20)
      }
    }
    assert(got.keySet == pr.keySet)
    pr.foreach { case (id, p) =>
      assert(got(id)._2 == p.toDouble / 1e12, s"node $id")
      assert(got(id)._1 == deg(id))
    }
    // the center of the path outranks its leaves; the symmetric pair
    // splits evenly
    assert(got(2L)._2 > got(1L)._2 && got(1L)._2 == got(3L)._2)
    assert(got(10L)._2 == got(11L)._2)
  }

  test("pagerank on the real corpus conserves ~unit mass") {
    val rows = Graph.pagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Double]("pagerank")).sum
    // floors only ever drop mass; damping redistributes but keeps the
    // total within a few percent of 1 on a connected-ish graph
    assert(mass > 0.5 && mass <= 1.0001, s"mass=$mass")
    rows.foreach(r => assert(r.getAs[Double]("pagerank") > 0))
  }

  test("keyword_extract ranks by weight desc then term asc") {
    val rows = graft.text.RagQueries.keywordExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (wa, wb) = (a.getAs[Double]("w"), b.getAs[Double]("w"))
          assert(wa > wb || (wa == wb &&
            a.getAs[String]("term") < b.getAs[String]("term")))
        case _ => ()
      }
    }
  }
}
