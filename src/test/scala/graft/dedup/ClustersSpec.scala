package graft.dedup

import graft.SparkSpec

class ClustersSpec extends SparkSpec {

  test("connected components merge transitive chains to the min label") {
    import spark.implicits._
    // two components: {1,2,3,9} via chain, {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("dedup_clusters keeps exactly one representative per cluster") {
    val rows = Clusters.dedupClusters(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_rep"))
    byCluster.foreach { case (rep, members) =>
      assert(members.count(_.getAs[Boolean]("keep")) == 1)
      assert(members.filter(_.getAs[Boolean]("keep"))
        .head.getAs[Long]("doc_id") == rep)
      assert(members.forall(_.getAs[Long]("doc_id") >= rep))
    }
  }
}
