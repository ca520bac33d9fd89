package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Graph

class GraphSpec extends SparkSpec {

  private def vp(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("da", "db")
  }

  test("triangles: K4 has every node in 3 triangles") {
    val k4 = vp((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.graphTrianglesFrom(k4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap
    // K4 has C(4,3)=4 triangles; each node sits in C(3,2)=3 of them
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: a star graph has none (hub false-positive shape)") {
    val star = vp((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(Graph.graphTrianglesFrom(star).collect().isEmpty)
  }

  test("triangles: orientation counts each triangle exactly once under skewed degrees") {
    // triangle 1-2-3 with extra spokes on node 1 (degree 5): the oriented
    // wedge must fan out from the LOW-degree corners, and the count must
    // still be exactly one triangle per corner
    val g = vp((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val got = Graph.graphTrianglesFrom(g).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("pagerank: symmetric 2-node graph is a fixpoint at the unit rank") {
    val got = Graph.graphPagerankFrom(vp((7L, 9L))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_micro")).toMap
    // each node forwards its whole rank to the other: r' = 150000 +
    // (85·1000000) div 100 = 1000000 every round
    assert(got === Map(7L -> 1000000L, 9L -> 1000000L))
  }

  test("pagerank: 3-node path matches the hand-unrolled integer recurrence") {
    val got = Graph.graphPagerankFrom(vp((1L, 2L), (2L, 3L))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_micro")).toMap
    // i1: ends 150000+(85·500000)div100=575000, mid 150000+(85·2000000)div100=1850000
    // i2: ends 150000+(85·925000)div100=936250, mid 150000+(85·1150000)div100=1127500
    // i3: ends 150000+(85·563750)div100=629187, mid 150000+(85·1872500)div100=1741625
    assert(got === Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L))
    // the double view is the micro value over one division
    val ranks = Graph.graphPagerankFrom(vp((1L, 2L), (2L, 3L))).collect()
      .map(r => r.getAs[Long]("rank_micro") -> r.getAs[Double]("rank"))
    ranks.foreach { case (m, x) => assert(x === m / 1000000.0) }
  }

  test("cluster density: bounded by the star floor and clique ceiling, edges reconcile") {
    import graft.operators.Dedup
    val rows = Graph.graphClusterDensity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_nodes"); val e = r.getAs[Long]("n_edges")
      val dty = r.getAs[Double]("density")
      assert(n >= 2 && e >= 1)
      // connectivity floor (a component has >= n-1 edges) up to the clique
      assert(e >= n - 1 && e <= n * (n - 1) / 2)
      assert(dty === 2.0 * e / (n * (n - 1)))
      if (n == 2) assert(dty === 1.0)
    }
    // every verified edge lands in exactly one cluster
    val totalEdges = Dedup.dedupNgramJaccard(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_edges")).sum === totalEdges)
  }

  test("randomized: triangles and pagerank match in-process brute force on 25 seeded graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val n = 4 + rnd.nextInt(9) // 4..12 nodes
      val ids = (1 to n).map(_ * 3L + trial) // non-contiguous ids
      val all = for (i <- 0 until n; j <- i + 1 until n) yield (ids(i), ids(j))
      val pairs = all.filter(_ => rnd.nextDouble() < 0.4)
      if (pairs.nonEmpty) {
        val edges = pairs.toSet
        def connected(a: Long, b: Long) = edges((a min b, a max b))
        // brute-force triangle participation
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
        val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for {
          i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
          if connected(nodes(i), nodes(j)) && connected(nodes(j), nodes(k)) && connected(nodes(i), nodes(k))
        } Seq(nodes(i), nodes(j), nodes(k)).foreach(x => triCount(x) += 1)
        // brute-force integer pagerank recurrence
        val deg = nodes.map(u => u -> pairs.count(p => p._1 == u || p._2 == u).toLong).toMap
        var rank = nodes.map(_ -> 1000000L).toMap
        for (_ <- 1 to 3) {
          val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
          for ((a, b) <- pairs) {
            in(b) += rank(a) / deg(a)
            in(a) += rank(b) / deg(b)
          }
          rank = nodes.map(u => u -> (150000L + 85L * in(u) / 100L)).toMap
        }
        import spark.implicits._
        val vpDf = pairs.toDF("da", "db")
        val gotTri = Graph.graphTrianglesFrom(vpDf).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap
        assert(gotTri === triCount.filter(_._2 > 0).toMap, s"triangles trial $trial pairs=$pairs")
        val gotPr = Graph.graphPagerankFrom(vpDf).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_micro")).toMap
        assert(gotPr === rank, s"pagerank trial $trial pairs=$pairs")
      }
    }
  }

  test("randomized: connectedComponentsFrom matches union-find on 25 seeded graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 25) {
      val n = 4 + rnd.nextInt(12)
      val ids = (1 to n).map(_ * 5L + trial)
      val all = for (i <- 0 until n; j <- i + 1 until n) yield (ids(i), ids(j))
      val pairs = all.filter(_ => rnd.nextDouble() < 0.25)
      if (pairs.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra max rb) = ra min rb
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        // min-id canonical per component from the union-find roots
        val byRoot = nodes.groupBy(find)
        val expect = byRoot.values.flatMap { members =>
          val m = members.min; members.map(_ -> m)
        }.toMap
        import spark.implicits._
        val got = Graph.connectedComponentsFrom(pairs.toDF("da", "db")).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
        assert(got === expect, s"components trial $trial pairs=$pairs")
      }
    }
  }

  test("pagerank: corpus ranks stay in the stochastic envelope") {
    val rows = Graph.graphPagerank(spark, sf).collect()
    val n = rows.length
    val total = rows.map(_.getAs[Long]("rank_micro")).sum
    // floor divisions only ever LOSE mass (never create it), and every node
    // keeps at least its teleport share
    assert(total <= n * 1000000L)
    rows.foreach(r => assert(r.getAs[Long]("rank_micro") >= 150000L))
  }
}
