package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("morton interleave is a bijection on the 16x16 grid") {
    val z = spark.range(256)
      .select(Layout.mortonCol(pmod(col("id"), lit(16L)), expr("id div 16")).as("z"))
      .collect().map(_.getLong(0))
    assert(z.distinct.length === 256)
    assert(z.min === 0L && z.max === 255L)
  }

  test("layout scorecard: pruning is sound, each layout wins its selective dimension") {
    val rows = Layout.layoutZorder(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("files_hit") <= r.getAs[Long]("n_files"))
      // min/max pruning never skips a file containing a matching row
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
    }
    // matched rows are a property of the probe alone, not the layout
    rows.groupBy(_.getAs[String]("probe")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rows_matched")).distinct.length === 1)
    }
    def scanned(l: String, p: String): Long = rows
      .find(r => r.getAs[String]("layout") == l && r.getAs[String]("probe") == p)
      .get.getAs[Long]("rows_scanned")
    // user-selective probe: the time-linear layout cannot prune; z-order can
    assert(scanned("zorder", "x_band") < scanned("linear_time", "x_band"))
    // time-selective probe: linear's native dimension is at least as good
    assert(scanned("linear_time", "y_band") <= scanned("zorder", "y_band"))
  }

  test("layout_compact bins are full, contiguous, and cover every file and row") {
    val ev = graft.sources.Tables.events(spark, sf)
    val totalRows = ev.count()
    val totalFiles = ev.select(expr("cast(ts as long) div 3600")).distinct().count()
    val bins = Layout.layoutCompact(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq === bins.indices.map(_.toLong))
    assert(bins.map(_.getAs[Long]("n_rows")).sum === totalRows)
    assert(bins.map(_.getAs[Long]("n_files")).sum === totalFiles)
    // start-offset rule: every bin but the last holds >= the target
    bins.init.foreach(r => assert(r.getAs[Long]("n_rows") >= 512L))
    // time clustering preserved: hour spans are disjoint and ascending
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hour_hi") < b.getAs[Long]("hour_lo"))
      case _ =>
    }
  }

  test("layout_cluster_depth sweep counts match brute-force pairwise overlap") {
    val files = graft.sources.Tables.events(spark, sf)
      .groupBy(expr("cast(ts as long) div 3600").as("hour_id"))
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    val n = files.length
    // closed-interval intersection, O(n^2) on the metadata in-test
    val bruteOverlap = (for {
      i <- files.indices; j <- i + 1 until n
      if files(i)._1 <= files(j)._2 && files(j)._1 <= files(i)._2
    } yield 1).size.toLong
    val bruteDepth = files.map { case (lo, _) =>
      files.count { case (l, h) => l <= lo && lo <= h }.toLong
    }.max
    val r = Layout.layoutClusterDepth(spark, sf).collect().head
    assert(r.getAs[Long]("n_files") === n.toLong)
    assert(r.getAs[Long]("total_pairs") === n.toLong * (n - 1) / 2)
    assert(r.getAs[Long]("overlap_pairs") === bruteOverlap)
    assert(r.getAs[Long]("max_depth") === bruteDepth)
  }
}
