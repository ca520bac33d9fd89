package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale pattern from SURVEY §5: co-located joins via bucketed tables — at
  * 100 TB the fact-fact join (lineitem ⨝ orders) must not shuffle either
  * side every query, so both are bucketed+sorted by the join key once at
  * ingest and every later join is exchange-free. This spec proves the plan
  * shape locally.
  */
class BucketJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join without any exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // a previous JVM's tables survive as orphan directories in the
    // warehouse — remove them or CREATE TABLE refuses the location
    Seq("orders_b", "lineitem_b").foreach { t =>
      val p = java.nio.file.Paths.get("/tmp/graft-test-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // hint("merge"): at test scale the planner would broadcast the tiny
    // dimension and never consult bucketing; at 100 TB both sides are big
    // and SortMergeJoin is what the planner picks on its own — the hint
    // recreates that regime so the assertion checks the plan that matters
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "o_orderstatus", "l_quantity")

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle; plan was:\n$plan")
    assert(joined.count() > 0)
  }
}
