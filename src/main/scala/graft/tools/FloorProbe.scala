package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** The irreducible floors under every sub-2s strict-set entry (r18):
  * job-scheduling floor (empty job), parquet scan+decode floor per
  * table/projection, and one full-width q1-style scan+agg. Cited by the
  * SCALING.md honest-cost classification of the >2x-vs-DuckDB set.
  *   sbt "runMain graft.tools.FloorProbe <sfDir>"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Any): Unit = {
      val best = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"FLOOR $tag%-34s ${best}%7.3f s")
    }
    // warm footers/metadata once
    Tables.lineitem(spark, d).select("l_orderkey").agg(count(lit(1))).collect()
    Tables.events(spark, d).select("event_id").agg(count(lit(1))).collect()
    Tables.orders(spark, d).select("o_orderkey").agg(count(lit(1))).collect()

    time("empty_job (range 64)") {
      spark.range(64).agg(sum("id")).collect()
    }
    time("lineitem_1col_sum") {
      Tables.lineitem(spark, d).agg(sum(col("l_quantity"))).collect()
    }
    time("lineitem_4col_q1_payload") {
      Tables.lineitem(spark, d)
        .agg(sum(round(col("l_quantity") * 100).cast("long")),
          sum(round(col("l_extendedprice") * 100).cast("long")),
          sum(round(col("l_discount") * 100).cast("long")),
          sum(round(col("l_tax") * 100).cast("long"))).collect()
    }
    time("lineitem_2flag_groupBy_4col") {
      Tables.lineitem(spark, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity") * 100).cast("long")),
          sum(round(col("l_extendedprice") * 100).cast("long")))
        .collect()
    }
    time("events_3col_sum") {
      Tables.events(spark, d)
        .agg(sum(col("user_id")), avg(unix_micros(col("ts"))),
          sum(round(col("value") * 100).cast("long"))).collect()
    }
    time("events_type_groupBy") {
      Tables.events(spark, d)
        .groupBy("event_type").agg(count(lit(1))).collect()
    }
    time("orders_2col_sum") {
      Tables.orders(spark, d)
        .agg(sum(col("o_custkey")), avg(unix_date(to_date(col("o_orderdate"))))).collect()
    }
    time("lineitem_4col_cast_cents") {
      // cast-truncation cents: (x*100 + 0.5) cast long == round HALF_UP
      // for non-negative x, without Round's per-row BigDecimal
      Tables.lineitem(spark, d)
        .agg(sum((col("l_quantity") * 100 + 0.5).cast("long")),
          sum((col("l_extendedprice") * 100 + 0.5).cast("long")),
          sum((col("l_discount") * 100 + 0.5).cast("long")),
          sum((col("l_tax") * 100 + 0.5).cast("long"))).collect()
    }
    time("lineitem_partkey_exchange") {
      // one corpus-wide integer-key exchange: the unit every join-shaped
      // entry pays at least once
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      Tables.lineitem(spark, d).select("l_partkey")
        .repartition(n, col("l_partkey"))
        .agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
