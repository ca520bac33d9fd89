package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Head-to-head: warm cached keyed-memo scan vs direct parquet scan+parse
  * of the same five-column projection (r17 task-1 diagnosis).
  *   sbt "runMain graft.tools.ScanProbe <sfDir>"
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"SP $tag%-28s ${best._1}%7.3f s  rows=${best._2}")
    }
    val epochSec = unix_timestamp(col("ts")) - 7200L
    def direct = graft.sources.Tables.events(spark, d)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("cts", timestamp_seconds(epochSec))
      .withColumn("ms", epochSec * 1000)
      .select(col("event_id"), col("event_type").as("compound"),
        col("cts"), col("ms"), col("value"))
    time("parquet scan+parse")(direct.queryExecution.toRdd.count())
    val cached = direct.persist()
    cached.count()
    time("cached scan (warm)")(cached.queryExecution.toRdd.count())
    time("cached agg min(ms)")(
      cached.agg(min(col("ms"))).queryExecution.toRdd.count())
    time("parquet agg min(ms)")(
      direct.agg(min(col("ms"))).queryExecution.toRdd.count())
    println("SP cached partitions = " + cached.rdd.getNumPartitions +
      ", parquet partitions = " + direct.rdd.getNumPartitions)
    spark.stop()
  }
}
