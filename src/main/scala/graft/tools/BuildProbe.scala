package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Times the rollingZFrom construction pipeline step by step against a
  * cached vs parquet source (r17 task-1 diagnosis of the +0.7s build).
  *   sbt "runMain graft.tools.BuildProbe <sfDir>"
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val epochSec = unix_timestamp(col("ts")) - 7200L
    def direct = graft.sources.Tables.events(spark, d)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("cts", timestamp_seconds(epochSec))
      .withColumn("ms", epochSec * 1000)
      .select(col("event_id"), col("event_type").as("compound"),
        col("cts"), col("ms"), col("value"))
    val cached = direct.persist()
    cached.count()

    def pipeline(src: DataFrame, repart: Boolean): DataFrame = {
      val k0 = src.select("event_id", "compound", "value", "cts")
        .withColumn("tu", unix_micros(col("cts")))
      val stats = k0.groupBy("compound").agg(
        min(col("tu")).as("tmin"), max(col("tu")).as("tmax"))
      val rows = k0.join(stats, Seq("compound"))
        .withColumn("b", expr(s"(tu - tmin) * 256 div (tmax - tmin + 1)"))
        .drop("tmin", "tmax", "tu")
      val lw = Window.partitionBy("compound", "b").orderBy(col("cts"), col("event_id"))
      (if (repart) rows.repartition(32, col("compound"), col("b")) else rows)
        .withColumn("li", row_number().over(lw).cast("long"))
    }
    def t(tag: String)(f: => Any): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"BP $tag%-36s $best%7.3f s")
    }
    t("cached+repart: ckpt build")(pipeline(cached, true).localCheckpoint(false))
    t("parquet+repart: ckpt build")(pipeline(direct, true).localCheckpoint(false))
    t("cached: ckpt build")(pipeline(cached, false).localCheckpoint(false))
    t("parquet: ckpt build")(pipeline(direct, false).localCheckpoint(false))
    val withR = pipeline(cached, true); withR.queryExecution.toRdd
    val noR = pipeline(cached, false); noR.queryExecution.toRdd
    println("=== WITH repartition ===")
    println(withR.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    println("=== WITHOUT repartition ===")
    println(noR.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    t("stats agg only (cached)") {
      cached.select("compound", "cts").withColumn("tu", unix_micros(col("cts")))
        .groupBy("compound").agg(min(col("tu")), max(col("tu")))
        .queryExecution.toRdd.count()
    }
    t("stats agg only (parquet)") {
      direct.select("compound", "cts").withColumn("tu", unix_micros(col("cts")))
        .groupBy("compound").agg(min(col("tu")), max(col("tu")))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
