package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** r19 scratch probe: where do ds_drift's probe-pass task-seconds go?
  * Run: sbt "runMain graft.tools.DriftProbe <sfDir>" */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then min of 3
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"DP $tag%-28s $t%7.3f s")
    }
    val epochSec = unix_timestamp(col("ts")) + lit(-7200L)
    val k = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .withColumn("ms", epochSec * 1000)
      .withColumnRenamed("event_type", "compound")
      .select(col("compound"), col("ms"), graft.functions.FastRound.cents(col("value")).as("vc"), col("value"))
    time("scan_only")(k)
    val bounds = k.groupBy("compound").agg(
      min(col("ms")).as("tlo"), max(col("ms")).as("thi"),
      (floor(min(col("value")) / 50) * 50 * 100).cast("long").as("vlo"),
      (ceil(max(col("value")) / 50) * 50 * 100).cast("long").as("vhi"))
    time("bounds_agg")(bounds)
    val joined = k.join(broadcast(bounds), Seq("compound"))
    time("scan_join")(joined)
    val binned = joined.select(col("compound"),
      expr(s"CASE WHEN vhi = vlo THEN 0L ELSE least(((vc - vlo) * 20L) div (vhi - vlo), 19L) END").as("bin"),
      expr("CASE WHEN ms < (tlo + thi) div 2 THEN 1L ELSE 0L END").as("first_half"))
    time("scan_join_bin")(binned)
    time("scan_join_bin_agg")(binned.groupBy("compound", "bin")
      .agg(sum(col("first_half")).as("c1"), sum(lit(1L) - col("first_half")).as("c2")))
    spark.stop()
  }
}
