package graft.tools

import graft.GraftSession
import graft.operators.Analytics
import graft.sources.Tables

/** Times the plain vs heavy-key-safe window variants on a corpus — the
  * r15 skew probe (SCALING.md): run on a ReplicateCorpus `skew` build
  * (30% of events on one user) and on the unskewed source to read both
  * sides of the trade the opt-in variants price.
  *
  * Run: sbt "runMain graft.tools.SkewProbe <dir> [passes]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-skew")
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "window_running_plain" -> (() => Analytics.qWindowRunningFrom(Tables.events(spark, dir))),
      "window_running_skewsafe" -> (() => Analytics.qWindowRunningSkewSafe(Tables.events(spark, dir))),
      // the r16 default path: detection count + branch pick (r15 verdict
      // #7's "unskewed corpus pays ≈0" evidence reads plain vs auto here)
      "window_running_auto" -> (() => Analytics.qWindowRunningAuto(spark, Tables.events(spark, dir))),
      "sliding_window_plain" -> (() => Analytics.qSlidingWindowFrom(Tables.events(spark, dir))),
      "sliding_window_skewsafe" -> (() => Analytics.qSlidingWindowSkewSafe(Tables.events(spark, dir))),
      "sliding_window_auto" -> (() => Analytics.qSlidingWindowAuto(spark, Tables.events(spark, dir))))
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (_ <- 1 to passes; (name, build) <- variants) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      build().queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      // checkpoint blocks are persistent RDDs, not catalog cache (r15
      // advice): without this the skew-safe variants' lazy checkpoints
      // accumulate across passes and the later timings (the very
      // comparison this probe exists to make) run under storage pressure
      // the earlier ones don't — same fix Bench applies at pass bounds
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    best.foreach { case (n, t) => println(f"SKEWPROBE $n%-26s $dir%-22s ${t}%.3fs") }
    spark.stop()
  }
}
