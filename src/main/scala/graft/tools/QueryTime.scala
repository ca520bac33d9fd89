package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times a named subset of SparkEntry.queries — the fast iteration loop for
  * per-operator plan work (Bench times all 180 and takes ~2min/pass).
  *   sbt "runMain graft.tools.QueryTime <sfDir> <passes> q1 q2 ..."
  * Prints wall + exec (toRdd.count after executedPlan, same split as Bench)
  * minima per query.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val best = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    for (_ <- 1 to passes) {
      graft.operators.Dedup.releaseCaches()
      graft.operators.Selection.releaseCaches()
      graft.operators.Analytics.releaseCaches()
      spark.catalog.clearCache()
      try {
        graft.operators.Dedup.warmFamilyCaches(spark, sfDir)
        graft.operators.Selection.warmQcCaches(spark, sfDir)
          graft.operators.Analytics.warmFamilyCaches(spark, sfDir)
      } catch { case scala.util.control.NonFatal(_) => () }
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        // isolate queries from each other's heap garbage: a heavy
        // neighbor otherwise bills its major-GC debt to whoever runs
        // next (r15: q_promo_share read 4.98s straight after
        // stream_interval_join vs 0.66s isolated, with 120 GB free)
        System.gc()
        val t0 = System.nanoTime()
        val qe = fn(spark, sfDir).queryExecution
        qe.executedPlan
        val t1 = System.nanoTime()
        qe.toRdd.count()
        val t2 = System.nanoTime()
        val wall = (t2 - t0) / 1e9; val exec = (t2 - t1) / 1e9
        val cur = best.getOrElse(name, (Double.MaxValue, Double.MaxValue))
        best(name) = (math.min(cur._1, wall), math.min(cur._2, exec))
      }
    }
    best.foreach { case (n, (w, e)) => println(f"QT $n%-24s wall=$w%7.3f exec=$e%7.3f") }
    spark.stop()
  }
}
