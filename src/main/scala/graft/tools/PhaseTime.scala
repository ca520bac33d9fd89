package graft.tools

import graft.{GraftSession, SparkEntry}

/** Finer split than QueryTime: DataFrame construction / analysis /
  * optimization+physical planning / execution, per named query — the
  * instrument for "where does wall − exec go" questions (r17 task 3).
  *   sbt "runMain graft.tools.PhaseTime <sfDir> <passes> q1 q2 ..."
  */
object PhaseTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val best = scala.collection.mutable.LinkedHashMap[String, Array[Double]]()
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
        System.gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.assertAnalyzed()
        val t2 = System.nanoTime()
        qe.executedPlan
        val t3 = System.nanoTime()
        qe.toRdd.count()
        val t4 = System.nanoTime()
        val cur = best.getOrElseUpdate(name,
          Array.fill(5)(Double.MaxValue))
        val vals = Array((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9,
          (t4 - t3) / 1e9, (t4 - t0) / 1e9)
        for (i <- vals.indices) cur(i) = math.min(cur(i), vals(i))
      }
    }
    best.foreach { case (n, v) =>
      println(f"PT $n%-20s build=${v(0)}%6.3f analyze=${v(1)}%6.3f plan=${v(2)}%6.3f exec=${v(3)}%6.3f wall=${v(4)}%6.3f")
    }
    spark.stop()
  }
}
