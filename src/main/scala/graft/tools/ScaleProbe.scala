package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times selected queries on one or more data directories — used for the
  * linearity probes recorded in SURVEY §5 / SCALING.md (e.g. a /tmp copy of
  * events replicated 10× checks that an operator's cost curve is the
  * designed one, not an accidental quadratic).
  *
  * Run: sbt "runMain graft.tools.ScaleProbe q_asof_join,q_range_join dir1 dir2"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_asof_join").split(',').toSeq
    val dirs = args.drop(1).toSeq match {
      case Nil => Seq("/root/testdata/sf0.1")
      case ds => ds
    }
    val spark = GraftSession.local(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32))
    for (dir <- dirs; name <- names) {
      val fn = SparkEntry.queries(name)
      // toRdd.count() executes the audited plan and materializes every
      // row — a bare .count() re-optimizes for COUNT(*) and can eliminate
      // joins/projections the query exists to measure (see Bench)
      fn(spark, dir).queryExecution.toRdd.count() // warm: plan + scan caches
      val t0 = System.nanoTime()
      val n = fn(spark, dir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-22s $dir%-28s rows=$n%-9d ${dt}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
