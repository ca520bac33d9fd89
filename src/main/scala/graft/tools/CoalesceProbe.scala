package graft.tools
import graft.{GraftSession, SparkEntry}
object CoalesceProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- args.drop(1); coal <- Seq("true", "false"); pass <- 1 to 3) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coal)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, args(0)).queryExecution.toRdd.count()
      println(f"CP $name%-14s coalesce=$coal pass=$pass ${(System.nanoTime()-t0)/1e9}%.3fs")
    }
    spark.stop()
  }
}
