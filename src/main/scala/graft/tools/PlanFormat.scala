package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Writes `explain("formatted")` for the named queries to
  * <outDir>/<query>_<tag>.txt — the plan-evidence files the optimization
  * rounds commit under plans/rNN/.
  * Run: sbt "runMain graft.tools.PlanFormat <sfDir> <outDir> <tag> q1,q2,..."
  */
object PlanFormat {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $name")
    }
    spark.stop()
  }
}
